"""Native C++ IO runtime: build, PNG-decode parity vs cv2, batch loading."""

import os

import numpy as np
import pytest

from yolou_tpu.native import loader

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w, c) in enumerate([(64, 80, 4), (100, 60, 3), (50, 50, 1)]):
        img = rng.integers(0, 255, (h, w, c), dtype=np.uint8)
        p = str(d / f"img{i}.png")
        cv2.imwrite(p, img if c > 1 else img[..., 0])
        paths.append((p, img))
    return paths


def test_build_and_version():
    assert loader.build(), "native build failed (g++/zlib expected in image)"
    assert loader.available()


def test_decode_parity_with_cv2(pngs):
    for path, _ in pngs:
        want = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if want.ndim == 2:
            want = want[..., None]
        got = loader.decode_png(path)
        assert got is not None, path
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)


def test_batch_load_shapes_and_status(pngs):
    paths = [p for p, _ in pngs]
    batch, status = loader.load_batch(paths, imgsz=96, channels=4)
    assert batch is not None
    assert batch.shape == (3, 96, 96, 4)
    assert (status == 0).all(), status
    assert batch.std() > 0
    # letterbox mode pads with 114
    lb, st = loader.load_batch([paths[1]], imgsz=128, channels=4,
                               letterbox=True)
    assert (st == 0).all()
    # 100x60 -> letterboxed: left/right padding columns are 114
    assert (lb[0, :, 0, :] == 114).all()


def test_batch_load_missing_file(pngs):
    batch, status = loader.load_batch([pngs[0][0], "/nonexistent.png"],
                                      imgsz=64, channels=4)
    assert status[0] == 0 and status[1] != 0


def test_native_s2d_layout(pngs):
    """s2d(4) loader emission matches the numpy reference permutation and the
    stem's expected channel order (iy, ix, ci)."""
    if not loader.available():
        pytest.skip("native library unavailable")
    paths = [p for p, _ in pngs[:2]]
    a, st = loader.load_batch(paths, 160, 4)
    b, st2 = loader.load_batch(paths, 160, 4, s2d=True)
    assert (st == 0).all() and (st2 == 0).all()
    ref = a.reshape(len(paths), 40, 4, 40, 4, 4)
    ref = ref.transpose(0, 1, 3, 2, 4, 5).reshape(len(paths), 40, 40, 64)
    np.testing.assert_array_equal(b, ref)


def test_native_letterbox_s2d_batch():
    """In-memory threaded letterbox+s2d: identity path byte-exact; resize
    path within 1 LSB of the cv2 letterbox reference."""
    if not loader.available():
        pytest.skip("native library unavailable")
    import ctypes

    import cv2

    lib = loader.get_lib()
    if not hasattr(lib, "yio_letterbox_s2d_batch"):
        pytest.skip("old library build")
    rng = np.random.default_rng(3)
    # identity: model-sized input
    im = rng.integers(0, 255, (2, 96, 96, 4), dtype=np.uint8)
    out = np.empty((2, 24, 24, 64), np.uint8)
    lib.yio_letterbox_s2d_batch(
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 2, 96, 96, 4,
        96, 1, 0, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    np.testing.assert_array_equal(out, loader.s2d4_np(im))
    # aspect letterbox 100x60 -> 128
    im2 = np.ascontiguousarray(
        rng.integers(0, 255, (2, 100, 60, 4), dtype=np.uint8))
    out2 = np.empty((2, 32, 32, 64), np.uint8)
    lib.yio_letterbox_s2d_batch(
        im2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 2, 100, 60, 4,
        128, 1, 0, out2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    r = min(128 / 100, 128 / 60)
    uh, uw = int(round(100 * r)), int(round(60 * r))
    top = int(round((128 - uh) / 2 - 0.1))
    left = int(round((128 - uw) / 2 - 0.1))
    ref = np.full((2, 128, 128, 4), 114, np.uint8)
    for i in range(2):
        ref[i, top:top + uh, left:left + uw] = cv2.resize(
            im2[i], (uw, uh), interpolation=cv2.INTER_LINEAR)
    ref = loader.s2d4_np(ref)
    assert np.abs(out2.astype(int) - ref.astype(int)).max() <= 1
