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
