"""Data pipeline + on-device augmentation tests (synthetic dataset)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolou_tpu.data import synthetic
from yolou_tpu.data.augment import (AugHyp, augment_batch, boxes_from_idmap,
                                    masks_at_proto_res)
from yolou_tpu.data.config import load_data_yaml
from yolou_tpu.data.decoder_dataset import DecoderDataset, prefetch
from yolou_tpu.data.yolo_dataset import (YoloSegDataset, collate_idmap,
                                         collate_idmap_cached, collate_padded)


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    synthetic.generate(root, {"train": 8, "val": 4, "test": 4}, size=160, seed=3)
    return root


def test_yaml_config(dataset_root):
    cfg = load_data_yaml(os.path.join(dataset_root, "data.yaml"))
    assert cfg.channels == 4 and cfg.nc == 1 and cfg.names == ["whole_tumor"]
    assert os.path.isdir(cfg.split_dir("train"))


def test_decoder_dataset_shapes(dataset_root):
    # objectmaps required -> write fake ones
    names = [os.path.splitext(f)[0] for f in
             sorted(os.listdir(os.path.join(dataset_root, "images", "val")))]
    synthetic.write_objectmaps(
        dataset_root, {n: np.random.randn(20, 20).astype(np.float32) for n in names},
        "val")
    ds = DecoderDataset(dataset_root, "images/val", "masks/val", 160,
                        objectmap_path="objectmap/val")
    img, mask, om = ds[0]
    assert img.shape == (160, 160, 4) and img.dtype == np.float32
    assert mask.shape == (160, 160, 1) and 0 <= mask.max() <= 1
    assert om.shape == (20, 20, 1) and 0 < om.min() and om.max() < 1  # sigmoided
    batches = list(prefetch(ds.batches(batch_size=3)))
    assert batches[0][0].shape == (3, 160, 160, 4)
    assert batches[-1][3] <= 3  # n_real on the padded last batch


def test_yolo_dataset_and_collates(dataset_root):
    ds = YoloSegDataset(os.path.join(dataset_root, "images", "train"),
                        imgsz=160, channels=4)
    assert len(ds) == 8
    item = ds.item(0)
    assert item["img"].shape == (160, 160, 4)
    batch = collate_padded([ds.item(i) for i in range(4)], max_inst=8)
    assert batch["img"].shape == (4, 160, 160, 4)
    assert batch["masks"].shape == (4, 8, 40, 40)
    # bboxes consistent with masks
    for i in range(4):
        for j in range(8):
            if batch["valid"][i, j]:
                assert batch["bboxes"][i, j, 2] > 0
    idb = collate_idmap([ds.item(i) for i in range(4)], max_inst=8)
    assert idb["idmap"].shape == (4, 160, 160)
    assert idb["idmap"].max() <= 8
    # label cache round-trip
    ds2 = YoloSegDataset(os.path.join(dataset_root, "images", "train"),
                         imgsz=160, channels=4)
    assert len(ds2.labels) == len(ds.labels)


def test_collate_idmap_cached_matches_item_path(dataset_root):
    """collate_idmap_cached (the detector trainer hot path, r4) must equal
    collate_idmap over ds.item() exactly — same overlap encoding, ordering,
    cls/valid slots — just uint8 and from the per-image cache."""
    ds = YoloSegDataset(os.path.join(dataset_root, "images", "train"),
                        imgsz=160, channels=4, cache_images=True)
    sel = [0, 1, 2, 3]
    ref = collate_idmap([ds.item(i) for i in sel], max_inst=8)
    for _ in range(2):  # second pass exercises the warm cache
        got = collate_idmap_cached(ds, sel, max_inst=8)
        assert got["idmap"].dtype == np.uint8
        np.testing.assert_array_equal(got["img"], ref["img"])
        np.testing.assert_array_equal(got["idmap"].astype(np.int32),
                                      ref["idmap"])
        np.testing.assert_array_equal(got["cls"], ref["cls"])
        np.testing.assert_array_equal(got["valid"], ref["valid"])
    # instance-budget clipping: slots beyond max_inst are zeroed
    small = collate_idmap_cached(ds, sel, max_inst=1)
    assert small["idmap"].max() <= 1 and small["cls"].shape == (4, 1)


def test_decoder_dataset_u8_batches_bit_exact(dataset_root):
    """batches(u8=True) + on-device /255 must reproduce the f32 host path
    bit-exactly (resize runs on uint8 in both, as in the reference)."""
    names = [os.path.splitext(f)[0] for f in
             sorted(os.listdir(os.path.join(dataset_root, "images", "val")))]
    synthetic.write_objectmaps(
        dataset_root,
        {n: np.random.randn(20, 20).astype(np.float32) for n in names}, "val")
    ds = DecoderDataset(dataset_root, "images/val", "masks/val", 160,
                        objectmap_path="objectmap/val")
    f32 = next(iter(ds.batches(batch_size=3)))
    u8 = next(iter(ds.batches(batch_size=3, u8=True)))
    assert u8[0].dtype == np.uint8 and u8[1].dtype == np.uint8
    np.testing.assert_array_equal(u8[0].astype(np.float32) / 255.0, f32[0])
    np.testing.assert_array_equal(u8[1].astype(np.float32) / 255.0, f32[1])
    np.testing.assert_array_equal(u8[2], f32[2])
    assert u8[3] == f32[3]


def test_boxes_from_idmap_exact():
    idmap = jnp.zeros((1, 32, 32), jnp.int32).at[0, 4:12, 8:24].set(1)
    boxes = np.asarray(boxes_from_idmap(idmap, 4))
    np.testing.assert_allclose(boxes[0, 0], [16 / 32, 8 / 32, 16 / 32, 8 / 32],
                               atol=1e-6)
    assert np.all(boxes[0, 1:] == 0)
    masks = np.asarray(masks_at_proto_res(idmap, 4, ratio=4))
    assert masks.shape == (1, 4, 8, 8)
    assert masks[0, 0].sum() > 0 and masks[0, 1].sum() == 0


def test_augment_batch_end_to_end(dataset_root):
    ds = YoloSegDataset(os.path.join(dataset_root, "images", "train"),
                        imgsz=160, channels=4)
    idb = collate_idmap([ds.item(i) for i in range(4)], max_inst=8)
    img = jnp.asarray(idb["img"], jnp.float32) / 255.0
    out = augment_batch(img, jnp.asarray(idb["idmap"]), jnp.asarray(idb["cls"]),
                        jnp.asarray(idb["valid"]), jax.random.key(0),
                        AugHyp(), g_out=8, mask_ratio=4)
    assert out["img"].shape == (4, 160, 160, 4)
    assert out["bboxes"].shape == (4, 8, 4)
    assert out["masks"].shape == (4, 8, 40, 40)
    assert np.all(np.isfinite(np.asarray(out["img"])))
    assert float(out["img"].min()) >= 0 and float(out["img"].max()) <= 1
    # regression guard (round-2): the mosaic fill must be on the [0,1] scale —
    # a 114.0 fill on normalized images poisoned BN stats and collapsed
    # training mAP to ~0 whenever the affine exposed unreached canvas
    for seed in range(1, 6):
        oi = augment_batch(img, jnp.asarray(idb["idmap"]),
                           jnp.asarray(idb["cls"]), jnp.asarray(idb["valid"]),
                           jax.random.key(seed), AugHyp(), g_out=8,
                           mask_ratio=4)["img"]
        assert float(oi.max()) <= 1.0 + 1e-6
    v = np.asarray(out["valid"])
    bb = np.asarray(out["bboxes"])
    mm = np.asarray(out["masks"])
    for i in range(4):
        for j in range(8):
            if v[i, j]:
                assert bb[i, j, 2] > 0 and bb[i, j, 3] > 0
                assert mm[i, j].sum() >= 0
    # determinism under the same key
    out2 = augment_batch(img, jnp.asarray(idb["idmap"]), jnp.asarray(idb["cls"]),
                         jnp.asarray(idb["valid"]), jax.random.key(0),
                         AugHyp(), g_out=8, mask_ratio=4)
    np.testing.assert_allclose(np.asarray(out["img"]), np.asarray(out2["img"]))


def test_augment_identity_when_disabled(dataset_root):
    """With all augs off and no mosaic, the image passes through unchanged."""
    ds = YoloSegDataset(os.path.join(dataset_root, "images", "train"),
                        imgsz=160, channels=4)
    idb = collate_idmap([ds.item(i) for i in range(2)], max_inst=8)
    img = jnp.asarray(idb["img"], jnp.float32) / 255.0
    hyp = AugHyp(mosaic=0.0, degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                 flipud=0.0, fliplr=0.0, mixup=0.0, noise_p=0.0, blur_p=0.0,
                 bias_p=0.0)
    out = augment_batch(img, jnp.asarray(idb["idmap"]), jnp.asarray(idb["cls"]),
                        jnp.asarray(idb["valid"]), jax.random.key(1), hyp,
                        g_out=8, use_mosaic=False)
    np.testing.assert_allclose(np.asarray(out["img"]), np.asarray(img), atol=1e-5)


def test_mosaic4_random_center_semantics():
    """Ultralytics Mosaic parity (VERDICT round-1 weak #9): the 4 sources
    meet at a random per-image center in [S/2, 3S/2], each quadrant shows the
    source corner adjacent to the center, gray-114 fills unreached canvas,
    and instance ids are offset per quadrant. Golden-checked against a numpy
    paste reference implementing the ultralytics placement directly."""
    from yolou_tpu.data.augment import mosaic4

    rng = np.random.default_rng(0)
    b, s, g = 6, 32, 4
    img = jnp.asarray(rng.uniform(0, 1, (b, s, s, 4)).astype(np.float32))
    idmap = jnp.asarray(rng.integers(0, g + 1, (b, s, s)).astype(np.int32))
    cls = jnp.asarray(rng.integers(0, 3, (b, g)).astype(np.int32))
    valid = jnp.ones((b, g), bool)
    key = jax.random.key(7)

    canvas, mcanvas, cls4, val4 = jax.device_get(
        mosaic4(img, idmap, cls, valid, key))
    assert canvas.shape == (b, 2 * s, 2 * s, 4)
    assert cls4.shape == (b, 4 * g) and val4.shape == (b, 4 * g)

    # replicate mosaic4's internal randomness to build the numpy golden
    kperm, kc = jax.random.split(key)
    perm = np.asarray(jax.random.permutation(kperm, b))
    centers = np.asarray(
        jax.random.randint(kc, (b, 2), s // 2, 3 * s // 2 + 1))
    rolls = [np.arange(b), perm, np.roll(perm, 1), np.roll(perm, 2)]
    img_np = np.asarray(img)
    id_np = np.asarray(idmap)

    def paste(i):
        """ultralytics Mosaic._mosaic4: paste each source's corner region
        adjacent to the center, gray 114 elsewhere."""
        yc, xc = centers[i]
        out = np.full((2 * s, 2 * s, 4), 114.0 / 255.0, np.float32)
        ids = np.zeros((2 * s, 2 * s), np.int32)
        srcs = [img_np[rolls[q][i]] for q in range(4)]
        mids = [np.where(id_np[rolls[q][i]] > 0,
                         id_np[rolls[q][i]] + q * g, 0) for q in range(4)]
        # (canvas region, source region) per quadrant
        regions = [
            ((max(yc - s, 0), yc, max(xc - s, 0), xc),
             lambda h, w: (s - h, s, s - w, s)),          # TL: bottom-right
            ((max(yc - s, 0), yc, xc, min(xc + s, 2 * s)),
             lambda h, w: (s - h, s, 0, w)),              # TR: bottom-left
            ((yc, min(yc + s, 2 * s), max(xc - s, 0), xc),
             lambda h, w: (0, h, s - w, s)),              # BL: top-right
            ((yc, min(yc + s, 2 * s), xc, min(xc + s, 2 * s)),
             lambda h, w: (0, h, 0, w)),                  # BR: top-left
        ]
        for q, ((y1, y2, x1, x2), srcfn) in enumerate(regions):
            h, w = y2 - y1, x2 - x1
            sy1, sy2, sx1, sx2 = srcfn(h, w)
            out[y1:y2, x1:x2] = srcs[q][sy1:sy2, sx1:sx2]
            ids[y1:y2, x1:x2] = mids[q][sy1:sy2, sx1:sx2]
        return out, ids

    centers_seen = set()
    for i in range(b):
        want, want_ids = paste(i)
        np.testing.assert_allclose(canvas[i], want, rtol=1e-6,
                                   err_msg=f"image {i} center {centers[i]}")
        np.testing.assert_array_equal(mcanvas[i], want_ids)
        centers_seen.add(tuple(centers[i]))
    assert len(centers_seen) > 1            # randomness across the batch
    assert centers[:, 0].min() >= s // 2 and centers[:, 0].max() <= 3 * s // 2


def test_separable_warp_matches_gather_warp():
    """The axis-separable fast path (degrees=shear=0, the default hyp) must
    reproduce the general gather warp exactly, fill handling included."""
    from yolou_tpu.data.augment import affine_warp, affine_warp_separable

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((64, 48, 4)).astype(np.float32))
    idm = jnp.asarray(rng.integers(0, 6, (64, 48)).astype(np.int32))
    for a, d, b2, e in [(1.3, -4.2, 1.1, 2.0), (0.71, 9.9, 0.62, -3.3),
                        (2.0, -30.0, 2.0, 40.0)]:   # incl. heavy out-of-range
        minv = jnp.asarray([[a, 0.0, d], [0.0, b2, e]], jnp.float32)
        i1, m1 = affine_warp(img, idm, minv, 32)
        i2, m2 = affine_warp_separable(img, idm, minv, 32)
        np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_reduce_instances_semantics():
    """Compare-arithmetic remap (no scatter/gather) vs a literal numpy
    reference: keep the g_out largest valid instances, remap ids by area
    rank, zero everything else."""
    from yolou_tpu.data.augment import reduce_instances

    rng = np.random.default_rng(11)
    b, s, g_in, g_out = 3, 32, 10, 4
    idm = rng.integers(0, g_in + 1, (b, s, s)).astype(np.int32)
    cls = rng.integers(0, 5, (b, g_in)).astype(np.int32)
    val = rng.random((b, g_in)) < 0.7
    nid, ncls, nval = (np.asarray(t) for t in reduce_instances(
        jnp.asarray(idm), jnp.asarray(cls), jnp.asarray(val), g_out))
    for i in range(b):
        areas = np.array([(idm[i] == j + 1).sum() * val[i, j]
                          for j in range(g_in)], np.float32)
        order = np.argsort(-areas, kind="stable")[:g_out]
        exp = np.zeros_like(idm[i])
        for rank, j in enumerate(order):
            if areas[j] > 0:
                exp[idm[i] == j + 1] = rank + 1
                assert nval[i, rank] and ncls[i, rank] == cls[i, j]
            else:
                assert not nval[i, rank]
        np.testing.assert_array_equal(nid[i], exp)
