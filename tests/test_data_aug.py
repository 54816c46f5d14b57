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
                                         collate_padded)


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
