"""Detector validator: mAP50 / mAP50-95 / P / R over a dataset split.

The eval-during-train capability the reference inherits from Ultralytics'
BaseTrainer/validator stack (SURVEY.md §2.2). Batched jitted forward + NMS on
device; matching/AP on host (numpy).

rect=True enables ultralytics rect-mode validation (custom_base.py:316-339,
pad 0.5 at custom_build_data.py:29): images grouped by aspect ratio, each
group letterboxed to a shared stride-aligned shape instead of square-
stretching — one cached jit specialization per distinct group shape.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.yolo_dataset import (YoloSegDataset, collate_padded,
                                 rect_batch_shape, rect_groups)
from ..metrics.det import DetMetrics
from ..models.yolo import YOLOModel
from ..ops.boxes import xywh2xyxy
from ..ops.nms import non_max_suppression


def validate_detector(model: YOLOModel, variables: Dict, img_dir: str, *,
                      imgsz: int = 160, channels: int = 4, batch_size: int = 16,
                      conf: float = 0.001, iou: float = 0.45,
                      max_det: int = 300, max_inst: int = 16,
                      rect: bool = False, stride: int = 32) -> Dict[str, float]:
    ds = YoloSegDataset(img_dir, imgsz=imgsz, channels=channels)
    nc = model.spec.nc

    @jax.jit
    def step(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        out = model.apply(variables, x, train=False)
        return non_max_suppression(out.preds, conf_thres=conf, iou_thres=iou,
                                   max_det=max_det, nc=nc)

    metrics = DetMetrics(nc=nc)
    n = len(ds)
    if rect:
        shapes = [ds.orig_shape(i) for i in range(n)]
        groups = rect_groups(shapes, batch_size)
    else:
        groups = [list(range(s, min(s + batch_size, n)))
                  for s in range(0, n, batch_size)]

    for idxs in groups:
        if rect:
            hw = rect_batch_shape([shapes[i] for i in idxs], imgsz, stride)
            items = [ds.item_rect(i, hw) for i in idxs]
        else:
            hw = (imgsz, imgsz)
            items = [ds.item(i) for i in idxs]
        while len(items) < batch_size:
            items.append(items[0])
        batch = collate_padded(items, max_inst)
        dets = jax.device_get(step(variables, jnp.asarray(batch["img"])))
        scale = np.array([hw[1], hw[0], hw[1], hw[0]], np.float32)
        for bi, gi in enumerate(idxs):
            k = int(dets.valid[bi].sum())
            gt_valid = batch["valid"][bi]
            gt_xyxy = np.asarray(
                xywh2xyxy(jnp.asarray(batch["bboxes"][bi][gt_valid]))) * scale
            metrics.update(dets.boxes[bi][:k], dets.conf[bi][:k],
                           dets.cls[bi][:k], gt_xyxy,
                           batch["cls"][bi][gt_valid])
    return metrics.compute()
