"""Detector validator: mAP50 / mAP50-95 / P / R over a dataset split.

The eval-during-train capability the reference inherits from Ultralytics'
BaseTrainer/validator stack (SURVEY.md §2.2). Batched jitted forward + NMS on
device; matching/AP on host (numpy).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.yolo_dataset import YoloSegDataset, collate_padded
from ..metrics.det import DetMetrics
from ..models.yolo import YOLOModel
from ..ops.boxes import xywh2xyxy
from ..ops.nms import non_max_suppression


def validate_detector(model: YOLOModel, variables: Dict, img_dir: str, *,
                      imgsz: int = 160, channels: int = 4, batch_size: int = 16,
                      conf: float = 0.001, iou: float = 0.45,
                      max_det: int = 300, max_inst: int = 16) -> Dict[str, float]:
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
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        items = [ds.item(i) for i in idxs]
        while len(items) < batch_size:
            items.append(items[0])
        batch = collate_padded(items, max_inst)
        dets = jax.device_get(step(variables, jnp.asarray(batch["img"])))
        for bi, gi in enumerate(idxs):
            k = int(dets.valid[bi].sum())
            gt_valid = batch["valid"][bi]
            gt_xyxy = np.asarray(
                xywh2xyxy(jnp.asarray(batch["bboxes"][bi][gt_valid]))) * imgsz
            metrics.update(dets.boxes[bi][:k], dets.conf[bi][:k],
                           dets.cls[bi][:k], gt_xyxy,
                           batch["cls"][bi][gt_valid])
    return metrics.compute()
