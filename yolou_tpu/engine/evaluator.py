"""End-to-end evaluator: fused YOLO+decoder forward -> Dice/HD95/P/R.

Equivalent of /root/reference/evaluate_model.py:32-192 with the TPU redesign:
batched (reference runs batch_size=1), single backbone pass (no double
compute), and NMS still invoked per quirk SURVEY.md §2.4.6 — its output feeds
the Results path and the benchmark's NMS+decode latency surface.

Conditioning parity: the eval path uses sigmoid(raw logits) with NO z-score
(evaluate_model.py:142-144), which the fused forward reproduces exactly.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.decoder_dataset import DecoderDataset, prefetch
from ..metrics.seg import dice_binary, hd95_batch, precision_recall_counts
from ..models.segpp import YOLOSegPP
from ..ops.nms import non_max_suppression


class Evaluator:
    def __init__(self, model: YOLOSegPP, variables: Dict, data_root: str,
                 image_size: int = 160, batch_size: int = 16,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                 mesh=None):
        """mesh: optional jax Mesh — shards eval batches over the 'data' axis
        (multi-chip evaluation; params replicate, XLA gathers results)."""
        self.model = model
        self.data_root = data_root
        self.image_size = image_size
        self.batch_size = batch_size
        self.mesh = mesh

        @jax.jit
        def step(variables, img):
            mask_logits, out = model.apply(variables, img, train=False)
            dets = non_max_suppression(out.preds, conf_thres=conf,
                                       iou_thres=iou, max_det=max_det,
                                       nc=model.spec.nc)
            pred_bin = (jax.nn.sigmoid(mask_logits) > 0.5).astype(jnp.float32)
            return pred_bin, dets

        self._step = step
        if mesh is not None:
            from ..parallel import mesh as meshlib
            self.variables = meshlib.replicate(mesh, variables)
            self._shard = lambda x: jax.device_put(
                x, meshlib.batch_sharding(mesh))
        else:
            self.variables = variables
            self._shard = lambda x: x

    def evaluate(self, split: str = "test",
                 with_hd95: bool = True) -> Dict[str, float]:
        ds = DecoderDataset(self.data_root, f"images/{split}",
                            f"masks/{split}", self.image_size)
        dices, hd95s = [], []
        tot_tp = tot_fp = tot_fn = 0.0
        n_images = 0
        t0 = time.time()
        for imgs, masks, _, n_real in prefetch(ds.batches(self.batch_size)):
            pred_bin, _ = self._step(self.variables,
                                     self._shard(jnp.asarray(imgs)))
            pred_bin = np.asarray(pred_bin)[:n_real]
            m = masks[:n_real]
            d = np.asarray(dice_binary(jnp.asarray(pred_bin[..., 0]),
                                       jnp.asarray(m[..., 0])))
            dices.append(d)
            tp, fp, fn = (float(x) for x in precision_recall_counts(
                jnp.asarray(pred_bin[..., 0]), jnp.asarray(m[..., 0])))
            tot_tp += tp
            tot_fp += fp
            tot_fn += fn
            if with_hd95:
                hd = np.asarray(hd95_batch(jnp.asarray(pred_bin[..., 0]),
                                           jnp.asarray(m[..., 0])))
                hd95s.append(hd)
            n_images += n_real
        dt = time.time() - t0
        dice = float(np.mean(np.concatenate(dices))) if dices else float("nan")
        hd_all = np.concatenate(hd95s) if hd95s else np.asarray([np.nan])
        hd95 = (float(np.nanmean(hd_all))
                if np.any(~np.isnan(hd_all)) else float("nan"))
        return {
            "dice": dice,
            "hd95": hd95,
            "precision": tot_tp / (tot_tp + tot_fp + 1e-6),
            "recall": tot_tp / (tot_tp + tot_fn + 1e-6),
            "images_per_sec": n_images / max(dt, 1e-9),
            "n_images": n_images,
        }
