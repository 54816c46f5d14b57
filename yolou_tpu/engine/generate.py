"""Objectmap / heatmap generators over the fused batched forward.

Reimplements generate_objectmaps.py and generate_heatmaps.py from the
reference — but batched and jitted (the reference loops image-by-image with a
device->host transfer per file, generate_objectmaps.py:86-106; here one pmap
-free batched sweep produces a whole split).

Objectmap semantics parity (generate_objectmaps.py:88-106): raw stride-8 class
logits (NO sigmoid), last channel, saved per-image as `<name>_20.npy`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.gaussian import splat_heatmaps
from .predictor import Predictor


def _split_images(data_root: str, split: str):
    d = os.path.join(data_root, "images", split)
    return [(os.path.splitext(f)[0], os.path.join(d, f))
            for f in sorted(os.listdir(d))
            if f.lower().endswith((".png", ".jpg", ".jpeg"))]


def generate_objectmaps(predictor: Predictor, data_root: str,
                        out_root: Optional[str] = None,
                        splits: Sequence[str] = ("test", "train", "val"),
                        batch_size: int = 128) -> Dict[str, int]:
    """Dump stride-8 raw-logit maps for every image of every split."""
    import cv2

    out_root = out_root or data_root
    counts = {}
    for split in splits:
        entries = _split_images(data_root, split)
        out_dir = os.path.join(out_root, "objectmap", split)
        os.makedirs(out_dir, exist_ok=True)
        for start in range(0, len(entries), batch_size):
            chunk = entries[start:start + batch_size]
            imgs = []
            for _, path in chunk:
                img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                if img.ndim == 2:
                    img = img[..., None]
                imgs.append(img)
            batch = np.stack(imgs)
            out = predictor.raw_forward(batch)
            # P3 raw map, last channel = class logit (raw, NO sigmoid)
            maps = np.asarray(out.raw[0][..., -1])        # (b, 20, 20)
            for (name, _), m in zip(chunk, maps):
                np.save(os.path.join(out_dir, f"{name}_20.npy"),
                        m.astype(np.float32))
        counts[split] = len(entries)
    return counts


def generate_heatmaps(predictor: Predictor, data_root: str,
                      out_root: Optional[str] = None,
                      splits: Sequence[str] = ("test", "train", "val"),
                      size: int = 160, batch_size: int = 64) -> Dict[str, int]:
    """Gaussian-splat heatmaps from predicted boxes, saved as PNGs."""
    import cv2

    out_root = out_root or data_root
    counts = {}
    for split in splits:
        entries = _split_images(data_root, split)
        out_dir = os.path.join(out_root, "heatmap", split)
        os.makedirs(out_dir, exist_ok=True)
        for start in range(0, len(entries), batch_size):
            chunk = entries[start:start + batch_size]
            results = predictor([p for _, p in chunk])
            # batch the splat: pad per-image boxes to a common K, bucketed to
            # a power of two so the jitted splat compiles O(log max_det)
            # times total instead of once per distinct per-batch box count
            k = max(1, max(len(r.boxes) for r in results))
            k = 1 << (k - 1).bit_length()
            bxywh = np.zeros((len(results), k, 4), np.float32)
            conf = np.zeros((len(results), k), np.float32)
            valid = np.zeros((len(results), k), bool)
            for i, r in enumerate(results):
                n = len(r.boxes)
                if n:
                    bxywh[i, :n] = r.boxes.xywh[:k]
                    conf[i, :n] = r.boxes.conf[:k]
                    valid[i, :n] = True
            canvases = np.asarray(splat_heatmaps(
                jnp.asarray(bxywh), jnp.asarray(conf), jnp.asarray(valid),
                size=size))
            for (name, _), canvas in zip(chunk, canvases):
                png = np.clip(canvas * 255.0, 0, 255).astype(np.uint8)
                cv2.imwrite(os.path.join(out_dir, f"{name}.png"), png)
        counts[split] = len(entries)
    return counts


def spatial_confidence(logits: np.ndarray, k_frac: float = 0.20) -> float:
    """Top-k%% mean of sigmoid logits (evaluate_model.py:69-76 /
    visualize_logits.py:32-36)."""
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, np.float64).reshape(-1)))
    k = max(1, int(k_frac * probs.size))
    return float(np.sort(probs)[-k:].mean())


def argmax_confidence(logits: np.ndarray) -> float:
    """Max sigmoid logit (visualize_logits.py:38-43)."""
    return float(1.0 / (1.0 + np.exp(-float(np.max(logits)))))
