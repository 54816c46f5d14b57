"""Shared CLI helpers: model loading/creation and argument plumbing."""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.segpp import YOLOSegPP
from ..models.yolo import build_yolo, parse_model_spec
from ..utils.model_io import load_model


def enable_compile_cache(path: str = "/tmp/yolou_jax_cache") -> None:
    """Persistent XLA compile cache: repeat CLI invocations skip local
    compiles (CPU backends, AOT-able programs). NOTE: the axon tunnel's
    remote_compile is NOT cached by this (measured round 2), so first-run
    TPU compiles still pay 30-300 s; harmless there, a real win on CPU.
    Safe to call any time before the first jit executes; non-fatal."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


enable_compile_cache()  # every CLI imports this module before tracing


def get_or_init_detector(model_path: Optional[str], *, variant: str = "n",
                         nc: int = 1, ch: int = 4, task: str = "detect",
                         imgsz: int = 160, seed: int = 0, dtype=None,
                         use_pallas: bool = False):
    """Load a saved detector, or initialize fresh weights when no checkpoint
    exists (the reference requires a gitignored .pt; we degrade gracefully)."""
    if model_path and os.path.exists(model_path):
        model, variables = load_model(model_path, dtype=dtype,
                                      use_pallas=use_pallas)
        return model, variables
    model = build_yolo("yolov12", variant, nc=nc, ch=ch, task=task,
                       use_pallas=use_pallas,
                       **({} if dtype is None else {"dtype": dtype}))
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    variables = init(jax.random.key(seed), jnp.zeros((1, imgsz, imgsz, ch)))
    return model, jax.device_get(variables)


def _adapt_segment_head_to_detect(tree: Dict) -> Dict:
    """A Segment-task checkpoint wraps its Detect params under
    model_N/detect (plus proto/cv4); a detect-task graph expects them at
    model_N directly. Re-root when needed so a seg-trained detector drops
    into the SegPP encoder unchanged."""
    out = dict(tree)
    for k, v in tree.items():
        if k.startswith("model_") and isinstance(v, dict) and "detect" in v:
            out[k] = v["detect"]
    return out


def build_segpp_from_detector(det_variables: Dict, *, variant: str = "n",
                              nc: int = 1, ch: int = 4, use_logits: bool = True,
                              imgsz: int = 160, seed: int = 0,
                              dtype=None) -> Tuple[YOLOSegPP, Dict]:
    """YOLOSegPP with the detector weights transplanted into the yolo subtree
    (the reference's `YOLOSegPlusPlus(predictor)` construction, train.py:568).
    Accepts both detect- and segment-task detector checkpoints."""
    spec = parse_model_spec("yolov12", variant, nc, ch, "detect")
    model = YOLOSegPP(spec=spec, use_logits=use_logits,
                      **({} if dtype is None else {"dtype": dtype}))
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    variables = jax.device_get(
        init(jax.random.key(seed), jnp.zeros((1, imgsz, imgsz, ch))))
    params = dict(variables["params"])
    params["yolo"] = _adapt_segment_head_to_detect(det_variables["params"])
    bs = dict(variables["batch_stats"])
    bs["yolo"] = _adapt_segment_head_to_detect(det_variables["batch_stats"])
    return model, {"params": params, "batch_stats": bs}
