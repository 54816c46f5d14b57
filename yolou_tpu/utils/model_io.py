"""Model checkpoint I/O: variables + architecture metadata in one file.

The reference ships torch `.pt` checkpoints (gitignored); this framework's
native format is msgpack variables plus a JSON meta sidecar embedded in the
same file, so `load_model()` can rebuild the exact module with no pickle
execution. See tools/torch2jax.py for converting reference-style state_dicts.
"""

from __future__ import annotations

import json
from typing import Dict, Tuple

import jax

from ..models.segpp import YOLOSegPP
from ..models.yolo import build_yolo, parse_model_spec
from .checkpoint import load_checkpoint, save_checkpoint

MAGIC = "yolou_tpu_model_v1"


def save_model(path: str, variables: Dict, *, arch: str = "yolov12",
               variant: str = "n", nc: int = 1, ch: int = 4,
               task: str = "detect", kind: str = "yolo",
               use_logits: bool = True) -> None:
    meta = {"magic": MAGIC, "arch": arch, "variant": variant, "nc": nc,
            "ch": ch, "task": task, "kind": kind, "use_logits": use_logits}
    save_checkpoint(path, {"meta_json": json.dumps(meta),
                           "variables": jax.device_get(variables)})


def load_model(path: str, dtype=None, use_pallas: bool = False
               ) -> Tuple[object, Dict]:
    blob = load_checkpoint(path)
    meta = json.loads(blob["meta_json"])
    assert meta["magic"] == MAGIC, f"not a yolou_tpu model file: {path}"
    kwargs = {} if dtype is None else {"dtype": dtype}
    if meta["kind"] == "segpp":
        spec = parse_model_spec(meta["arch"], meta["variant"], meta["nc"],
                                meta["ch"], meta["task"])
        model = YOLOSegPP(spec=spec, use_logits=meta["use_logits"],
                          use_pallas=use_pallas, **kwargs)
    else:
        model = build_yolo(meta["arch"], meta["variant"], meta["nc"],
                           meta["ch"], meta["task"], use_pallas=use_pallas,
                           **kwargs)
    return model, blob["variables"]
