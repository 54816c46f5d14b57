"""Shared test helpers: cached, jitted model inits (eager init is slow on CPU)."""

from functools import lru_cache

import jax
import jax.numpy as jnp

from yolou_tpu.models.yolo import build_yolo


@lru_cache(maxsize=8)
def cached_init(arch="yolov12", variant="n", task="detect", ch=4, nc=1, imgsz=160):
    model = build_yolo(arch, variant, nc=nc, ch=ch, task=task)
    init = jax.jit(lambda k, x: model.init(k, x, train=False))
    variables = init(jax.random.key(0), jnp.zeros((1, imgsz, imgsz, ch)))
    return model, jax.device_get(variables)
