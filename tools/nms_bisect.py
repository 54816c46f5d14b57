"""Bisect the post-forward stage of the bench surface (bench.py::_build).

At b128/640 the e2e headline pays ~8.6 ms over the bare forward (40.7 vs
32.1 ms, tools/mega_probe.py + BENCH_DETAILS). This times each piece on the
REAL candidate distribution the bench sees (random weights => nearly all
8400 anchors pass conf 0.25, the adversarial worst case):

  cast        u8 s2d buffer -> /255 -> bf16
  fwd         model forward (preds + protos)
  fwd+nms     the full bench program
  nms_* :     standalone NMS stages on captured preds
      topk        conf gate + top_k(8400 -> K) + gathers
      iou         box_iou on the K candidates (+ class offset)
      greedy      Jacobi fixpoint suppression + final top_k
      matrix      Fast-NMS suppression variant + final top_k

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/nms_bisect.py
"""
import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.models.yolo import build_yolo
from yolou_tpu.ops.nms import (NMSResult, _suppress_greedy, _suppress_matrix,
                               non_max_suppression)
from yolou_tpu.ops.boxes import box_iou, xywh2xyxy


def slope(fn, args, iters=24):
    sumfn = jax.jit(lambda o: jnp.sum(jax.tree.leaves(o)[0].astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--topk", type=int, default=1024)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    b, s, k = args.batch, args.imgsz, args.topk

    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                       dtype=jnp.bfloat16, use_pallas=True, stem_s2d=True)
    init_model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                            dtype=jnp.bfloat16, use_pallas=True)
    v = jax.jit(lambda key, x: init_model.init(key, x, train=False))(
        jax.random.key(0), jnp.zeros((1, s, s, 4)))
    rng = np.random.default_rng(0)
    b4 = s // 4
    imgs_np = rng.integers(0, 255, (b, s, s, 4), dtype=np.uint8)
    imgs_np = imgs_np.reshape(b, b4, 4, b4, 4, 4).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, b4, b4, 64)
    imgs = jnp.asarray(imgs_np)

    res = {}

    cast = jax.jit(lambda u: (u.astype(jnp.float32) / 255.0).astype(jnp.bfloat16))
    res["cast"] = slope(cast, (imgs,))

    def fwd(v, u):
        x = (u.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        out = model.apply(v, x, train=False)
        return out.preds, out.protos
    jfwd = jax.jit(fwd)
    res["cast+fwd"] = slope(jfwd, (v, imgs))

    def full(v, u):
        x = (u.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        out = model.apply(v, x, train=False)
        dets = non_max_suppression(out.preds.astype(jnp.float32),
                                   conf_thres=0.25, iou_thres=0.45,
                                   max_det=300, nc=1)
        return dets.boxes, dets.conf, dets.valid, out.protos
    res["bench_e2e"] = slope(jax.jit(full), (v, imgs))

    preds = jax.block_until_ready(jfwd(v, imgs)[0].astype(jnp.float32))
    print(f"preds {preds.shape} conf>0.25 frac "
          f"{float(jnp.mean(jnp.max(preds[..., 4:5], -1) > 0.25)):.3f}",
          flush=True)

    nmsf = jax.jit(lambda p: non_max_suppression(
        p, conf_thres=0.25, iou_thres=0.45, max_det=300, nc=1, top_k=k))
    res[f"nms_full_k{k}"] = slope(nmsf, (preds,))

    def stage_topk(p):
        boxes = xywh2xyxy(p[:, :4])
        conf = p[:, 4]
        gate = conf > 0.25
        score = jnp.where(gate, conf, -1.0)
        score_k, idx = jax.lax.top_k(score, k)
        return boxes[idx], score_k, p[:, 5:][idx]
    jtopk = jax.jit(jax.vmap(stage_topk))
    res["nms_topk_gather"] = slope(jtopk, (preds,))
    boxes_k, score_k, ex_k = jax.block_until_ready(jtopk(preds))
    valid = score_k > 0.0

    jiou = jax.jit(jax.vmap(lambda bx: box_iou(bx, bx)))
    res["nms_iou"] = slope(jiou, (boxes_k,))
    iou = jax.block_until_ready(jiou(boxes_k))

    jg = jax.jit(jax.vmap(lambda i, va: _suppress_greedy(i, va, 0.45)))
    res["nms_greedy_sweep"] = slope(jg, (iou, valid))
    jm = jax.jit(jax.vmap(lambda i, va: _suppress_matrix(i, va, 0.45)))
    res["nms_matrix_sweep"] = slope(jm, (iou, valid))

    for kk in (256, 512):
        nf = jax.jit(lambda p, kk=kk: non_max_suppression(
            p, conf_thres=0.25, iou_thres=0.45, max_det=300, nc=1, top_k=kk))
        res[f"nms_full_k{kk}"] = slope(nf, (preds,))

    for name, ms in res.items():
        print(f"{name:20s} {ms:8.3f} ms", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"batch": b, "imgsz": s,
                       "times_ms": {n: round(t, 3) for n, t in res.items()}},
                      f, indent=2)


if __name__ == "__main__":
    main()
