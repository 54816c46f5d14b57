"""Quantify the reference's objectmap conditioning mismatch (SURVEY §2.4.2).

The decoder TRAINS on sigmoid(zscore(om)) (/root/reference/dataset.py:88-97)
but EVALUATES on sigmoid(om) raw (/root/reference/evaluate_model.py:142-144).
This probe measures, on real detector objectmaps, how far apart the two
conditioned inputs are and how each preserves foreground/background contrast —
the mechanism behind TRAINING_DEMO.md's observation that a sharp detector
(background logits ~ -9.6) makes the raw-sigmoid eval input collapse toward 0
while the z-scored train input stays centered, so the decoder must learn to
be robust to a bottleneck distribution it never trained on.

Usage:
  PYTHONPATH=/root/repo python tools/conditioning_probe.py --data <root> \
      [--ckpt yolo_checkpoint/weights/best.ckpt] [--imgsz 160]

Writes CONDITIONING_STATS.json and prints a table. Also runs an analytic
sweep over background-logit levels (no model needed).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def conditionings(om):
    mu, sd = om.mean(), om.std(ddof=1)  # torch.std is unbiased (dataset.py:90)
    train = sigmoid((om - mu) / sd if sd > 0 else om - mu)
    ev = sigmoid(om)
    return train, ev


def stats_for(om, fg):
    """fg: boolean foreground mask at objectmap resolution."""
    train, ev = conditionings(om)
    out = {}
    for name, m in (("train_zscore_sigmoid", train), ("eval_raw_sigmoid", ev)):
        fg_mean = float(m[fg].mean()) if fg.any() else None
        bg_mean = float(m[~fg].mean()) if (~fg).any() else None
        out[name] = {
            "mean": float(m.mean()),
            "fg_mean": fg_mean,
            "bg_mean": bg_mean,
            "contrast": (fg_mean - bg_mean
                         if fg_mean is not None and bg_mean is not None
                         else None),
        }
    out["l1_between_paths"] = float(np.abs(train - ev).mean())
    out["raw_logit_mean"] = float(om.mean())
    return out


def analytic_sweep():
    """bg logit level sweep at fixed fg offset +6, 5% fg pixels, noise std 1."""
    rng = np.random.default_rng(0)
    rows = []
    for bg in (-2.0, -5.0, -9.6, -14.0):
        om = rng.normal(bg, 1.0, (20, 20)).astype(np.float64)
        fgm = np.zeros((20, 20), bool)
        fgm[8:11, 8:11] = True                       # ~2% fg
        om[fgm] += 6.0
        s = stats_for(om, fgm)
        rows.append({
            "bg_logit": bg,
            "train_contrast": s["train_zscore_sigmoid"]["contrast"],
            "eval_contrast": s["eval_raw_sigmoid"]["contrast"],
            "eval_bg_level": s["eval_raw_sigmoid"]["bg_mean"],
            "l1_between_paths": s["l1_between_paths"],
        })
    return rows


def measured_on_data(data_root, ckpt, imgsz):
    import cv2
    import jax
    import jax.numpy as jnp

    from yolou_tpu.cli.common import get_or_init_detector

    model, variables = get_or_init_detector(ckpt, nc=1, ch=4, task="segment",
                                            imgsz=imgsz)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False).raw[0][..., -1])

    img_dir = os.path.join(data_root, "images/val")
    mask_dir = os.path.join(data_root, "masks/val")
    names = sorted(n for n in os.listdir(img_dir) if n.endswith(".png"))
    per_image = []
    for n in names:
        img = cv2.imread(os.path.join(img_dir, n), cv2.IMREAD_UNCHANGED)
        img = cv2.resize(img, (imgsz, imgsz)).astype(np.float32) / 255.0
        om = np.asarray(fwd(variables, jnp.asarray(img[None])))[0]
        mask = cv2.imread(os.path.join(mask_dir, n), cv2.IMREAD_GRAYSCALE)
        fg = cv2.resize(mask, om.shape[::-1],
                        interpolation=cv2.INTER_AREA) > 127
        per_image.append(stats_for(om.astype(np.float64), fg))
    return per_image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--ckpt", default="yolo_checkpoint/weights/best.ckpt")
    ap.add_argument("--imgsz", type=int, default=160)
    ap.add_argument("--out", default="CONDITIONING_STATS.json")
    args = ap.parse_args()

    result = {"analytic_sweep": analytic_sweep()}
    if args.data:
        per_image = measured_on_data(args.data, args.ckpt, args.imgsz)
        agg = {}
        for path in ("train_zscore_sigmoid", "eval_raw_sigmoid"):
            cs = [s[path]["contrast"] for s in per_image
                  if s[path]["contrast"] is not None]
            bgs = [s[path]["bg_mean"] for s in per_image
                   if s[path]["bg_mean"] is not None]
            agg[path] = {
                "mean_contrast": float(np.mean(cs)) if cs else None,
                "mean_bg": float(np.mean(bgs)) if bgs else None,
            }
        agg["mean_l1_between_paths"] = float(
            np.mean([s["l1_between_paths"] for s in per_image]))
        agg["mean_raw_logit"] = float(
            np.mean([s["raw_logit_mean"] for s in per_image]))
        agg["n_images"] = len(per_image)
        result["measured"] = agg

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
