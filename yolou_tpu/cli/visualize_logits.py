"""Logit-map visualization CLI — reference `python visualize_logits.py`
(/root/reference/visualize_logits.py): show/save the 20x20 sigmoid class-logit
heatmap for a single image plus its confidence statistics."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..engine.generate import argmax_confidence, spatial_confidence
from ..engine.predictor import Predictor, load_source
from .common import get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(description="Visualize detector logit maps")
    p.add_argument("image")
    p.add_argument("--yolo_dir", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--out", default=None, help="save PNG instead of showing")
    args = p.parse_args(argv)

    model, variables = get_or_init_detector(
        args.yolo_dir, nc=1, ch=4, task="detect", imgsz=args.image_size)
    pred = Predictor(model, variables, imgsz=args.image_size, channels=4,
                     batch_size=1)
    (_, img), = load_source(args.image, channels=4)
    out = pred.raw_forward(img[None])
    logits = np.asarray(out.raw[0][0, ..., -1])
    probs = 1 / (1 + np.exp(-logits))
    print(f"spatial_confidence(top20%)={spatial_confidence(logits):.4f}")
    print(f"argmax_confidence={argmax_confidence(logits):.4f}")

    try:
        import matplotlib
        matplotlib.use("Agg" if args.out else matplotlib.get_backend())
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(9, 4))
        axes[0].imshow(img[..., :3][..., ::-1])
        axes[0].set_title(os.path.basename(args.image))
        im = axes[1].imshow(probs, cmap="viridis")
        axes[1].set_title("sigmoid(P3 class logits) 20x20")
        fig.colorbar(im, ax=axes[1])
        if args.out:
            fig.savefig(args.out, dpi=120)
            print(f"saved {args.out}")
        else:
            plt.show()
    except Exception as e:  # headless-safe
        print(f"(plot skipped: {e})")
    return probs


if __name__ == "__main__":
    main()
