"""Decoder training CLI — the reference `python train.py` entry point
(/root/reference/train.py:554-595) with its config of record as defaults
(imgsz 160, batch 128, lr 1e-4, 75 epochs, early stop start 50 / patience 10,
seed 42)."""

from __future__ import annotations

import argparse

from ..engine.trainer_decoder import DecoderTrainConfig, DecoderTrainer
from ..parallel import mesh as meshlib
from ..utils.model_io import save_model
from .common import build_segpp_from_detector, get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(description="Train the YOLOSegPlusPlus decoder")
    p.add_argument("--model", default="yolo_checkpoint/weights/best.ckpt",
                   help="detector checkpoint (fresh init if missing)")
    p.add_argument("--data", default="data/stacked_segmentation")
    p.add_argument("--imgsz", type=int, default=160)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--epochs", type=int, default=75)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--early-stopping-start", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-logits", action="store_true",
                   help="ablation: decoder without the logits bottleneck")
    p.add_argument("--raw-objectmaps", action="store_true",
                   help="train on raw-sigmoid objectmaps (matched eval "
                        "conditioning) instead of the reference's z-scored "
                        "maps — see CONDITIONING.md")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (the TPU mixed-precision mode; "
                        "replaces the reference's AMP GradScaler)")
    p.add_argument("--run-dir", default="runs")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard batches over N devices (0 = single device)")
    p.add_argument("--resume", default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else None
    det_model, det_vars = get_or_init_detector(
        args.model, nc=1, ch=4, task="detect", imgsz=args.imgsz,
        seed=args.seed)
    model, variables = build_segpp_from_detector(
        det_vars, nc=1, ch=4, use_logits=not args.no_logits,
        imgsz=args.imgsz, seed=args.seed, dtype=dtype)

    mesh = meshlib.make_mesh(args.data_parallel) if args.data_parallel else None
    cfg = DecoderTrainConfig(
        image_size=args.imgsz, batch_size=args.batch, lr=args.lr,
        epochs=args.epochs, patience=args.patience,
        early_stopping_start=args.early_stopping_start, seed=args.seed,
        run_dir=args.run_dir, normalize_objectmap=not args.raw_objectmaps)
    trainer = DecoderTrainer(model, variables, args.data, cfg, mesh=mesh)
    history = trainer.train(resume_from=args.resume)
    save_model(f"{args.run_dir}/segpp_final.ckpt",
               {"params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats},
               nc=1, ch=4, task="detect", kind="segpp",
               use_logits=not args.no_logits)
    return history


if __name__ == "__main__":
    main()
