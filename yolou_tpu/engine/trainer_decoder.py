"""Decoder-stage trainer (YOLOSegPlusPlus fine-tune on frozen YOLO encoder).

Behavioral equivalent of the reference Trainer (/root/reference/train.py:27-468)
— AdamW + cosine anneal, Dice loss, Dice/HD95/precision/recall validation,
best/last checkpointing, early stopping with significance band — redesigned
TPU-first:

  * one jitted, donated train step (loss + grads + metric in a single XLA
    program) instead of a Python autograd loop,
  * bfloat16 compute option instead of AMP GradScaler (bf16 needs no scaler),
  * frozen encoder via optax param partition (the reference's generator-based
    split; its exhausted-generator grad-clip no-op — quirk §2.4.1 — becomes an
    explicit `clip_grad_norm=None` default),
  * data-parallel over a device mesh when one is provided,
  * checkpoints include optimizer state; resume actually works (§2.4.5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import freeze, unfreeze

from ..data.decoder_dataset import DecoderDataset, prefetch
from ..losses.dice import soft_dice_loss
from ..metrics.seg import (dice_binary, hd95_batch, nanmean,
                           precision_recall_counts)
from ..models.segpp import YOLOSegPP
from ..parallel import mesh as meshlib
from ..utils.async_metrics import ScalarPipeline
from ..utils.checkpoint import load_checkpoint, save_checkpoint


def plot_history(history: Dict[str, list], save_path: str,
                 filename: str = "plot.png") -> None:
    """Plot every metric series to one PNG (reference plot_loss_curves,
    train.py:155-195: auto-discovered keys, colour cycle, legend, grid)."""
    import itertools
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(save_path, exist_ok=True)
    plt.figure(figsize=(10, 6))
    colours = itertools.cycle(
        ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
         "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf"])
    for key in sorted(history.keys()):
        plt.plot(history[key], label=key.replace("_", " ").title(),
                 color=next(colours))
    plt.title("Training History")
    plt.xlabel("Epoch")
    plt.ylabel("Value")
    plt.legend()
    plt.grid(True)
    plt.savefig(os.path.join(save_path, filename))
    plt.close()


@dataclasses.dataclass
class DecoderTrainConfig:
    image_size: int = 160
    batch_size: int = 128
    lr: float = 1e-4
    weight_decay: float = 0.01          # torch AdamW default
    epochs: int = 75
    patience: int = 10
    early_stopping: bool = True
    early_stopping_start: int = 50
    clip_grad_norm: Optional[float] = None   # reference effective behavior: none
    seed: int = 42
    shuffle: bool = False               # reference quirk §2.4.4: fixed order
    run_dir: str = "runs"
    val_hd95: bool = True
    # Reference quirk §2.4.2: training conditions the logits bottleneck with
    # a per-image z-score before the sigmoid while evaluation feeds the raw
    # sigmoid (dataset.py:88-97 vs evaluate_model.py:142-144). False trains
    # on raw-sigmoid maps — the matched-conditioning "fix" arm quantified in
    # CONDITIONING.md.
    normalize_objectmap: bool = True
    device_data: bool = True        # keep train+val sets in HBM, gather each
    #   batch on device (single-device, under device_data_budget_mb). Same
    #   rationale as DetectorTrainConfig.device_data: host->device transfers
    #   dominate the loop on slow links (UPLOAD_PROBE.json), and the
    #   reference re-ships every batch per step (train.py:228-236
    #   DataLoader). Batch composition matches the host path exactly (same
    #   wrap-padded order), so trajectories match to reduction/fusion
    #   precision (the epoch runs as one lax.scan program).
    device_data_budget_mb: int = 4096


class TrainState(NamedTuple):
    params: Any          # full param tree (encoder + decoder)
    batch_stats: Any
    opt_state: Any
    step: jax.Array


class DecoderTrainer:
    def __init__(self, model: YOLOSegPP, variables: Dict, data_root: str,
                 cfg: DecoderTrainConfig = DecoderTrainConfig(),
                 mesh=None):
        # `variables` leaves are referenced, not copied, and the jitted train
        # step donates its state: pass host arrays (jax.device_get) if the
        # same tree is used elsewhere, or its device buffers get deleted.
        self.model = model
        self.cfg = cfg
        self.data_root = data_root
        self.mesh = mesh
        self.history: Dict[str, list] = {
            k: [] for k in ("train_loss", "val_loss", "train_dice_metric",
                            "val_dice_metric", "val_hd95_metric",
                            "val_precision", "val_recall")}

        self.epoch_times: list = []     # wall seconds per train phase (no val)
        self._params0 = (unfreeze(variables["params"])
                         if hasattr(variables["params"], "unfreeze")
                         else dict(variables["params"]))
        self._batch_stats0 = variables["batch_stats"]
        self.state: Optional[TrainState] = None
        self.tx = None
        self._spe: Optional[int] = None

    # ------------------------------------------------------------------ setup
    def ensure_ready(self, steps_per_epoch: int = 1) -> None:
        """Build optimizer + jitted steps (cosine over epochs, stepped per
        update: decay_steps = epochs * steps_per_epoch ~ CosineAnnealingLR
        T_max=epochs)."""
        if self.state is not None:
            # state survives, but schedules and the epoch-scan length are
            # baked per steps_per_epoch: rebuild them on mismatch rather than
            # silently running the wrong number of optimizer steps (ADVICE r4)
            if steps_per_epoch != self._spe:
                self.tx = self._rebuild_tx(steps_per_epoch)
                self._spe = steps_per_epoch
                self._build_steps()
            return
        self.tx = self._rebuild_tx(steps_per_epoch)
        opt_state = self.tx.init(self._params0)
        self.state = TrainState(params=self._params0,
                                batch_stats=self._batch_stats0,
                                opt_state=opt_state,
                                step=jnp.zeros((), jnp.int32))
        self._spe = steps_per_epoch
        self._build_steps()

    def _rebuild_tx(self, steps_per_epoch: int):
        """Masked AdamW + cosine (schedule length = epochs*steps_per_epoch);
        same optax state structure for any steps_per_epoch, so it can be
        swapped under an existing opt_state when spe changes."""
        cfg = self.cfg
        schedule = optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(cfg.epochs * steps_per_epoch, 1))
        tx = optax.adamw(learning_rate=schedule, weight_decay=cfg.weight_decay)
        if cfg.clip_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), tx)
        # mask: only decoder/output params train; 'yolo' subtree frozen.
        # LOAD-BEARING INVARIANT: optax.masked passes unmasked leaves'
        # updates through UNCHANGED — apply_updates would ADD raw encoder
        # grads to the encoder params. This is safe ONLY because the model
        # stop-gradients every encoder output (segpp.py SKIP_TAPS + logit
        # map), making grads['yolo'] structural zeros. Pinned end-to-end by
        # test_io_misc.py::test_decoder_frozen_encoder_bit_exact.
        def mask_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: path[0].key != "yolo", params)
        return optax.masked(tx, mask_fn)

    def _build_steps(self):
        model = self.model

        def to_unit(x):
            # batches ship as uint8 (4x less tunnel traffic); /255 on device
            # is bit-exact vs the host f32 path (DecoderDataset.item_u8)
            return (x.astype(jnp.float32) / 255.0
                    if x.dtype == jnp.uint8 else x)

        def train_step(state: TrainState, img, mask, om):
            img, mask = to_unit(img), to_unit(mask)

            def loss_fn(params):
                (pred, _), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    img, logits=om, train=True, mutable=["batch_stats"])
                loss = soft_dice_loss(pred, mask)
                return loss, (pred, updates["batch_stats"])

            (loss, (pred, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            pred_bin = (jax.nn.sigmoid(pred) > 0.5).astype(jnp.float32)
            dice = jnp.mean(dice_binary(pred_bin[..., 0], mask[..., 0]))
            new_state = TrainState(new_params, new_bs, new_opt, state.step + 1)
            return new_state, loss, dice

        def eval_step(state: TrainState, img, mask, om, n_real):
            img, mask = to_unit(img), to_unit(mask)
            (pred, _) = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                img, logits=om, train=False)
            sample_mask = (jnp.arange(img.shape[0]) < n_real).astype(jnp.float32)
            # wrap-padded rows must not contribute to the global (batch=True)
            # Dice reduction: zeroing pred-probability AND target per padded
            # row makes the sums identical to excluding those rows outright
            row = sample_mask[:, None, None, None]
            probs = jax.nn.sigmoid(pred.astype(jnp.float32)) * row
            loss = soft_dice_loss(probs, mask * row, sigmoid=False)
            pred_bin = (jax.nn.sigmoid(pred) > 0.5).astype(jnp.float32)
            dice = dice_binary(pred_bin[..., 0], mask[..., 0])
            tp, fp, fn = precision_recall_counts(
                pred_bin[..., 0] * sample_mask[:, None, None],
                mask[..., 0] * sample_mask[:, None, None])
            return loss, dice, (tp, fp, fn), pred_bin

        donate = (0,)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._eval_step = jax.jit(eval_step)
        self._hd95 = hd95_batch

        # device-resident data path (cfg.device_data): the step gathers its
        # batch from HBM via this epoch's wrap-padded index order `perm`
        # (uploaded once per epoch) + state.step — zero per-step host traffic
        spe, cfg = self._spe, self.cfg

        def dd_train(state, dset, perm):
            b = cfg.batch_size
            off = (state.step % spe) * b
            sel = jax.lax.dynamic_slice(perm, (off,), (b,))
            return train_step(state,
                              jnp.take(dset["img"], sel, axis=0),
                              jnp.take(dset["mask"], sel, axis=0),
                              jnp.take(dset["om"], sel, axis=0))

        def dd_eval(state, dset, perm, off):
            # n_real from the STATIC dataset length and the batch offset —
            # no per-batch host metadata beyond the offset scalar
            b = cfg.batch_size
            n = dset["img"].shape[0]
            sel = jax.lax.dynamic_slice(perm, (off,), (b,))
            n_real = jnp.minimum(b, n - off)
            mask = jnp.take(dset["mask"], sel, axis=0)
            res = eval_step(state,
                            jnp.take(dset["img"], sel, axis=0),
                            mask,
                            jnp.take(dset["om"], sel, axis=0), n_real)
            # also hand back the gathered unit-scale mask so HD95 (a jax
            # computation) can consume it without re-shipping host masks
            return res + (to_unit(mask),)

        def dd_epoch(state, dset, perm):
            # whole-epoch lax.scan: ONE dispatch + ONE metric fetch per EPOCH
            # (each per-step dispatch through the tunnel costs most of a
            # ~23 ms RTT even with device-resident data — HOST_GAP.json r4).
            # The trajectory matches the host-upload path to reduction/fusion
            # precision — the scan compiles the step body in one program, so
            # XLA fusion differs bitwise
            # (test_io_misc.py::test_decoder_device_data_trajectory_equivalence).
            def body(carry, _):
                st, acc = carry
                st, loss, dice = dd_train(st, dset, perm)
                acc = acc + jnp.stack([loss, dice]).astype(jnp.float32)
                return (st, acc), None
            (state, acc), _ = jax.lax.scan(
                body, (state, jnp.zeros((2,), jnp.float32)), None, length=spe)
            return state, acc

        self._epoch_dd = jax.jit(dd_epoch, donate_argnums=(0,))

        def dd_val(state, dset, perm):
            # whole-split validation scan (device-resident data): ONE dispatch
            # + ONE fetch for the entire val pass — the per-batch loop paid
            # ~3 tunnel RTTs per batch (dispatch + scalar + array fetches).
            # HD95 moves inside the program too (it is pure jax); padded tail
            # rows are cut host-side exactly as the per-batch path did.
            b = cfg.batch_size
            n = dset["img"].shape[0]
            n_batches = -(-n // b)
            offs = jnp.arange(n_batches, dtype=jnp.int32) * b

            def body(carry, off):
                loss, dice, (tp, fp, fn), pred_bin, mask_u = dd_eval(
                    state, dset, perm, off)
                hd = (hd95_batch(pred_bin[..., 0], mask_u[..., 0])
                      if cfg.val_hd95 else jnp.zeros((b,), jnp.float32))
                return carry, (loss, dice, jnp.stack([tp, fp, fn]), hd)

            _, ys = jax.lax.scan(body, 0, offs)
            return ys

        self._val_dd = jax.jit(dd_val)

    # ------------------------------------------------------------------ loops
    def _loaders(self):
        cfg = self.cfg
        mk = lambda split: DecoderDataset(
            self.data_root, f"images/{split}", f"masks/{split}",
            cfg.image_size, objectmap_path=f"objectmap/{split}",
            normalize_objectmap=cfg.normalize_objectmap)
        return mk("train"), mk("val")

    def train(self, resume_from: Optional[str] = None) -> Dict[str, list]:
        cfg = self.cfg
        train_ds, val_ds = self._loaders()
        steps_per_epoch = max(1, -(-len(train_ds) // cfg.batch_size))
        self.ensure_ready(steps_per_epoch)
        run_dir = os.path.join(cfg.run_dir, time.strftime("%Y_%m_%d_%H_%M_%S"))
        weights_dir = os.path.join(run_dir, "weights")
        os.makedirs(weights_dir, exist_ok=True)
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

        start_epoch = 0
        if resume_from:
            ck = load_checkpoint(resume_from, jax.device_get(self.state._asdict()))
            self.state = TrainState(**ck)
            # step counts optimizer updates, not epochs (the reference's dead
            # `load_and_train` flag, train.py:39,129, never resumed at all).
            start_epoch = int(self.state.step) // steps_per_epoch

        if self.mesh is not None:
            self.state = meshlib.replicate(self.mesh, self.state)

        best_val_dice = float("-inf")
        patience = 0
        key = jax.random.key(cfg.seed)

        def wrap_perm(order: np.ndarray, b: int) -> np.ndarray:
            """batches() index order incl. its repeat-first tail padding."""
            out = []
            for st in range(0, len(order), b):
                c = order[st:st + b]
                if len(c) < b:
                    c = np.concatenate([c, np.full(b - len(c), c[0])])
                out.append(c)
            return np.concatenate(out).astype(np.int32)

        # device-resident datasets: one upload per run (see cfg.device_data)
        use_dd = (self.mesh is None and cfg.device_data
                  and train_ds.objectmap_dir is not None)
        if use_dd:
            s = cfg.image_size
            c0 = train_ds.item_u8(0)[0].shape[-1]
            nbytes = (len(train_ds) + len(val_ds)) * (
                s * s * (c0 + 1) + 400 * 4)
            use_dd = nbytes <= cfg.device_data_budget_mb * 2**20
        dset_tr = dset_va = perm_va = None
        if use_dd:
            def _stack(ds):
                items = [ds.item_u8(i) for i in range(len(ds))]
                return {"img": jnp.asarray(np.stack([it[0] for it in items])),
                        "mask": jnp.asarray(np.stack([it[1] for it in items])),
                        "om": jnp.asarray(np.stack([it[2] for it in items]))}
            dset_tr, dset_va = _stack(train_ds), _stack(val_ds)
            perm_va = jnp.asarray(
                wrap_perm(np.arange(len(val_ds)), cfg.batch_size))

        for epoch in range(start_epoch, cfg.epochs):
            # -------- train
            t0 = time.time()
            tr_loss = tr_dice = 0.0
            nb = 0
            pipe = ScalarPipeline(depth=2)
            nan_hit = False

            def _acc(got):
                nonlocal tr_loss, tr_dice, nan_hit
                lf = float(got[0])
                if np.isnan(lf):
                    nan_hit = True
                tr_loss += lf
                tr_dice += float(got[1])

            def staged_iter():
                # uint8 batches from the RAM cache, with the host->device
                # transfer staged HERE: under `prefetch` this runs on the
                # worker thread, overlapping upload with device compute
                it = train_ds.batches(cfg.batch_size, shuffle=cfg.shuffle,
                                      seed=cfg.seed + epoch, u8=True)
                for imgs, masks, oms, _n in it:
                    batch = (imgs, masks, oms)
                    if self.mesh is not None:
                        batch = meshlib.shard_batch(self.mesh, batch)
                    else:
                        batch = jax.tree_util.tree_map(jnp.asarray, batch)
                    yield batch

            if use_dd:
                # device-side metric accumulation; NaN propagates through the
                # sum, so the abort fires at epoch end instead of one step
                # late — same outcome, zero per-step fetches
                order = np.arange(len(train_ds))
                if cfg.shuffle:
                    np.random.default_rng(cfg.seed + epoch).shuffle(order)
                perm_tr = jnp.asarray(wrap_perm(order, cfg.batch_size))
                self.state, acc = self._epoch_dd(self.state, dset_tr, perm_tr)
                nb = steps_per_epoch
                vals = jax.device_get(acc)
                _acc((vals[0], vals[1]))
            else:
                for batch in prefetch(staged_iter(), depth=3):
                    self.state, loss, dice = self._train_step(
                        self.state, *batch)
                    # pipelined fetch (one step delayed) keeps the device
                    # busy while the host stages the next batch; the NaN
                    # abort below therefore fires at most one step late
                    got = pipe.push((loss, dice))
                    if got is not None:
                        _acc(got)
                    nb += 1
                    if nan_hit:
                        break
                for got in pipe.drain():
                    _acc(got)
            if nan_hit:
                print("NaN loss detected!")
                return self.history
            tr_loss /= max(nb, 1)
            tr_dice /= max(nb, 1)
            t1 = time.time()
            self.epoch_times.append(t1 - t0)

            # -------- validate
            va_loss = tp_sum = fp_sum = fn_sum = 0.0
            dices, hd95s = [], []
            nb = 0

            if use_dd:
                # single fetch for the whole split; padded tail rows cut
                # host-side, counts already masked inside eval_step
                losses, dices_b, counts, hds = jax.device_get(
                    self._val_dd(self.state, dset_va, perm_va))
                nva = len(val_ds)
                for i in range(len(losses)):
                    n_real = min(cfg.batch_size, nva - i * cfg.batch_size)
                    va_loss += float(losses[i])
                    dices.append(dices_b[i][:n_real])
                    tp_sum += float(counts[i][0])
                    fp_sum += float(counts[i][1])
                    fn_sum += float(counts[i][2])
                    if cfg.val_hd95:
                        hd95s.append(hds[i][:n_real])
                    nb += 1
            else:
                def _val_batches():
                    for imgs, masks, oms, n_real in prefetch(
                            val_ds.batches(cfg.batch_size)):
                        batch = (imgs, masks, oms)
                        if self.mesh is not None:
                            batch = meshlib.shard_batch(self.mesh, batch)
                        yield (*self._eval_step(self.state, *batch, n_real),
                               masks, n_real)

                for loss, dice, (tp, fp, fn), pred_bin, masks, n_real \
                        in _val_batches():
                    va_loss += float(loss)
                    dices.append(np.asarray(dice)[:n_real])
                    # precision/recall pooled over the split (one ratio from
                    # the summed pixel counts — like the Evaluator; the
                    # reference's per-batch-mean form, train.py:388-403, is
                    # batch-size dependent and double-counts wrap-padded tail
                    # rows)
                    tp_sum += float(tp)
                    fp_sum += float(fp)
                    fn_sum += float(fn)
                    if cfg.val_hd95:
                        hd = np.asarray(
                            self._hd95(pred_bin[..., 0], masks[..., 0]))
                        hd95s.append(hd[:n_real])
                    nb += 1
            va_loss /= max(nb, 1)
            va_prec = tp_sum / (tp_sum + fp_sum + 1e-6)
            va_rec = tp_sum / (tp_sum + fn_sum + 1e-6)
            va_dice = float(np.mean(np.concatenate(dices))) if dices else 0.0
            hd_all = np.concatenate(hd95s) if hd95s else np.asarray([np.nan])
            va_hd95 = float(np.nanmean(hd_all)) if np.any(~np.isnan(hd_all)) else float("nan")
            t2 = time.time()

            # -------- schedule step (per-epoch cosine) handled via opt count:
            # our optax schedule consumes update counts; map epochs->lr by
            # re-scaling: we instead record lr for logging.
            for k, v in (("train_loss", tr_loss), ("val_loss", va_loss),
                         ("train_dice_metric", tr_dice),
                         ("val_dice_metric", va_dice),
                         ("val_hd95_metric", va_hd95),
                         ("val_precision", va_prec), ("val_recall", va_rec)):
                self.history[k].append(v)

            # -------- early stopping + checkpoints (train.py:424-465 semantics)
            if va_dice > best_val_dice:
                significant = abs(best_val_dice - va_dice) > 1e-3
                best_val_dice = max(best_val_dice, va_dice)
                self._save(os.path.join(weights_dir, "best.ckpt"))
                if significant:
                    patience = 0
                elif epoch + 1 >= cfg.early_stopping_start:
                    patience += 1
            elif epoch + 1 >= cfg.early_stopping_start:
                patience += 1

            self._dump_history(run_dir)
            print(f"epoch {epoch + 1}/{cfg.epochs} "
                  f"train_loss={tr_loss:.4f} val_loss={va_loss:.4f} "
                  f"train_dice={tr_dice:.4f} val_dice={va_dice:.4f} "
                  f"hd95={va_hd95:.3f} p={va_prec:.4f} r={va_rec:.4f} "
                  f"[{t1 - t0:.2f}s train / {t2 - t1:.2f}s val]")

            if cfg.early_stopping and patience >= cfg.patience:
                print(f"EARLY STOPPING at epoch {epoch + 1} "
                      f"(best val dice {best_val_dice:.4f})")
                break

        self._save(os.path.join(weights_dir, "last.ckpt"))
        try:
            plot_history(self.history, run_dir)
        except Exception:
            pass
        return self.history

    def _save(self, path: str) -> None:
        save_checkpoint(path, jax.device_get(self.state._asdict()))

    def _dump_history(self, run_dir: str) -> None:
        try:
            import pandas as pd
            pd.DataFrame(self.history).to_csv(
                os.path.join(run_dir, "history.csv"), index=False)
        except Exception:
            with open(os.path.join(run_dir, "history.json"), "w") as f:
                json.dump(self.history, f)

    def plot_history(self, save_path: str, filename: str = "plot.png") -> None:
        """All-metric training curves PNG (train.py:155-195 equivalent)."""
        plot_history(self.history, save_path, filename)
