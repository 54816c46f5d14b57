"""Detector/segmenter fine-tune trainer (the stage-1 YOLO training loop).

The reference only subclasses Ultralytics' trainer (custom_yolo_trainer/
custom_trainer.py) and inherits its loop from pip; this module owns the whole
loop TPU-natively: warmup + cosine LR, EMA params, on-device augmentation
(close-mosaic schedule included), the v8 det/seg loss with TAL, data-parallel
execution over a device mesh, and checkpointing with resume.

Design notes (TPU-first):
  * one jitted step: device aug -> forward -> loss -> grads -> optimizer,
    with donated state; batches shard over the mesh 'data' axis, params are
    replicated, XLA inserts the gradient all-reduce over ICI,
  * EMA is a jitted lerp over the param tree (Ultralytics decay ramp
    d = d0 * (1 - exp(-step/tau))),
  * close_mosaic epochs switch to a no-mosaic jit specialization (two static
    variants, both cached).
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

from ..data.augment import AugHyp, augment_batch
from ..data.yolo_dataset import (YoloSegDataset, collate_idmap_cached,
                                 collate_idmap_packed)
from ..data.decoder_dataset import prefetch
from ..losses.v8 import LossHyp, v8_loss
from ..models.yolo import YOLOModel
from ..parallel import mesh as meshlib
from ..utils.async_metrics import ScalarPipeline
from ..utils.checkpoint import load_checkpoint, save_checkpoint


@dataclasses.dataclass
class DetectorTrainConfig:
    imgsz: int = 160
    batch_size: int = 16
    epochs: int = 10
    lr0: float = 0.01
    lrf: float = 0.01               # final lr fraction (cosine)
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0
    clip_grad_norm: float = 10.0    # ultralytics BaseTrainer clips at 10.0
    skip_nonfinite: bool = True     # skip the update when grads are inf/nan
    close_mosaic: int = 10          # disable mosaic for the last N epochs
    max_instances: int = 16
    mask_ratio: int = 4
    seed: int = 0
    run_dir: str = "runs_detector"
    optimizer: str = "sgd"          # "sgd" (ultralytics auto default) | "adamw"
    val_every: int = 0              # eval-during-train: mAP on val every N epochs (0 = off)
    packed_upload: bool = True      # ship each batch as ONE packed u8 buffer
    #   (single-device path only): every tunnel transfer pays a full RPC
    #   round-trip, so 4 per-step jnp.asarray calls cost ~4x one
    #   (HOST_GAP.json r4). The jitted step unpacks with static slices.
    device_data: bool = True        # keep the WHOLE dataset in HBM and gather
    #   each batch on device (single-device path, dataset under
    #   device_data_budget_mb). Host->device transfers are the train loop's
    #   bottleneck when the link is slow (UPLOAD_PROBE.json r4: ~25-50 MB/s
    #   through the tunnel, uploads do not overlap compute — the reference's
    #   DataLoader ships every batch over PCIe each step,
    #   /root/reference/train.py:228-236); with a static dataset and
    #   ON-DEVICE augmentation the step needs only indices, so one dataset
    #   upload per run + one ~KB permutation upload per epoch replace all
    #   per-step traffic. Batch composition and key sequence match the host
    #   path exactly (same wrap-filled permutation), so the training
    #   trajectory matches to reduction/fusion precision
    #   (test_trainer_detector.py).
    device_data_budget_mb: int = 4096  # v5e has 16 GB HBM; model+opt is ~MBs
    flat_opt: bool = True           # SGD path as one flat-vector update
    #   (engine/flat_opt.py): exact make_detector_tx math without the ~386
    #   per-leaf ops of the optax chain + EMA lerp. Checkpoints then store
    #   ema_params / momentum as flat f32 vectors; `load_resume` detects and
    #   converts the other format (momentum/opt state reinitialized with a
    #   printed notice). AdamW always uses the optax chain.


def make_detector_tx(cfg: "DetectorTrainConfig", steps_per_epoch: int):
    """Ultralytics BaseTrainer.build_optimizer + warmup parity: three param
    groups — biases (no decay, lr warms up FROM warmup_bias_lr), norm scales
    (no decay), and weights (decayed) — with per-step linear warmup of lr and
    momentum (warmup_momentum -> momentum) followed by cosine decay to
    lr0*lrf. Returns (tx, lr_main, lr_bias, mom_fn)."""
    total = max(1, cfg.epochs * steps_per_epoch)
    warm = int(cfg.warmup_epochs * steps_per_epoch)

    def cosine(step):
        prog = jnp.clip((step - warm) / jnp.maximum(total - warm, 1), 0.0, 1.0)
        return cfg.lr0 * (cfg.lrf + (1 - cfg.lrf) * 0.5 * (1 + jnp.cos(jnp.pi * prog)))

    def lr_fn(step, start):
        frac = jnp.clip(step / jnp.maximum(warm, 1), 0.0, 1.0)
        warm_lr = start + (cosine(step) - start) * frac
        return jnp.where(step < warm, warm_lr, cosine(step))

    lr_main = lambda step: lr_fn(step, 0.0)
    lr_bias = lambda step: lr_fn(step, cfg.warmup_bias_lr)

    def mom_fn(step):
        frac = jnp.clip(step / jnp.maximum(warm, 1), 0.0, 1.0)
        return jnp.where(step < warm,
                         cfg.warmup_momentum
                         + (cfg.momentum - cfg.warmup_momentum) * frac,
                         cfg.momentum)

    if cfg.optimizer == "adamw":
        # ultralytics AdamW path: betas=(momentum, 0.999), no momentum ramp
        # (torch param groups without a "momentum" key skip the warmup interp)
        mk = lambda lr, wd: optax.adamw(lr, b1=cfg.momentum, weight_decay=wd)
    else:
        sgd = optax.inject_hyperparams(
            lambda learning_rate, momentum: optax.sgd(
                learning_rate, momentum=momentum, nesterov=True))
        mk = lambda lr, wd: (
            optax.chain(optax.add_decayed_weights(wd),
                        sgd(learning_rate=lr, momentum=mom_fn))
            if wd else sgd(learning_rate=lr, momentum=mom_fn))

    def label_fn(params):
        def label(path, _):
            leaf = path[-1].key
            if leaf == "bias":
                return "bias"
            if leaf == "scale":      # BatchNorm weight: no decay
                return "nodecay"
            return "decay"
        return jax.tree_util.tree_map_with_path(label, params)

    base = optax.multi_transform(
        {"bias": mk(lr_bias, 0.0),
         "nodecay": mk(lr_main, 0.0),
         "decay": mk(lr_main, cfg.weight_decay)},
        label_fn)
    parts = []
    if cfg.clip_grad_norm:
        parts.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    parts.append(base)
    tx = optax.chain(*parts)
    if cfg.skip_nonfinite:
        # GradScaler-equivalent safety: drop inf/nan steps instead of
        # poisoning the weights (the reference's AMP scaler skips too)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx, lr_main, lr_bias, mom_fn


def epoch_index_batches(idx: np.ndarray, batch_size: int):
    """Split a permutation into fixed-size batches, wrap-filling the tail.

    jit needs a static batch shape, so the remainder is wrap-filled from the
    same permutation instead of dropped (the reference DataLoader keeps the
    partial batch; here every image is still seen each epoch, with a few
    repeated in the final step — PARITY.md §2.4.10)."""
    for s in range(0, len(idx), batch_size):
        sel = idx[s:s + batch_size]
        if len(sel) < batch_size:
            sel = np.concatenate([sel, np.resize(idx, batch_size - len(sel))])
        yield sel


class DetTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    ema_params: Any
    opt_state: Any
    step: jax.Array


class DetectorTrainer:
    def __init__(self, model: YOLOModel, variables: Dict, data_cfg,
                 cfg: DetectorTrainConfig = DetectorTrainConfig(),
                 aug: AugHyp = AugHyp(), loss_hyp: LossHyp = LossHyp(),
                 mesh=None):
        # `variables` leaves are referenced, not copied, and the jitted train
        # step donates its state: pass host arrays (jax.device_get) if the
        # same tree is used elsewhere, or its device buffers get deleted.
        self.model = model
        self.cfg = cfg
        self.aug = aug
        self.loss_hyp = loss_hyp
        self.data_cfg = data_cfg
        self.mesh = mesh
        self.state: Optional[DetTrainState] = None
        self._flat = None
        self._spe: Optional[int] = None
        self._variables = variables
        self.history: Dict[str, list] = {"loss": [], "box": [], "cls": [],
                                         "dfl": [], "seg": [], "lr": []}
        self.epoch_times: list = []     # wall seconds per train epoch (no val)

    # ------------------------------------------------------------------ setup
    def _make_tx(self, steps_per_epoch: int):
        tx, lr_main, lr_bias, mom_fn = make_detector_tx(self.cfg,
                                                        steps_per_epoch)
        self._lr_fn = lr_main
        self._lr_bias_fn = lr_bias
        self._mom_fn = mom_fn
        return tx

    def ensure_ready(self, steps_per_epoch: int) -> None:
        if self.state is not None:
            # schedules (warmup/cosine/EMA ramp) and the device-data epoch
            # scan length are baked per steps_per_epoch: rebuild on mismatch
            # instead of running a stale scan length (ADVICE r4). Optax state
            # structure is spe-independent, so existing state carries over.
            if steps_per_epoch != self._spe:
                self.tx = self._make_tx(steps_per_epoch)
                if self._flat is not None:
                    from .flat_opt import make_flat_detector_opt
                    self._flat = make_flat_detector_opt(
                        self.cfg, steps_per_epoch,
                        dict(self._variables["params"]))
                self._spe = steps_per_epoch
                self._build_step()
            return
        tx = self._make_tx(steps_per_epoch)
        self.tx = tx
        params = dict(self._variables["params"])
        self._flat = None
        if self.cfg.flat_opt and self.cfg.optimizer == "sgd":
            from .flat_opt import make_flat_detector_opt
            self._flat = make_flat_detector_opt(self.cfg, steps_per_epoch,
                                                params)
        if self._flat is not None:
            ema0 = self._flat.ravel(params)
            opt0 = self._flat.init(ema0)
        else:
            ema0 = jax.tree_util.tree_map(jnp.copy, params)
            opt0 = tx.init(params)
        self.state = DetTrainState(
            params=params,
            batch_stats=self._variables["batch_stats"],
            ema_params=ema0,
            opt_state=opt0,
            step=jnp.zeros((), jnp.int32),
        )
        self._spe = steps_per_epoch
        self._build_step()

    def _build_step(self):
        model = self.model
        cfg = self.cfg
        spec = model.spec
        with_masks = spec.task == "segment"
        ch = self.data_cfg.channels

        def unpack(packed):
            # static-slice unpack of collate_idmap_packed's single u8 buffer
            # (layout documented there); all extents are trace-time constants
            b, s, mi = cfg.batch_size, cfg.imgsz, cfg.max_instances
            n_cls, n_valid = b * mi * 4, b * mi
            n_img = b * s * s * ch
            q = packed[:n_cls].reshape(b, mi, 4).astype(jnp.int32)
            cls = q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (q[..., 3] << 24)
            o = n_cls
            valid = packed[o:o + n_valid].reshape(b, mi).astype(bool)
            o += n_valid
            img = packed[o:o + n_img].reshape(b, s, s, ch)
            o += n_img
            idmap = packed[o:o + b * s * s].reshape(b, s, s)
            return img, idmap, cls, valid

        def step_fn(state: DetTrainState, img_u8, idmap, cls, valid, key,
                    use_mosaic: bool):
            img = img_u8.astype(jnp.float32) / 255.0
            # the loader ships uint8 id maps (4x less tunnel traffic); the
            # augmentation arithmetic (mosaic slot offsets) needs int32
            idmap = idmap.astype(jnp.int32)
            batch = augment_batch(img, idmap, cls, valid, key, self.aug,
                                  g_out=cfg.max_instances,
                                  mask_ratio=cfg.mask_ratio,
                                  use_mosaic=use_mosaic)

            def loss_fn(params):
                out, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["img"], train=True, mutable=["batch_stats"])
                targets = {"cls": batch["cls"], "bboxes": batch["bboxes"],
                           "valid": batch["valid"], "masks": batch["masks"]}
                lo = v8_loss(out.raw, out.mask_coefs, out.protos, targets,
                             nc=spec.nc, strides=spec.strides,
                             reg_max=spec.reg_max, hyp=self.loss_hyp,
                             with_masks=with_masks)
                return lo.total, (lo.parts, updates["batch_stats"])

            (loss, (parts, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            step = state.step + 1
            d = cfg.ema_decay * (1 - jnp.exp(-step / cfg.ema_tau))
            if self._flat is not None:
                pflat = self._flat.ravel(state.params)
                new_pflat, new_opt = self._flat.update(grads,
                                                       state.opt_state, pflat)
                new_params = self._flat.unravel(new_pflat)
                new_ema = state.ema_params * d + new_pflat * (1 - d)
            else:
                updates, new_opt = self.tx.update(grads, state.opt_state,
                                                  state.params)
                new_params = optax.apply_updates(state.params, updates)
                # EMA with ramping decay
                new_ema = jax.tree_util.tree_map(
                    lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                    state.ema_params, new_params)
            new_state = DetTrainState(new_params, new_bs, new_ema, new_opt, step)
            return new_state, loss, parts

        def dispatch(s, data, k, use_mosaic):
            # `data` is either the 4-tuple (img, idmap, cls, valid) or one
            # packed u8 vector (collate_idmap_packed); jit specializes per
            # input structure so this branch resolves at trace time
            if isinstance(data, tuple):
                return step_fn(s, *data, k, use_mosaic)
            return step_fn(s, *unpack(data), k, use_mosaic)

        self._step = {
            True: jax.jit(lambda s, d, k: dispatch(s, d, k, True),
                          donate_argnums=(0,)),
            False: jax.jit(lambda s, d, k: dispatch(s, d, k, False),
                           donate_argnums=(0,)),
        }

        spe = self._spe

        def dd_step(state, dset, perm, key, use_mosaic):
            # device-resident data path: the step gathers its own batch from
            # the HBM-resident dataset; `perm` is this epoch's wrap-filled
            # index order (length spe*b, uploaded once per epoch) and
            # state.step locates the batch — zero per-step host traffic
            b = cfg.batch_size
            off = (state.step % spe) * b
            sel = jax.lax.dynamic_slice(perm, (off,), (b,))
            img = jnp.take(dset["img"], sel, axis=0)
            idmap = jnp.take(dset["idmap"], sel, axis=0)
            cls = jnp.take(dset["cls"], sel, axis=0)
            valid = jnp.take(dset["valid"], sel, axis=0)
            return step_fn(state, img, idmap, cls, valid, key, use_mosaic)

        def dd_epoch(state, dset, perm, key, use_mosaic):
            # whole-epoch lax.scan over the device-resident dataset: ONE
            # dispatch + ONE metric fetch per EPOCH. Even with zero per-step
            # data traffic, each dispatch through the tunnel costs most of a
            # ~23 ms RTT (HOST_GAP.json r4: e2e 41 ms/step vs 11.3 ms device
            # with 3 dispatches/step), so the loop itself moves on device.
            # The rng key threads through the carry with the same
            # `key, sub = split(key)` sequence as the host loop, so the
            # trajectory matches the host-upload path to reduction/fusion
            # precision — the scan compiles the step body in one program, so
            # XLA fusion differs bitwise
            # (test_trainer_detector.py::test_device_data_trajectory_equivalence).
            def body(carry, _):
                st, k, acc = carry
                k, sub = jax.random.split(k)
                st, loss, parts = dd_step(st, dset, perm, sub, use_mosaic)
                acc = acc + jnp.stack(
                    [loss, parts["box"], parts["cls"], parts["dfl"],
                     parts["seg"]]).astype(jnp.float32)
                return (st, k, acc), None
            acc0 = jnp.zeros((5,), jnp.float32)
            (state, key, acc), _ = jax.lax.scan(
                body, (state, key, acc0), None, length=spe)
            return state, key, acc

        self._epoch_dd = {
            True: jax.jit(lambda s, d, p, k: dd_epoch(s, d, p, k, True),
                          donate_argnums=(0,)),
            False: jax.jit(lambda s, d, p, k: dd_epoch(s, d, p, k, False),
                           donate_argnums=(0,)),
        }

    # ------------------------------------------------------------------ train
    def train(self, resume_from: Optional[str] = None) -> Dict[str, list]:
        cfg = self.cfg
        img_dir = self.data_cfg.split_dir("train")
        ds = YoloSegDataset(img_dir, imgsz=cfg.imgsz,
                            channels=self.data_cfg.channels,
                            cache_images=True)
        # ceil: the wrap-filled remainder batch is a real step
        steps_per_epoch = max(
            1, (len(ds) + cfg.batch_size - 1) // cfg.batch_size)
        self.ensure_ready(steps_per_epoch)

        run_dir = os.path.join(cfg.run_dir, time.strftime("%Y_%m_%d_%H_%M_%S"))
        os.makedirs(os.path.join(run_dir, "weights"), exist_ok=True)
        with open(os.path.join(run_dir, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2)

        start_epoch = 0
        if resume_from:
            self.load_resume(resume_from)
            start_epoch = int(self.state.step) // steps_per_epoch

        if self.mesh is not None:
            self.state = meshlib.replicate(self.mesh, self.state)

        key = jax.random.key(cfg.seed)
        best_fitness = float("-inf")

        # device-resident dataset: one upload per run, zero per-step traffic
        # (augmentation already runs on device; see DetectorTrainConfig)
        use_device_data = (self.mesh is None and cfg.device_data
                           and cfg.max_instances < 256)
        if use_device_data:
            s, chn, mi = cfg.imgsz, self.data_cfg.channels, cfg.max_instances
            nbytes = len(ds) * (s * s * (chn + 1) + mi * 5)
            use_device_data = nbytes <= cfg.device_data_budget_mb * 2**20
        dset_dev = None
        if use_device_data:
            cb = collate_idmap_cached(ds, list(range(len(ds))),
                                      cfg.max_instances)
            dset_dev = {k: jnp.asarray(v) for k, v in cb.items()}

        for epoch in range(start_epoch, cfg.epochs):
            mosaic_on = epoch < cfg.epochs - cfg.close_mosaic
            t0 = time.time()
            ep = {"loss": 0.0, "box": 0.0, "cls": 0.0, "dfl": 0.0, "seg": 0.0}
            nb = 0

            use_packed = (self.mesh is None and cfg.packed_upload
                          and cfg.max_instances < 256)

            def batch_iter():
                # collate from the per-image idmap cache AND stage the
                # host->device transfer here: under `prefetch` this whole
                # body runs on the worker thread, so collate + tunnel upload
                # overlap the previous step's device compute. Single-device
                # runs pack the batch into ONE buffer — each tunnel transfer
                # costs a full RPC round-trip, so one upload, not four.
                idx = np.random.default_rng(cfg.seed + epoch).permutation(len(ds))
                for sel in epoch_index_batches(idx, cfg.batch_size):
                    if use_packed:
                        yield jnp.asarray(
                            collate_idmap_packed(ds, sel, cfg.max_instances))
                        continue
                    cb = collate_idmap_cached(ds, sel, cfg.max_instances)
                    args = (jnp.asarray(cb["img"]), jnp.asarray(cb["idmap"]),
                            jnp.asarray(cb["cls"]), jnp.asarray(cb["valid"]))
                    if self.mesh is not None:
                        args = meshlib.shard_batch(self.mesh, args)
                    yield args

            pipe = ScalarPipeline(depth=2)

            def _acc(got):
                loss, parts = got
                ep["loss"] += float(loss)
                for k in ("box", "cls", "dfl", "seg"):
                    ep[k] += float(parts[k])

            if use_device_data:
                # same batches + key sequence as the host path; the whole
                # epoch runs as ONE scan dispatch with metrics accumulated on
                # device and fetched once at epoch end.
                idx = np.random.default_rng(
                    cfg.seed + epoch).permutation(len(ds))
                perm = np.concatenate(
                    [np.asarray(sel, np.int32)
                     for sel in epoch_index_batches(idx, cfg.batch_size)])
                perm_dev = jnp.asarray(perm)
                self.state, key, acc = self._epoch_dd[mosaic_on](
                    self.state, dset_dev, perm_dev, key)
                nb = steps_per_epoch
                vals = jax.device_get(acc)
                for i, k in enumerate(("loss", "box", "cls", "dfl", "seg")):
                    ep[k] += float(vals[i])
            else:
                for data in prefetch(batch_iter(), depth=3):
                    key, sub = jax.random.split(key)
                    self.state, loss, parts = self._step[mosaic_on](
                        self.state, data, sub)
                    # pipelined fetch: materialise step k-1's scalars only
                    # after dispatching step k, so device compute overlaps
                    # host collate
                    got = pipe.push((loss, parts))
                    if got is not None:
                        _acc(got)
                    nb += 1
            for got in pipe.drain():
                _acc(got)

            self.epoch_times.append(time.time() - t0)
            for k in ep:
                self.history[k].append(ep[k] / max(nb, 1))
            self.history["lr"].append(float(self._lr_fn(self.state.step)))
            msg = (f"epoch {epoch + 1}/{cfg.epochs} "
                   + " ".join(f"{k}={ep[k] / max(nb, 1):.4f}" for k in ep)
                   + f" [{time.time() - t0:.1f}s, mosaic={mosaic_on}]")
            nf = self.notfinite_count()
            if nf:
                # surfaced so a stuck (permanently-NaN) run is detectable
                # before the 100-step apply-anyway failure fires
                msg += f" | WARN: {nf} consecutive non-finite steps skipped"
            if cfg.val_every and (epoch + 1) % cfg.val_every == 0:
                from .validator import validate_detector
                vm = validate_detector(
                    self.model, self.ema_variables(),
                    self.data_cfg.split_dir("val"), imgsz=cfg.imgsz,
                    channels=self.data_cfg.channels,
                    batch_size=cfg.batch_size,
                    max_inst=cfg.max_instances)
                self.history.setdefault("map50", []).append(vm["map50"])
                self.history.setdefault("map", []).append(vm["map"])
                msg += (f" | val mAP50={vm['map50']:.4f} "
                        f"mAP50-95={vm['map']:.4f}")
                # ultralytics fitness = 0.1*mAP50 + 0.9*mAP50-95; stage-1
                # keeps best.pt on fitness improvement (BaseTrainer.save_model)
                fitness = 0.1 * vm["map50"] + 0.9 * vm["map"]
                if fitness > best_fitness:
                    best_fitness = fitness
                    save_checkpoint(
                        os.path.join(run_dir, "weights", "best.ckpt"),
                        jax.device_get(self.state._asdict()))
            print(msg)
            save_checkpoint(os.path.join(run_dir, "weights", "last.ckpt"),
                            jax.device_get(self.state._asdict()))
        return self.history

    def notfinite_count(self) -> int:
        """Consecutive non-finite (skipped) optimizer steps — 0 when healthy.
        Works for both the flat-opt state and optax.apply_if_finite."""
        if self.state is None:
            return 0
        os_ = self.state.opt_state
        if self._flat is not None:
            return int(jax.device_get(os_.notfinite))
        if hasattr(os_, "notfinite_count"):
            return int(jax.device_get(os_.notfinite_count))
        return 0

    def load_resume(self, path: str) -> None:
        """Restore a checkpoint into this trainer, converting between the
        flat-vector (flat_opt=True) and tree-form optimizer formats when they
        differ — instead of the opaque flax structure-mismatch traceback a
        naive from_state_dict raises (r3 stored ema_params/momentum as flat
        f32 vectors; pre-r3 checkpoints store trees)."""
        from flax import serialization

        raw = load_checkpoint(path)          # raw nested state dict
        ck_flat = not isinstance(raw["ema_params"], dict)
        tr_flat = self._flat is not None
        if ck_flat == tr_flat:               # formats match: plain restore
            ck = load_checkpoint(path, jax.device_get(self.state._asdict()))
            self.state = DetTrainState(**ck)
            return
        host = jax.device_get(self.state)
        params = serialization.from_state_dict(host.params, raw["params"])
        bs = serialization.from_state_dict(host.batch_stats,
                                           raw["batch_stats"])
        step = jnp.asarray(np.asarray(raw["step"]), jnp.int32)
        if tr_flat:   # tree-form checkpoint -> flat trainer
            from .flat_opt import FlatOptState
            ema_tree = serialization.from_state_dict(host.params,
                                                     raw["ema_params"])
            ema = self._flat.ravel(ema_tree)
            opt = FlatOptState(count=step, mu=jnp.zeros_like(ema),
                               notfinite=jnp.zeros((), jnp.int32))
            print(f"resume: converted tree-form checkpoint {path!r} to the "
                  f"flat-opt format (momentum trace reinitialized; schedule "
                  f"clock restored from step={int(step)})")
        else:         # flat checkpoint -> tree-form trainer
            from jax.flatten_util import ravel_pytree
            _, unravel = ravel_pytree(host.params)
            ema_tree = unravel(jnp.asarray(np.asarray(raw["ema_params"]),
                                           jnp.float32))
            ema = jax.tree_util.tree_map(
                lambda e, p: e.astype(jnp.asarray(p).dtype), ema_tree,
                host.params)
            opt = self.tx.init(params)
            print(f"resume: converted flat-opt checkpoint {path!r} to the "
                  f"tree format (optimizer state reinitialized — warmup "
                  f"schedules restart; pass flat_opt=True to resume exactly)")
        self.state = DetTrainState(params=params, batch_stats=bs,
                                   ema_params=ema, opt_state=opt, step=step)

    def ema_variables(self) -> Dict:
        ema = self.state.ema_params
        if self._flat is not None:
            ema = self._flat.unravel(ema)
        return {"params": ema,
                "batch_stats": self.state.batch_stats}
