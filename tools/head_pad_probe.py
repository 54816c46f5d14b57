"""Detect/Segment head conv-shape probe: channel padding to lane width
(VERDICT r4 #8).

The fused eval head runs, per level (80²/40²/20², ch 64/128/256, b128):
  stage0  3x3  K=ch    -> N=96 (c2+c4; +64 proto at P3)
  stage1  3x3  K=96    -> N=96
  stage2  1x1  K=96    -> N=96
  cls     DW3x3 + 1x1 K=ch->64, DW3x3, 1x1 64->64, 1x1 64->1
HEAD bisect r3 put Detect at 5.1 ms vs ~2.5 SOL and blamed Mosaic tile
padding at 96/64-channel shapes. This probe measures whether BUILD-TIME
zero-padding of the K/N dims to 128 (exact math: zero weights emit zero
channels, consumers read only real channels) actually beats the compiler's
implicit padding — per stage, per level, and for the chained stack.

Writes HEAD_PAD.json. Run serialized on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/head_pad_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope(fn, args, iters=24):
    sumfn = jax.jit(
        lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))

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
    return max((tn - t1) / iters, 1e-9)


def conv(x, w, b=None, k=3, act=True):
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[None, None, None]
    if act:
        y = jax.nn.silu(y)
    return y.astype(x.dtype)


def dwconv(x, w, k=3):
    pad = k // 2
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32)
    return jax.nn.silu(y).astype(x.dtype)


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    B = 128
    levels = [(80, 64, True), (40, 128, False), (20, 256, False)]
    out = {}

    def W(*shape):
        return jnp.asarray(rng.normal(0, 0.05, shape).astype(np.float32))

    def bias(n):
        return jnp.asarray(rng.normal(0, 0.01, (n,)).astype(np.float32))

    # ---------------- box+coef stack (stages 0-2), baseline vs padded
    for s, ch, has_proto in levels:
        x = jnp.asarray(rng.normal(0, 0.5, (B, s, s, ch)).astype(np.float32)
                        ).astype(dt)
        n0 = 96 + (64 if has_proto else 0)     # c2+c4 (+proto npr entry)

        w0, b0 = W(3, 3, ch, n0), bias(n0)
        w1, b1 = W(3, 3, 96, 96), bias(96)
        w2, b2 = W(1, 1, 96, 96), bias(96)

        @jax.jit
        def base(x, w0=w0, b0=b0, w1=w1, b1=b1, w2=w2, b2=b2, n0=n0):
            y0 = conv(x, w0, b0, 3)
            y1 = conv(y0[..., :96], w1, b1, 3)
            y2 = conv(y1, w2, b2, 1, act=False)
            return y2, y0[..., 96:]

        # padded: stage0 emits 128 (+proto), stages 1-2 run 128->128; zero
        # weight columns/rows keep the math exact
        n0p = 128 + (64 if has_proto else 0)
        w0p = jnp.zeros((3, 3, ch, n0p), jnp.float32)
        w0p = w0p.at[..., :96].set(w0[..., :96])
        if has_proto:
            w0p = w0p.at[..., 128:].set(w0[..., 96:])
        b0p = jnp.zeros((n0p,), jnp.float32).at[:96].set(b0[:96])
        if has_proto:
            b0p = b0p.at[128:].set(b0[96:])
        w1p = jnp.zeros((3, 3, 128, 128), jnp.float32).at[:, :, :96, :96].set(w1)
        b1p = jnp.zeros((128,), jnp.float32).at[:96].set(b1)
        w2p = jnp.zeros((1, 1, 128, 96), jnp.float32).at[:, :, :96, :].set(w2)

        @jax.jit
        def padded(x, w0p=w0p, b0p=b0p, w1p=w1p, b1p=b1p, w2p=w2p, b2=b2):
            y0 = conv(x, w0p, b0p, 3)
            y1 = conv(y0[..., :128], w1p, b1p, 3)
            y2 = conv(y1, w2p, b2, 1, act=False)
            return y2, y0[..., 128:]

        tb = slope(base, (x,)) * 1e3
        tp = slope(padded, (x,)) * 1e3
        # parity spot check
        yb, yp = base(x)[0], padded(x)[0]
        err = float(jnp.max(jnp.abs(yb.astype(jnp.float32)
                                    - yp.astype(jnp.float32))))
        out[f"box_l{s}_base_ms"] = tb
        out[f"box_l{s}_pad128_ms"] = tp
        print(f"box@{s}² ch{ch}: base {tb:.3f} pad128 {tp:.3f} ms "
              f"(parity {err:.2e})", flush=True)
        assert err < 1e-2, err

    # ---------------- cls branch, baseline vs padded-to-128 mids
    for s, ch, _ in levels:
        x = jnp.asarray(rng.normal(0, 0.5, (B, s, s, ch)).astype(np.float32)
                        ).astype(dt)
        dw0 = W(3, 3, 1, ch)
        wa, ba = W(1, 1, ch, 64), bias(64)
        dw1 = W(3, 3, 1, 64)
        wb, bb = W(1, 1, 64, 64), bias(64)
        wc, bc = W(1, 1, 64, 1), bias(1)

        @jax.jit
        def cbase(x, dw0=dw0, wa=wa, ba=ba, dw1=dw1, wb=wb, bb=bb, wc=wc,
                  bc=bc):
            c = dwconv(x, dw0)
            c = conv(c, wa, ba, 1)
            c = dwconv(c, dw1)
            c = conv(c, wb, bb, 1)
            return conv(c, wc, bc, 1, act=False)

        wap = jnp.zeros((1, 1, ch, 128), jnp.float32).at[..., :64].set(wa)
        bap = jnp.zeros((128,), jnp.float32).at[:64].set(ba)
        dw1p = jnp.zeros((3, 3, 1, 128), jnp.float32).at[..., :64].set(dw1)
        wbp = jnp.zeros((1, 1, 128, 128), jnp.float32).at[:, :, :64, :64].set(wb)
        bbp = jnp.zeros((128,), jnp.float32).at[:64].set(bb)
        wcp = jnp.zeros((1, 1, 128, 1), jnp.float32).at[:, :, :64, :].set(wc)

        @jax.jit
        def cpad(x, dw0=dw0, wap=wap, bap=bap, dw1p=dw1p, wbp=wbp, bbp=bbp,
                 wcp=wcp, bc=bc):
            c = dwconv(x, dw0)
            c = conv(c, wap, bap, 1)
            c = dwconv(c, dw1p)
            c = conv(c, wbp, bbp, 1)
            return conv(c, wcp, bc, 1, act=False)

        tb = slope(cbase, (x,)) * 1e3
        tp = slope(cpad, (x,)) * 1e3
        err = float(jnp.max(jnp.abs(cbase(x).astype(jnp.float32)
                                    - cpad(x).astype(jnp.float32))))
        out[f"cls_l{s}_base_ms"] = tb
        out[f"cls_l{s}_pad128_ms"] = tp
        print(f"cls@{s}² ch{ch}: base {tb:.3f} pad128 {tp:.3f} ms "
              f"(parity {err:.2e})", flush=True)
        assert err < 1e-2, err

    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "HEAD_PAD.json"), "w") as f:
        json.dump({k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
