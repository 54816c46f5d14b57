"""ABlock kernel layout-transition probe (VERDICT r4 #8b).

l6_bisect attributed ~0.55 ms/ABlock (8 blocks ≈ 4 ms of the b128/640
forward) to layout transitions around the Pallas attention kernel: the
NHWC conv output (B, H, W, C) — W-sublane-tiled with padding 40->48 — is
reshaped to band tokens (B*area, N/area, C) whose 400-token sublane dim
packs differently, forcing a physical relayout on kernel entry and exit.

Variants measured here (L6 shape: B=128, 40x40, C=128 after cv1 splits to
c_=64? — we use the ATTENTION-load shape (512, 400, 64)-equivalent with
C=64 and heads=2, plus the L8 20x20 case):

  A xla_reshape_roundtrip — cost of JUST (B,H,W,C)->(B*a,N,C)->(B,H,W,C)
                            (an add on each side pins both layouts)
  B kernel_current        — qkv-fused kernel with external reshapes (the
                            shipping composition, nn/attention.py:61-69)
  C kernel_nhwc           — same kernel but pallas_call reads the NHWC
                            tensor via a 4D BlockSpec and collapses
                            (rows, W) -> N inside the kernel; emits NHWC
  D kernel_notrans        — kernel fed (G, N, C) directly with no
                            surrounding reshapes (floor: kernel alone)

Writes ATTN_LAYOUT.json. Run serialized on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_layout_probe.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from yolou_tpu.ops.pallas_attn import (_fused_band_block, _qkv_attn_kernel,
                                       area_attention_qkv_fused)


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


def qkv_attn_nhwc(x, w, b, heads, area):
    """NHWC-in/NHWC-out variant: the band split rides the BlockSpec index
    map ((b, a) grid cell -> rows [a*rows_per_band, ...]) and the
    (rows, W) -> N collapse happens on the VMEM tile inside the kernel, so
    XLA never materializes a re-tiled (G, N, C) tensor in HBM."""
    B, H, W, C = x.shape
    rows = H // area
    n = rows * W
    scale = (C // heads) ** -0.5

    def kern(x_ref, w_ref, b_ref, o_ref, v_ref):
        # same math as ops/pallas_attn.py::_qkv_attn_kernel, with the band
        # collapse/expand on the VMEM tile
        xb = x_ref[:].reshape(1, n, C)          # (1, rows, W, C) -> (1, N, C)
        qkv = jax.lax.dot_general(
            xb, w_ref[:], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[:][None]
        qkv = qkv.astype(xb.dtype)
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        hd = C // heads
        ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 2) // hd
        hh = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, C), 0)
        mask = (ch == hh).astype(q.dtype)
        qm = (q[:, None] * mask[None]).reshape(heads, n, C)
        km = jnp.broadcast_to(k[:, None], (1, heads, n, C)).reshape(
            heads, n, C)
        s = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e.astype(v.dtype)
        vm = (v[:, None] * mask[None]).reshape(heads, n, C)
        o_part = jax.lax.dot_general(
            p, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = jnp.sum((o_part / denom).reshape(1, heads, n, C), axis=1)
        o_ref[:] = o.astype(o_ref.dtype).reshape(1, rows, W, C)
        v_ref[:] = v.reshape(1, rows, W, C)

    block = pl.BlockSpec((1, rows, W, C), lambda i, j: (i, j, 0, 0))
    wspec = pl.BlockSpec((C, 3 * C), lambda i, j: (0, 0))
    bspec = pl.BlockSpec((1, 3 * C), lambda i, j: (0, 0))
    o, v = pl.pallas_call(
        kern,
        grid=(B, area),
        in_specs=[block, wspec, bspec],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(x.shape, x.dtype)),
    )(x, w, b)
    return o, v


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    out = {}
    for tag, (B, HW, C, heads, area) in {
            "l6": (128, 40, 64, 2, 4),
            "l8": (128, 20, 64, 2, 1)}.items():
        x = jnp.asarray(rng.normal(0, 0.5, (B, HW, HW, C)).astype(np.float32)
                        ).astype(dt)
        w = jnp.asarray(rng.normal(0, 0.1, (C, 3 * C)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.01, (1, 3 * C)).astype(np.float32))
        n = HW * HW
        nb = n // area

        # A: reshape roundtrip only (adds pin the layouts on both sides)
        @jax.jit
        def rtrip(x):
            t = (x + 1).reshape(B * area, nb, C)
            t = t + 1
            return t.reshape(B, HW, HW, C) + 1

        @jax.jit
        def rtrip_base(x):
            return ((x + 1) + 1) + 1        # same adds, no reshapes

        ta = slope(rtrip, (x,)) * 1e3
        ta0 = slope(rtrip_base, (x,)) * 1e3
        out[f"{tag}_A_reshape_roundtrip_ms"] = ta - ta0
        print(f"{tag} A reshape roundtrip: {ta - ta0:.3f} ms "
              f"({ta:.3f} - {ta0:.3f})", flush=True)

        # B: shipping composition (external reshapes around the kernel)
        @jax.jit
        def cur(x, w, b):
            xt = x.reshape(B * area, nb, C)
            o, v = area_attention_qkv_fused(xt, w.astype(dt), b, heads)
            return (o.reshape(B, HW, HW, C) + x,
                    v.reshape(B, HW, HW, C) + x)   # adds pin NHWC use

        tb = slope(cur, (x, w, b)) * 1e3
        out[f"{tag}_B_kernel_current_ms"] = tb
        print(f"{tag} B kernel+external reshapes: {tb:.3f} ms", flush=True)

        # C: NHWC-in/out kernel (in-kernel collapse)
        try:
            f_nhwc = jax.jit(functools.partial(qkv_attn_nhwc, heads=heads,
                                               area=area))

            @jax.jit
            def nhwc(x, w, b):
                o, v = f_nhwc(x, w.astype(dt), b)
                return o + x, v + x

            # parity vs the shipping composition
            (ob, vb) = cur(x, w, b)
            (oc, vc) = nhwc(x, w, b)
            err = float(jnp.max(jnp.abs(ob.astype(jnp.float32)
                                        - oc.astype(jnp.float32))))
            tc = slope(nhwc, (x, w, b)) * 1e3
            out[f"{tag}_C_kernel_nhwc_ms"] = tc
            out[f"{tag}_C_parity"] = err
            print(f"{tag} C NHWC-in/out kernel: {tc:.3f} ms "
                  f"(parity {err:.2e})", flush=True)
        except Exception as e:
            out[f"{tag}_C_error"] = str(e)[:300]
            print(f"{tag} C failed: {str(e)[:200]}", flush=True)

        # D: kernel alone on pre-banded tokens (floor)
        xt = jnp.asarray(x.reshape(B * area, nb, C))

        @jax.jit
        def floor(xt, w, b):
            return area_attention_qkv_fused(xt, w.astype(dt), b, heads)

        td = slope(floor, (xt, w, b)) * 1e3
        out[f"{tag}_D_kernel_floor_ms"] = td
        print(f"{tag} D kernel floor: {td:.3f} ms", flush=True)

    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "ATTN_LAYOUT.json"), "w") as f:
        json.dump({k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
