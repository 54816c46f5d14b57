"""Probe: HEAD internals at b128/640 — per-op times for the Detect cv2/cv3
chains, Proto stages, and cv4, plus s2d(2)-packed alternatives for the
lane-starved low-channel convs (C=32/64 on 128-lane v5e).

Also checks whether XLA DCEs the Proto branch when `protos` is not returned
(bench honesty: the headline must pay for every claimed output).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def slope(fn, args, iters=24, warmup=3):
    sumfn = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9)


def conv(x, w, s=1, g=1):
    p = (w.shape[0] // 2,) * 2
    return jax.lax.conv_general_dilated(
        x, w, (s, s), (p, p), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g, preferred_element_type=jnp.float32
    ).astype(x.dtype)


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(0, 1, s).astype(np.float32)).astype(dt)
    B = 128

    # ---- Detect per-op (P3 80x80 c64, P4 40x40 c128, P5 20x20 c256)
    print("== Detect / cv4 per-op ==", flush=True)
    for name, hw, cin in (("P3", 80, 64), ("P4", 40, 128), ("P5", 20, 256)):
        x = mk(B, hw, hw, cin)
        cases = {
            "cv2_0 3x3->64": lambda x=x, w=mk(3, 3, cin, 64): conv(x, w),
            "cv2_1 3x3 64->64": lambda x=mk(B, hw, hw, 64), w=mk(3, 3, 64, 64): conv(x, w),
            "cv2_2 1x1 64->64": lambda x=mk(B, hw, hw, 64), w=mk(1, 1, 64, 64): conv(x, w),
            "cv3 dw3x3 c%d" % cin: lambda x=x, w=mk(3, 3, 1, cin): conv(x, w, g=cin),
            "cv3 1x1 %d->64" % cin: lambda x=x, w=mk(1, 1, cin, 64): conv(x, w),
            "cv3 dw3x3 c64": lambda x=mk(B, hw, hw, 64), w=mk(3, 3, 1, 64): conv(x, w, g=64),
            "cv3 1x1 64->1": lambda x=mk(B, hw, hw, 64), w=mk(1, 1, 64, 1): conv(x, w),
            "cv4_0 3x3->32": lambda x=x, w=mk(3, 3, cin, 32): conv(x, w),
            "cv4_1 3x3 32->32": lambda x=mk(B, hw, hw, 32), w=mk(3, 3, 32, 32): conv(x, w),
            "merged cv2_0+cv4_0 3x3->96": lambda x=x, w=mk(3, 3, cin, 96): conv(x, w),
        }
        for cname, f in cases.items():
            jf = jax.jit(f)
            t = slope(jf, ())
            print(f"  {name} {cname:<26} {t*1e3:7.3f} ms", flush=True)

    # ---- Proto stages (in 80x80x64 -> cv1 3x3->32? actually npr=256*0.25=64?)
    # v12n seg: npr=256 -> c_ = npr*w = 64 for n? Proto(c_, nm=32):
    # cv1 3x3 64->c_, convT 2x2 s2 c_->c_, cv2 3x3 c_->c_, cv3 1x1 c_->32
    print("== Proto stages (c_=64 assumed; also c_=32 variant) ==", flush=True)
    for c_ in (32, 64):
        x80 = mk(B, 80, 80, c_)
        x160 = mk(B, 160, 160, c_)
        wT = mk(2, 2, c_, c_)

        def convT(x=x80, w=wT):
            return jax.lax.conv_transpose(
                x, w, (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dt)

        cases = {
            "cv1 3x3 64->c_@80": lambda x=mk(B, 80, 80, 64), w=mk(3, 3, 64, c_): conv(x, w),
            "convT 2x2 s2 @80": convT,
            "convT-as-1x1 (s2d out)": lambda x=x80, w=mk(1, 1, c_, 4 * c_): conv(x, w),
            "cv2 3x3 @160": lambda x=x160, w=mk(3, 3, c_, c_): conv(x, w),
            "cv2 3x3 s2d-packed @80": lambda x=mk(B, 80, 80, 4 * c_),
                w=mk(2, 2, 4 * c_, 4 * c_): conv(x, w),
            "cv3 1x1 c_->32 @160": lambda x=x160, w=mk(1, 1, c_, 32): conv(x, w),
            "cv3 1x1 grouped s2d @80": lambda x=mk(B, 80, 80, 4 * c_),
                w=mk(1, 1, c_, 4 * 32): conv(x, w, g=4),
        }
        for cname, f in cases.items():
            jf = jax.jit(f)
            t = slope(jf, ())
            print(f"  c_={c_} {cname:<26} {t*1e3:7.3f} ms", flush=True)

    # ---- DCE check: full model with vs without protos in the return
    print("== bench DCE check ==", flush=True)
    from yolou_tpu.models.yolo import build_yolo
    from yolou_tpu.ops.nms import non_max_suppression

    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                       dtype=dt, use_pallas=True, stem_s2d=True)
    init_model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment", dtype=dt)
    variables = jax.jit(lambda k, x: init_model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 640, 640, 4)))
    imgs = jnp.asarray(rng.integers(0, 255, (B, 160, 160, 64), dtype=np.uint8))

    def run(with_protos):
        def fn(v, u8):
            x = (u8.astype(jnp.float32) / 255.0).astype(dt)
            out = model.apply(v, x, train=False)
            dets = non_max_suppression(out.preds.astype(jnp.float32),
                                       conf_thres=0.25, iou_thres=0.45,
                                       max_det=300, nc=1)
            if with_protos:
                return dets.boxes, dets.conf, dets.valid, out.protos
            return dets.boxes, dets.conf, dets.valid
        return slope(jax.jit(fn), (variables, imgs), iters=12)

    t0 = run(False)
    t1 = run(True)
    print(f"  no-protos {t0*1e3:7.2f} ms   with-protos {t1*1e3:7.2f} ms "
          f"(delta {1e3*(t1-t0):+.2f})", flush=True)


if __name__ == "__main__":
    main()
