"""Tunnel upload-shape probe (round 4, host-gap follow-up).

HOST_GAP.json: collate 0.53 ms but collate+4x jnp.asarray = 117.5 ms for a
~4.2 MB b32/160 batch — each host->device transfer through the axon tunnel
pays a full ~29 ms round-trip regardless of size. Measures:

  up4          the current shape: 4 separate jnp.asarray uploads
  up1_packed   ONE packed uint8 buffer of the same total bytes
  up1_large    one 16.8 MB buffer (4x) — per-byte vs per-call cost split
  up1_x2/x4    packed uploads issued from 2/4 threads concurrently --
               do tunnel RTTs overlap across threads?
  device_put_tuple  jax.device_put of the 4-tuple in one call

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/upload_probe.py
"""
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = {}


def bench(name, fn, iters=12, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    ms = (time.perf_counter() - t0) / iters * 1e3
    OUT[name] = round(ms, 2)
    print(f"[upload] {name}: {ms:.2f} ms", flush=True)


def main():
    b, H, mi = 32, 160, 8
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (b, H, H, 4), dtype=np.uint8)
    idmap = rng.integers(0, 8, (b, H, H), dtype=np.uint8)
    cls = np.zeros((b, mi), np.int32)
    valid = np.zeros((b, mi), bool)
    packed = np.concatenate([img.reshape(-1), idmap.reshape(-1),
                             cls.astype(np.uint8).reshape(-1),
                             valid.astype(np.uint8).reshape(-1)])
    print(f"packed bytes: {packed.nbytes/1e6:.2f} MB", flush=True)
    big = np.concatenate([packed] * 4)

    def up4():
        a = tuple(jnp.asarray(x) for x in (img, idmap, cls, valid))
        jax.block_until_ready(a)

    def up1():
        jax.block_until_ready(jnp.asarray(packed))

    def up1_large():
        jax.block_until_ready(jnp.asarray(big))

    def dpt():
        jax.block_until_ready(jax.device_put((img, idmap, cls, valid)))

    def upN(n):
        def one():
            jax.block_until_ready(jnp.asarray(packed + 0))  # fresh buffer
        ts = [threading.Thread(target=one) for _ in range(n)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return (time.perf_counter() - t0) * 1e3

    bench("up4", up4)
    bench("up1_packed", up1)
    bench("up1_large_16mb", up1_large)
    bench("device_put_tuple", dpt)

    # --- TRUE upload cost: block_until_ready on an uploaded array does NOT
    # flush the tunnel transfer (the 3.45 ms up1_packed above is enqueue
    # time); the bytes ride the first USE. Force materialization with a
    # jitted reduction + scalar fetch, and subtract the same reduction on a
    # device-resident buffer (compute + RTT baseline).
    s = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    for name, buf in (("4mb", packed), ("16mb", big), ("1mb", packed[:2**20])):
        res = jnp.asarray(buf)
        int(s(res))  # compile + settle
        t0 = time.perf_counter()
        for _ in range(8):
            int(s(res))
        base = (time.perf_counter() - t0) / 8 * 1e3
        t0 = time.perf_counter()
        for _ in range(8):
            int(s(jnp.asarray(buf)))
        tot = (time.perf_counter() - t0) / 8 * 1e3
        OUT[f"true_upload_{name}_ms"] = round(tot - base, 2)
        OUT[f"use_resident_{name}_ms"] = round(base, 2)
        print(f"[upload] true_upload_{name}: {tot - base:.2f} ms "
              f"(resident baseline {base:.2f})", flush=True)

    # --- does an upload overlap device compute? dispatch a chunky jitted
    # loop (no host dep), then upload+use concurrently from this thread.
    w = jnp.asarray(rng.standard_normal((2048, 2048)), jnp.bfloat16)
    mm = jax.jit(lambda a: jax.lax.fori_loop(
        0, 64, lambda i, x: x @ x * (1 / 45.0), a))
    float(mm(w).sum())  # compile
    t0 = time.perf_counter()
    float(mm(w).sum())
    mm_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    out = mm(w)                      # in flight on device
    up = int(s(jnp.asarray(packed)))  # upload + use while mm runs
    float(out.sum())
    both_ms = (time.perf_counter() - t0) * 1e3
    OUT["mm_alone_ms"] = round(mm_ms, 2)
    OUT["mm_plus_upload_ms"] = round(both_ms, 2)
    print(f"[upload] overlap: mm {mm_ms:.1f} ms, mm+upload {both_ms:.1f} ms",
          flush=True)
    for n in (2, 4):
        upN(n)
        vals = [upN(n) for _ in range(6)]
        OUT[f"up1_x{n}_threads_total"] = round(min(vals), 2)
        print(f"[upload] up1_x{n}_threads_total: {min(vals):.2f} ms "
              f"({min(vals)/n:.1f} ms/upload)", flush=True)

    with open("/root/repo/UPLOAD_PROBE.json", "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
