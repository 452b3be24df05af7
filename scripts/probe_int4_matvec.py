"""Probe: decode-matvec HBM bandwidth by weight format (bf16 / int8 /
native-int4 / packed-uint8-int4), at Qwen2-VL-7B decode shapes.

Decode is weight-HBM-read bound, so the metric is effective GB/s of *stored*
weight bytes. Methodology per CLAUDE.md: chained lax.scan inside ONE jit
(iteration i consumes iteration i-1's output), completion forced by a host
scalar fetch, best of N trials on the shared chip.

Usage: python scripts/probe_int4_matvec.py [--trials 4] [--iters 50]
"""
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache


def bench_one(name, make_w, matvec, din, dout, iters, trials, layers=16):
    """Time chained matvecs through `layers` STACKED weights (scan over the
    leading layer axis, like the decoder's scan-over-layers), repeated
    `iters` times — each weight is read from HBM once per pass."""
    keys = jax.random.split(jax.random.PRNGKey(0), layers)
    w = jax.tree.map(lambda *xs: jnp.stack(xs), *[make_w(k) for k in keys])
    x0 = jnp.ones((1, din), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def pass_once(x, _):
            def step(x, wl):
                y = matvec(x, wl)              # [1, dout]
                # fold back to [1, din]: the chain carries a data dependency
                xn = (x + y[:, :din] * 1e-6).astype(jnp.bfloat16)
                return xn, ()
            x, _ = jax.lax.scan(step, x, w)
            return x, ()
        out, _ = jax.lax.scan(pass_once, x, None, length=iters)
        return jnp.sum(out)

    float(run(x0, w))                          # compile + first run
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(run(x0, w))
        best = min(best, time.perf_counter() - t0)
    stored = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree.leaves(w))
    n_mv = iters * layers
    gbs = stored * iters / best / 1e9
    ms = best / n_mv * 1e3
    print(f"{name:28s} {ms:7.3f} ms/matvec   {gbs:7.1f} GB/s stored-weight "
          f"({stored / 1e6:.1f} MB stacked x{layers})")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--din", type=int, default=3584)
    ap.add_argument("--dout", type=int, default=18944)
    args = ap.parse_args()
    enable_compilation_cache()
    din, dout = args.din, args.dout
    it, tr = args.iters, args.trials

    print(f"matvec [1,{din}] @ [{din},{dout}] on {jax.devices()[0]}")

    # bf16 dense
    bench_one("bf16", lambda k: jax.random.normal(k, (din, dout), jnp.bfloat16),
              lambda x, w: jnp.dot(x, w), din, dout, it, tr)

    # int8 weight-only (QuantWeight path)
    def mk8(k):
        q = jax.random.randint(k, (din, dout), -127, 127, jnp.int8)
        s = jnp.ones((1, dout), jnp.float32)
        return (q, s)
    bench_one("int8 convert-in-feed", mk8,
              lambda x, w: jnp.dot(x, w[0].astype(x.dtype)) * w[1].astype(x.dtype),
              din, dout, it, tr)

    # NOTE: XLA-native jnp.int4 arrays cannot cross a jit boundary on this
    # backend (device_put/relayout of S4 args hits UNIMPLEMENTED + a
    # RecursionError in jax 0.9) — int4 params must be stored packed in
    # uint8 and unpacked in-kernel.
    nb = din // 128

    # packed uint8 nibbles (current QuantWeight4 dequant path)
    def mkp(k):
        q = jax.random.randint(k, (din // 2, dout), 0, 255, jnp.int32
                               ).astype(jnp.uint8)
        s = jnp.ones((nb, dout), jnp.float32)
        return (q, s)
    def mvp(x, w):
        from flash_vstream_tpu.weights.quantize import (
            QuantWeight4, dequantize_weight4)
        return jnp.dot(x, dequantize_weight4(QuantWeight4(w[0], w[1]), x.dtype))
    bench_one("uint8-packed dequant (QW4)", mkp, mvp, din, dout, it, tr)

    # Pallas kernel: packed-byte HBM read, in-VMEM unpack + block scale
    from flash_vstream_tpu.kernels.int4_matmul import int4_matmul
    bench_one("uint8-packed PALLAS kernel", mkp,
              lambda x, w: int4_matmul(x, w[0], w[1], out_dtype=x.dtype),
              din, dout, it, tr)


if __name__ == "__main__":
    main()
