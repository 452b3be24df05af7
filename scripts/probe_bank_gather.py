"""Probe: DAM frame gather (spa_x = bank[idx]) strategies on the real chip.

The XLA gather of 30 full-res frames ([1024, 256, 1280] bank) measured
3.36 ms f32 — 11.6 GB/s effective, ~70x off the HBM roofline for a 39 MB
read. Candidates:
  xla       bank[idx] as-is
  onehot    one_hot(idx) @ bank.reshape(T, -1) — reads the WHOLE bank but
            rides the MXU pipeline
  pallas    scalar-prefetch grid: idx lives in SMEM, each grid step DMAs
            bank row idx[i] HBM->VMEM->out (the TPU-native dynamic gather)

Usage: python scripts/probe_bank_gather.py [--t 1024] [--k 30]
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=1024)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--p", type=int, default=256)
    ap.add_argument("--d", type=int, default=1280)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    enable_compilation_cache()

    T, K, P, D = args.t, args.k, args.p, args.d
    dtype = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    bank = jnp.asarray(rng.normal(size=(T, P, D)), dtype)
    nbytes = K * P * D * dtype.itemsize

    def timed(fn, tag):
        def loop(bank):
            def body(acc, i):
                idx = (jnp.arange(K) * 7 + i) % T      # fresh indices per iter
                out = fn(bank, idx)
                return acc + jnp.ravel(out)[0].astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(args.iters))
            return acc
        j = jax.jit(loop)
        try:
            float(j(bank))
        except Exception as e:
            print(f"{tag:10s} FAILED: {str(e).splitlines()[0][:120]}")
            return
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(j(bank))
            best = min(best, time.perf_counter() - t0)
        dt = best / args.iters
        print(f"{tag:10s} {dt * 1e3:7.3f} ms   {nbytes / dt / 1e9:7.1f} GB/s "
              f"gathered ({nbytes / 1e6:.1f} MB)")

    timed(lambda b, i: b[i], "xla")

    def onehot(b, i):
        oh = jax.nn.one_hot(i, T, dtype=b.dtype)
        return jnp.dot(oh, b.reshape(T, P * D),
                       preferred_element_type=jnp.float32
                       ).astype(b.dtype).reshape(K, P, D)
    timed(onehot, "onehot")

    def gather_kernel(idx_ref, bank_ref, out_ref):
        out_ref[...] = bank_ref[...]

    def pallas_gather(b, i):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(K,),
            in_specs=[pl.BlockSpec((1, P, D), lambda g, idx: (idx[g], 0, 0))],
            out_specs=pl.BlockSpec((1, P, D), lambda g, idx: (g, 0, 0)),
        )
        return pl.pallas_call(
            gather_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, P, D), b.dtype),
        )(i.astype(jnp.int32), b)
    timed(pallas_gather, "pallas")


if __name__ == "__main__":
    main()
