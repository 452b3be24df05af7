"""Fused-attention kernel microbenchmark: forward and forward+backward
TFLOP/s on the real chip (kernels/flash_attention.py), compared against the
jax-shipped pallas kernel on identical shapes.

Method (hard-won, CLAUDE.md + round-3 calibration):
- CHAINED lax.scan inside ONE jit: each iteration's q depends on the
  previous output, so the runtime cannot dedupe or reorder, and per-iter
  cost amortizes the ~2 ms fixed program overhead.
- completion forced by a host scalar fetch (block_until_ready returns
  early through this tunnel).
- BEST of --trials trials: the chip is shared, and contention inflates
  identical code 2-10x between runs; the best trial is the closest
  measurement of the hardware, worst/best spread is reported as load noise.
- a calibration matmul ([8192x8192]@[8192x8192]) runs in the same process
  so kernel numbers can be read against what the chip actually sustained
  at measurement time rather than the paper peak.

Usage: python scripts/bench_attention.py [--seq 8192] [--heads 32] [--dim 128]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seq", type=int, default=8192)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=None)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.kernels.flash_attention import flash_attention

    enable_compilation_cache()
    B, S, H, D = args.batch, args.seq, args.heads, args.dim
    Hkv = args.kv_heads or H
    # causal attention FLOPs: 2 matmuls (QK^T, PV) over the lower triangle
    flops_fwd = 2 * 2 * B * H * S * S * D / 2
    flops_bwd = 2.5 * flops_fwd      # dq/dk/dv recompute-and-accumulate

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q0 = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k0 = jax.random.normal(kk, (B, Hkv, S, D), jnp.bfloat16)
    v0 = jax.random.normal(kv, (B, Hkv, S, D), jnp.bfloat16)

    def chain_fwd(attn):
        def fn(q, k, v, n):
            def body(q, _):
                o = attn(q, k, v)
                return q + o * 1e-6, ()      # chain: no dedupe, no reorder
            q, _ = jax.lax.scan(body, q, jnp.arange(n))
            return q
        return fn

    def chain_fwdbwd(attn):
        def fn(q, k, v, n):
            def loss(q, k, v):
                return jnp.sum(attn(q, k, v).astype(jnp.float32))

            def body(q, _):
                dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
                return q + dq * 1e-6, ()
            q, _ = jax.lax.scan(body, q, jnp.arange(n))
            return q
        return fn

    def best_tflops(fn, flops):
        jfn = jax.jit(fn, static_argnums=(3,))
        float(jnp.ravel(jfn(q0, k0, v0, 2))[0])   # compile + warmup
        times = []
        for _ in range(args.trials):
            t0 = time.perf_counter()
            float(jnp.ravel(jfn(q0, k0, v0, args.iters))[0])
            times.append((time.perf_counter() - t0) / args.iters)
        best, worst = min(times), max(times)
        return round(flops / best / 1e12, 1), round(flops / worst / 1e12, 1)

    def ours(q, k, v):
        return flash_attention(q, k, v, causal=True)

    results, spread = {}, {}
    results["fwd"], spread["fwd"] = best_tflops(chain_fwd(ours), flops_fwd)
    results["fwd+bwd"], spread["fwd+bwd"] = best_tflops(
        chain_fwdbwd(ours), flops_fwd + flops_bwd)

    # same shapes through the jax-shipped pallas kernel (MQA/GQA unsupported
    # there, so compare on the Hkv == H case only)
    ref = {}
    if Hkv == H:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash_attention)

        def theirs(q, k, v):
            return jax_flash_attention(q, k, v, causal=True)
        ref["fwd"], _ = best_tflops(chain_fwd(theirs), flops_fwd)
        ref["fwd+bwd"], _ = best_tflops(chain_fwdbwd(theirs),
                                        flops_fwd + flops_bwd)

    # calibration: what the chip sustains on a plain big matmul RIGHT NOW
    m = 8192
    a0 = jax.random.normal(kq, (m, m), jnp.bfloat16)
    w0 = jax.random.normal(kk, (m, m), jnp.bfloat16) * 0.01

    def mm(a, w, n):
        def body(a, _):
            return jnp.dot(a, w) * 0.01, ()
        a, _ = jax.lax.scan(body, a, jnp.arange(n))
        return a
    jmm = jax.jit(mm, static_argnums=(2,))
    float(jnp.ravel(jmm(a0, w0, 2))[0])
    mmt = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        float(jnp.ravel(jmm(a0, w0, args.iters))[0])
        mmt.append((time.perf_counter() - t0) / args.iters)
    calib = round(2 * m ** 3 / min(mmt) / 1e12, 1)

    print(json.dumps({
        "metric": "flash_attention_tflops",
        "shape": f"B{B} H{H}/{Hkv} S{S} D{D} bf16 causal",
        "fwd_tflops": results["fwd"],
        "fwd_bwd_tflops": results["fwd+bwd"],
        "fwd_tflops_under_load": spread["fwd"],
        "jax_ref_fwd_tflops": ref.get("fwd"),
        "jax_ref_fwd_bwd_tflops": ref.get("fwd+bwd"),
        "matmul_calibration_tflops": calib,
        "method": ("chained scan-in-jit, host scalar fetch, best of "
                   f"{args.trials} trials (shared chip)"),
    }))


if __name__ == "__main__":
    main()
