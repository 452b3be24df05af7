"""Fused-attention kernel microbenchmark: forward and forward+backward
TFLOP/s on the real chip (kernels/flash_attention.py).

Times with a lax.scan of many iterations inside ONE jit (fresh inputs per
iteration via key folding) — host-side per-dispatch timing lies behind the
~40 ms tunnel latency (CLAUDE.md).

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
    ap.add_argument("--iters", type=int, default=20)
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

    key = __import__("jax").random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q0 = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k0 = jax.random.normal(kk, (B, Hkv, S, D), jnp.bfloat16)
    v0 = jax.random.normal(kv, (B, Hkv, S, D), jnp.bfloat16)

    # fresh-but-cheap inputs per iteration (an O(1)-ish scalar perturbation
    # defeats the runtime's duplicate-dispatch dedup without paying full RNG
    # regeneration inside the timed loop)
    def fwd_many(q0, k0, v0, n):
        def body(i, _):
            s = (1.0 + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            out = flash_attention(q0 * s, k0, v0, causal=True)
            return i + 1, jnp.sum(out.astype(jnp.float32))
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return jnp.sum(sums)

    def fwdbwd_many(q0, k0, v0, n):
        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True)
                           .astype(jnp.float32))

        def body(i, _):
            s = (1.0 + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            g = jax.grad(loss, argnums=(0, 1, 2))(q0 * s, k0, v0)
            return i + 1, sum(jnp.sum(x.astype(jnp.float32)) for x in g)
        _, sums = jax.lax.scan(body, jnp.int32(0), None, length=n)
        return jnp.sum(sums)

    def time_tflops(fn, flops):
        jfn = jax.jit(fn, static_argnums=(3,))
        float(jfn(q0, k0, v0, 2))   # compile; fetch forces completion
        t0 = time.perf_counter()
        # timing sync is a HOST FETCH of the scan's scalar sum — through the
        # tunnel block_until_ready returns before the device finishes
        float(jfn(q0, k0, v0, args.iters))
        dt = time.perf_counter() - t0
        return round(flops * args.iters / dt / 1e12, 1)

    results = {}
    for name, fn, flops in (("fwd", fwd_many, flops_fwd),
                            ("fwd+bwd", fwdbwd_many, flops_fwd + flops_bwd)):
        results[name] = time_tflops(fn, flops)

    # same shapes through the jax-shipped pallas kernel (MQA/GQA unsupported
    # there, so compare on the Hkv == H case only)
    ref = {}
    if Hkv == H:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash_attention)

        def ref_fwd_many(q0, k0, v0, n):
            def body(i, _):
                s = (1.0 + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                out = jax_flash_attention(q0 * s, k0, v0, causal=True)
                return i + 1, jnp.sum(out.astype(jnp.float32))
            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return jnp.sum(sums)

        def ref_fwdbwd_many(q0, k0, v0, n):
            def loss(q, k, v):
                return jnp.sum(jax_flash_attention(q, k, v, causal=True)
                               .astype(jnp.float32))

            def body(i, _):
                s = (1.0 + i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
                g = jax.grad(loss, argnums=(0, 1, 2))(q0 * s, k0, v0)
                return i + 1, sum(jnp.sum(x.astype(jnp.float32)) for x in g)
            _, sums = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return jnp.sum(sums)

        ref["fwd"] = time_tflops(ref_fwd_many, flops_fwd)
        ref["fwd+bwd"] = time_tflops(ref_fwdbwd_many, flops_fwd + flops_bwd)

    print(json.dumps({
        "metric": "flash_attention_tflops",
        "shape": f"B{B} H{H}/{Hkv} S{S} D{D} bf16 causal",
        "fwd_tflops": results["fwd"],
        "fwd_bwd_tflops": results["fwd+bwd"],
        "jax_ref_fwd_tflops": ref.get("fwd"),
        "jax_ref_fwd_bwd_tflops": ref.get("fwd+bwd"),
        "method": "scan-in-jit, host scalar fetch",
    }))


if __name__ == "__main__":
    main()
