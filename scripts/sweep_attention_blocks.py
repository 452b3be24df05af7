"""Block-size sweep for the Pallas flash-attention forward kernel.

Same method as bench_attention.py (chained scan-in-jit, host scalar fetch,
best of N trials on the shared chip); sweeps (block_q, block_kv) to pick the
kernel defaults. Forward-only: the backward has its own blocks.

Usage: python scripts/sweep_attention_blocks.py [--seq 8192] [--iters 10]
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
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--configs", type=str,
                    default="512:1024,512:512,1024:512,1024:1024,256:1024,"
                            "2048:512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.kernels.flash_attention import _pallas_flash

    enable_compilation_cache()
    B, S, H, D = args.batch, args.seq, args.heads, args.dim
    flops_fwd = 2 * 2 * B * H * S * S * D / 2

    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q0 = jax.random.normal(kq, (B, H, S, D), jnp.bfloat16)
    k0 = jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
    v0 = jax.random.normal(kv, (B, H, S, D), jnp.bfloat16)

    results = {}
    for spec in args.configs.split(","):
        bq, bkv = (int(x) for x in spec.split(":"))

        def fn(q, k, v, n):
            def body(q, _):
                o = _pallas_flash(q, k, v, None, None, causal=True,
                                  scale=D ** -0.5, block_q=bq, block_kv=bkv)
                return q + o * 1e-6, ()
            q, _ = jax.lax.scan(body, q, jnp.arange(n))
            return q

        try:
            jfn = jax.jit(fn, static_argnums=(3,))
            float(jnp.ravel(jfn(q0, k0, v0, 2))[0])     # compile + warmup
            times = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                float(jnp.ravel(jfn(q0, k0, v0, args.iters))[0])
                times.append((time.perf_counter() - t0) / args.iters)
            tf = round(flops_fwd / min(times) / 1e12, 1)
        except Exception as e:                       # VMEM overflow etc.
            tf = f"FAIL: {type(e).__name__}"
        results[spec] = tf
        print(f"block_q:block_kv {spec:>10s} -> {tf}", file=sys.stderr)

    print(json.dumps({"metric": "flash_attention_fwd_block_sweep",
                      "shape": f"B{B} H{H} S{S} D{D} bf16 causal",
                      "tflops": results}))


if __name__ == "__main__":
    main()
