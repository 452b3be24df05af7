"""Decode-shape matvec roofline probe: int8 QuantWeight vs bf16 weights.

Decode latency at 7B is bound by weight HBM reads. This times x[8,D] @ W for
the Qwen2-7B decoder shapes with (a) bf16 weights, (b) int8 QuantWeight
through layers.dense (XLA fuses — or fails to fuse — the dequant into the
operand feed), and reports achieved GB/s against the v5e ~819 GB/s roofline.
A large int8-vs-bf16 gap below 2x means the dequant materializes a bf16 copy
and a fused Pallas path is needed.

Method per CLAUDE.md: lax.scan inside one jit, host scalar fetch at the end.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--rows", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.models.layers import dense
    from flash_vstream_tpu.weights.quantize import quantize_weight

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # Qwen2-7B decoder matvec shapes (hidden 3584, mlp 18944)
    SHAPES = [("qkvo", 3584, 3584 + 2 * 512 + 3584),
              ("gate_up", 3584, 2 * 18944),
              ("down", 18944, 3584)]

    def timed(fn, xs, w, iters, tag, bytes_per_iter):
        def loop(xs, w):
            def body(acc, i):
                out = fn(xs[i % xs.shape[0]], w)
                return acc + jnp.ravel(out)[0].astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
            return acc
        jl = jax.jit(loop)
        float(jl(xs, w))
        t0 = time.perf_counter()
        float(jl(xs, w))
        dt = (time.perf_counter() - t0) / iters
        gbs = bytes_per_iter / dt / 1e9
        print(f"{tag:28s} {dt * 1e6:9.1f} us  {gbs:6.0f} GB/s",
              file=sys.stderr)
        return dt, gbs

    results = {}
    for name, din, dout in SHAPES:
        w16 = jnp.asarray(rng.normal(size=(din, dout)) * 0.02, jnp.bfloat16)
        wq = quantize_weight(w16)
        xs = jnp.asarray(rng.normal(size=(4, args.rows, din)), jnp.bfloat16)
        dt16, g16 = timed(lambda x, w: dense(x, w), xs, w16, args.iters,
                          f"{name} bf16 [{din}x{dout}]", 2 * din * dout)
        dt8, g8 = timed(lambda x, w: dense(x, w), xs, wq, args.iters,
                        f"{name} int8 [{din}x{dout}]", din * dout)
        results[name] = {"bf16_us": round(dt16 * 1e6, 1),
                         "int8_us": round(dt8 * 1e6, 1),
                         "bf16_gbs": round(g16), "int8_gbs": round(g8),
                         "speedup": round(dt16 / dt8, 2)}
    print(json.dumps({"metric": "int8_matvec", **results}))


if __name__ == "__main__":
    main()
