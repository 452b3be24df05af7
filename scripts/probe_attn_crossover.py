"""Find the Pallas-vs-XLA attention crossover on the real chip.

The flash kernel (kernels/flash_attention.py) wins on long sequences where
[S, S] f32 scores stop fitting in VMEM-friendly tiles; plain XLA attention
wins on short frame-local sequences (dispatch + blocking overhead dominates,
and scores are tiny). This probe times both paths per (S, D, causal) on a
chained scan-in-jit (CLAUDE.md harness) to pick the `worth_fusing`
threshold in flash_attention's dispatch.

Usage: python scripts/probe_attn_crossover.py [--iters 50]
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
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.kernels.flash_attention import flash_attention

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # (B, H, S, D, causal): Qwen ViT frames, CLIP frames, long encodes,
    # causal prefill
    cases = [
        (4, 16, 64, 80, False),
        (4, 16, 256, 80, False),
        (8, 16, 640, 64, False),      # CLIP 577-token frames padded
        (4, 16, 1024, 80, False),
        (2, 16, 2048, 80, False),
        (1, 32, 2048, 128, True),     # decoder prefill
        (1, 32, 4096, 128, True),
    ]
    results = {}
    for (B, H, S, D, causal) in cases:
        q = jnp.asarray(rng.normal(size=(2, B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(2, B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(2, B, H, S, D)), jnp.bfloat16)
        flops = 2 * 2 * B * H * S * S * D * (0.5 if causal else 1.0)

        for force_xla in (False, True):
            def loop(q, k, v):
                def body(acc, i):
                    out = flash_attention(
                        q[i % 2] + acc.astype(jnp.bfloat16), k[i % 2],
                        v[i % 2], causal=causal, force_xla=force_xla)
                    return out[0, 0, 0, 0].astype(jnp.float32), ()
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      jnp.arange(args.iters))
                return acc

            jloop = jax.jit(loop)
            float(jloop(q, k, v))
            dts = []
            for _ in range(args.trials):
                t0 = time.perf_counter()
                float(jloop(q, k, v))
                dts.append(time.perf_counter() - t0)
            dt = min(dts) / args.iters
            tag = f"B{B}xH{H}xS{S}xD{D}{'c' if causal else ''}"
            name = "xla" if force_xla else "pallas"
            results[f"{tag}:{name}"] = round(dt * 1e6, 1)
            print(f"{tag:24s} {name:6s} {dt * 1e6:9.1f} us "
                  f"{flops / dt / 1e12:6.1f} TF/s", file=sys.stderr,
                  flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
