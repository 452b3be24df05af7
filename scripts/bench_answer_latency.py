"""7B answer-latency microbenchmark (BASELINE.md: p50 < 1 s at 7B).

Measures the serving-path answer latency on ONE chip: prefill of a
memory-augmented prompt (default 1024 tokens) + fused greedy decode loop
(default 64 tokens) on a Vicuna-7B-shaped decoder with weight-only int8
(weights/quantize.py) and a tightly-bucketed KV cache.

Weights are random-init directly in int8 (no bf16 intermediate: a 7B bf16
tree would not co-reside with its int8 copy in 16 GB HBM); latency is
shape/dtype-determined, not value-determined.

Usage: python scripts/bench_answer_latency.py [--prefill 1024] [--decode 64]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_int8_7b(cfg, key, dtype, bits: int = 8):
    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.weights.quantize import QuantWeight, QuantWeight4

    D, I, Dh = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    Hq, Hkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers
    keys = iter(jax.random.split(key, 16))

    def qw(din, dout, bias):
        if bits == 4:
            # QLoRA base precision: packed int4, block-128 input scales
            nb = max(din // 128, 1)
            q4 = jax.jit(lambda k: jax.random.randint(
                k, (L, din // 2, dout), 0, 256, jnp.uint8))(next(keys))
            scale = jnp.full((L, nb, dout), 1.0 / (7.0 * np.sqrt(din)),
                             jnp.float32)
            p = {"w": QuantWeight4(q4, scale)}
        else:
            q = jax.jit(lambda k: jax.random.randint(
                k, (L, din, dout), -127, 128, jnp.int8))(next(keys))
            scale = jnp.full((L, 1, dout), 1.0 / (127.0 * np.sqrt(din)),
                             jnp.float32)
            p = {"w": QuantWeight(q, scale)}
        if bias:
            p["b"] = jnp.zeros((L, dout), dtype)
        return p

    params = {
        "embed": jax.jit(lambda k: jax.random.normal(
            k, (cfg.vocab_size, D), dtype) * 0.02)(next(keys)),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "attn": {
                "wq": qw(D, Hq * Dh, cfg.attention_bias),
                "wk": qw(D, Hkv * Dh, cfg.attention_bias),
                "wv": qw(D, Hkv * Dh, cfg.attention_bias),
                "wo": qw(Hq * Dh, D, False),
            },
            "mlp": {
                "gate": qw(D, I, False),
                "up": qw(D, I, False),
                "down": qw(I, D, False),
            },
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if bits == 4:
        lm = jax.jit(lambda k: jax.random.randint(
            k, (D // 2, cfg.vocab_size), 0, 256, jnp.uint8))(next(keys))
        params["lm_head"] = QuantWeight4(
            lm, jnp.full((max(D // 128, 1), cfg.vocab_size),
                         1.0 / (7.0 * np.sqrt(D)), jnp.float32))
    else:
        lm = jax.jit(lambda k: jax.random.randint(
            k, (D, cfg.vocab_size), -127, 128, jnp.int8))(next(keys))
        params["lm_head"] = QuantWeight(
            lm, jnp.full((1, cfg.vocab_size), 1.0 / (127.0 * np.sqrt(D)),
                         jnp.float32))
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefill", type=int, default=1024)
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=0,
                    help="KV capacity; 0 = tight bucket (prefill+decode "
                         "rounded up to 128)")
    ap.add_argument("--cache-dtype", choices=["bf16", "int8"], default="bf16")
    ap.add_argument("--arch", choices=["vicuna7b", "qwen7b"],
                    default="vicuna7b",
                    help="vicuna7b = LLaVA-family 7B (32 KV heads); "
                         "qwen7b = Qwen2-VL-7B (GQA 28/4, M-RoPE)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import LLMConfig
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.runtime.generation import GenerationConfig, Generator

    enable_compilation_cache()

    if args.arch == "qwen7b":
        # Qwen2-VL-7B shape (Qwen-generation flagship LLM)
        cfg = LLMConfig(vocab_size=152064, hidden_size=3584,
                        intermediate_size=18944, num_layers=28, num_heads=28,
                        num_kv_heads=4, attention_bias=True, rope_theta=1e6,
                        mrope_sections=(16, 24, 24))
    else:
        # Vicuna-7B shape (LLaVA-generation flagship LLM)
        cfg = LLMConfig(vocab_size=32000, hidden_size=4096,
                        intermediate_size=11008, num_layers=32, num_heads=32,
                        num_kv_heads=32)
    params = build_int8_7b(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(params))
    print(f"params: {n_bytes / 1e9:.2f} GB on device")

    S, N = args.prefill, args.decode
    max_len = args.max_len or -(-(S + N) // 128) * 128
    cache_dtype = jnp.bfloat16 if args.cache_dtype == "bf16" else jnp.int8
    gen = Generator(params, cfg, max_len=max_len, cache_dtype=cache_dtype)
    gcfg = GenerationConfig(max_new_tokens=N, eos_token_ids=())

    rng = np.random.default_rng(0)
    embeds = jnp.asarray(
        rng.normal(size=(1, S, cfg.hidden_size)).astype(np.float32) * 0.02
    ).astype(jnp.bfloat16)
    positions = jnp.arange(S)[None]

    from flash_vstream_tpu.runtime.metrics import force_completion

    # phase probes (separate from the e2e measurement)
    cache = gen.new_cache(1)
    t0 = time.perf_counter()
    logits, cache = gen._prefill(params, embeds, positions, cache, None, None)
    force_completion(logits)   # host fetch; block_until_ready lies (VERDICT r2)
    compile_prefill = time.perf_counter() - t0

    def run_once():
        t0 = time.perf_counter()
        out = gen.generate(embeds, positions, gcfg)
        t1 = time.perf_counter()
        assert len(out) == N
        return t1 - t0

    warm = run_once()   # compile decode loop
    times = sorted(run_once() for _ in range(args.iters))
    p50 = times[len(times) // 2]

    # prefill-only timing (cache alloc + prefill dispatch)
    def prefill_once():
        c = gen.new_cache(1)
        t0 = time.perf_counter()
        lg, c = gen._prefill(params, embeds, positions, c, None, None)
        force_completion(lg)
        return time.perf_counter() - t0
    prefill_once()
    pf = sorted(prefill_once() for _ in range(args.iters))[args.iters // 2]

    decode_ms = (p50 - pf) / N * 1e3
    print(json.dumps({
        "metric": "answer_latency_7b_int8",
        "prefill_tokens": S, "decode_tokens": N, "kv_capacity": max_len,
        "cache_dtype": args.cache_dtype,
        "p50_s": round(p50, 4),
        "prefill_s": round(pf, 4),
        "decode_ms_per_tok": round(decode_ms, 3),
        "first_call_s": round(warm, 2),
        "compile_prefill_s": round(compile_prefill, 2),
        "target_s": 1.0, "vs_target": round(1.0 / p50, 3),
    }))


if __name__ == "__main__":
    main()
