"""Streaming-answer latency at 2B scale with saturated Flash memory.

Builds a QwenStreamSession with the real 32-layer Qwen2-VL ViT and a
Qwen2-VL-2B-shaped decoder, ingests frames past the memory budget
(DAM 30 full-res + CSM 60 pooled clusters at 224px ≈ 2.9k visual tokens),
then measures answer() p50 (assemble + prefill + fused 64-token decode).

Usage: python scripts/bench_stream_answer.py [--decode 64] [--iters 5]
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
    ap.add_argument("--decode", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--side", type=int, default=224)
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--kv-int8", action="store_true")
    ap.add_argument("--w8a8-prefill", action="store_true",
                    help="int8xint8 MXU prefill over the int8 decoder "
                         "(2x bf16 matmul rate; slight logit drift)")
    ap.add_argument("--arch", choices=["2b", "7b"], default="2b",
                    help="7b = Qwen2-VL-7B decoder with weight-only int8")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import (
        FlashMemoryConfig, LLMConfig, QWEN2_VL_VIT, VStreamQwenConfig)
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import (
        make_byte_qwen_tokenizer)
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession

    enable_compilation_cache()
    if args.w8a8_prefill:
        from flash_vstream_tpu.weights.quantize import enable_w8a8_prefill
        enable_w8a8_prefill()

    if args.arch == "7b":
        llm = LLMConfig(vocab_size=152064, hidden_size=3584,
                        intermediate_size=18944, num_layers=28, num_heads=28,
                        num_kv_heads=4, attention_bias=True, rope_theta=1e6,
                        mrope_sections=(16, 24, 24))
        merger_out = 3584
    else:
        llm = LLMConfig(vocab_size=151936, hidden_size=1536,
                        intermediate_size=8960, num_layers=28, num_heads=12,
                        num_kv_heads=2, attention_bias=True, rope_theta=1e6,
                        mrope_sections=(16, 24, 24))
        merger_out = 1536
    cfg = VStreamQwenConfig(
        vit=dataclasses.replace(QWEN2_VL_VIT, merger_out_dim=merger_out),
        llm=llm,
        flash_memory=FlashMemoryConfig(),     # temporal 120 / spatial 60
    )
    if args.arch == "7b":
        # init the decoder DIRECTLY in int8 (a bf16 7B intermediate would
        # not co-reside with its int8 copy in HBM); vision side in bf16
        import dataclasses as _dc

        from bench_answer_latency import build_int8_7b
        tiny_llm = _dc.replace(llm, num_layers=2, hidden_size=256,
                               intermediate_size=512, num_heads=4,
                               num_kv_heads=2, vocab_size=512,
                               mrope_sections=(8, 12, 12))
        params = init_qwen_params(jax.random.PRNGKey(0),
                                  cfg.replace(llm=tiny_llm),
                                  dtype=jnp.bfloat16)
        params["llm"] = build_int8_7b(llm, jax.random.PRNGKey(1),
                                      jnp.bfloat16)
    else:
        params = init_qwen_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    sess = QwenStreamSession(
        params, cfg, make_byte_qwen_tokenizer(),
        frame_hw=(args.side, args.side), clip_size=args.clip, bank_size=512,
        max_len=8192,
        kv_cache_dtype=jnp.int8 if args.kv_int8 else None)

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (args.side, args.side, 3), dtype=np.uint8)
              for _ in range(args.clip)]
    # saturate the memory (csm_grid_len frame pairs)
    n_clips = (cfg.flash_memory.csm_grid_len * 2) // args.clip + 2
    for _ in range(n_clips):
        sess.ingest_frames(frames)
    sess.block_until_ingested()

    gen = GenerationConfig(max_new_tokens=args.decode, eos_token_ids=())
    q = "What has been happening in the video so far?"
    sess.answer(q, gen)          # compile
    times = sorted(
        (lambda t0: (sess.answer(q, gen), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for _ in range(args.iters))
    p50 = times[len(times) // 2]
    fm = sess.cfg.flash_memory
    n_vis = (min(sess.n_frames, fm.dam_grid_len) * sess.p_full // 4
             + min(sess.n_frames, fm.csm_grid_len) * sess.p_small // 4)
    print(json.dumps({
        "metric": f"stream_answer_latency_{args.arch}",
        "visual_tokens": int(n_vis), "decode_tokens": args.decode,
        "kv_dtype": "int8" if args.kv_int8 else "bf16",
        "w8a8_prefill": bool(args.w8a8_prefill),
        "p50_s": round(p50, 4),
        "llm_latency_avg_s": round(
            sess.metrics.get("llm_latency").avg, 4),
    }))


if __name__ == "__main__":
    main()
