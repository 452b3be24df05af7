"""8 concurrent streams: vmapped ingest + shared batched decode
(BASELINE config #5) at 2B scale on one chip.

Measures (a) vmapped ingest throughput across all streams and (b)
answer_all wall time — one batched prefill + ONE fused decode loop serving
every stream's question.

Usage: python scripts/bench_multistream.py [--streams 8] [--decode 32]
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
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--decode", type=int, default=32)
    ap.add_argument("--side", type=int, default=112)
    ap.add_argument("--clip", type=int, default=4)
    ap.add_argument("--clips", type=int, default=8)
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
    from flash_vstream_tpu.runtime.streaming import QwenMultiStreamEngine

    enable_compilation_cache()

    cfg = VStreamQwenConfig(
        vit=dataclasses.replace(QWEN2_VL_VIT, merger_out_dim=1536),
        llm=LLMConfig(vocab_size=151936, hidden_size=1536,
                      intermediate_size=8960, num_layers=28, num_heads=12,
                      num_kv_heads=2, attention_bias=True, rope_theta=1e6,
                      mrope_sections=(16, 24, 24)),
        flash_memory=FlashMemoryConfig(temporal_length=16, spatial_length=8),
    )
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    eng = QwenMultiStreamEngine(params, cfg, make_byte_qwen_tokenizer(),
                                n_streams=args.streams,
                                frame_hw=(args.side, args.side),
                                clip_size=args.clip, bank_size=64,
                                max_len=4096)

    rng = np.random.default_rng(0)
    clips = [[rng.integers(0, 255, (args.side, args.side, 3), dtype=np.uint8)
              for _ in range(args.clip)] for _ in range(args.streams)]

    eng.ingest(clips)          # compile
    eng.block()
    # best of 3 windows: the chip is shared; contention inflates identical
    # work between runs (completion fenced by eng.block's host fetch)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.clips):
            eng.ingest(clips)
        eng.block()
        dts.append(time.perf_counter() - t0)
    ingest_dt = min(dts)
    fps = args.clips * args.clip * args.streams / ingest_dt

    gen = GenerationConfig(max_new_tokens=args.decode, eos_token_ids=())
    qs = [f"What happened in stream {i}?" for i in range(args.streams)]
    eng.answer_all(qs, gen)    # compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = eng.answer_all(qs, gen)
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[1]
    print(json.dumps({
        "metric": "multistream_8x_shared_decode",
        "streams": args.streams, "decode_tokens": args.decode,
        "vmapped_ingest_fps_all_streams": round(fps, 1),
        "answer_all_p50_s": round(p50, 3),
        "per_stream_answer_s": round(p50 / args.streams, 3),
    }))


if __name__ == "__main__":
    main()
