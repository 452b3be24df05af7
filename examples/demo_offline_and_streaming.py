#!/usr/bin/env python3
"""Demo: offline video QA + real-time streaming QA, both model families.

Runs with tiny random-init models (no checkpoints) so the full pipeline is
exercised anywhere; pass --model-path/--family to use converted weights.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=24)
    args = p.parse_args()

    from flash_vstream_tpu.core.config import tiny_llava_config, tiny_qwen_config
    from flash_vstream_tpu.models.vstream_llava import init_llava_params
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import make_byte_qwen_tokenizer
    from flash_vstream_tpu.preprocess.tokenizer import ByteTokenizer
    from flash_vstream_tpu.preprocess.video import SyntheticSource
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.pipeline import LLaVAPipeline, QwenPipeline
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession

    gen = GenerationConfig(max_new_tokens=12)
    frames = list(SyntheticSource(args.frames, 112, 112))
    qframes = list(SyntheticSource(args.frames, 56, 56))

    print("== Offline QA: LLaVA generation (CLIP + STAR + Vicuna-style) ==")
    cfg = tiny_llava_config()
    pipe = LLaVAPipeline(init_llava_params(jax.random.PRNGKey(0), cfg), cfg,
                         ByteTokenizer(), max_len=1024)
    t0 = time.perf_counter()
    ans = pipe.answer(frames, "What is happening in the video?", gen=gen)
    print(f"A ({time.perf_counter()-t0:.1f}s incl compile): {ans!r}\n")

    print("== Offline QA: Qwen generation (dual-res ViT + Flash memory) ==")
    qcfg = tiny_qwen_config()
    qpipe = QwenPipeline(init_qwen_params(jax.random.PRNGKey(0), qcfg), qcfg,
                         make_byte_qwen_tokenizer(), max_len=1024)
    t0 = time.perf_counter()
    ans = qpipe.answer(qframes, "Describe the scene.", gen=gen)
    print(f"A ({time.perf_counter()-t0:.1f}s incl compile): {ans!r}\n")

    print("== Streaming QA: ingest clips, answer mid-stream ==")
    sess = QwenStreamSession(qpipe.params, qcfg, qpipe.tokenizer,
                             frame_hw=(56, 56), clip_size=2, bank_size=64,
                             max_len=1024)
    for i in range(0, len(qframes), 2):
        sess.ingest_frames(qframes[i:i + 2])
        if i == len(qframes) // 2:
            print(f"  [mid-stream @ {i + 2} frames]",
                  repr(sess.answer("What so far?", gen)))
    sess.block_until_ingested()
    print(f"  [end @ {args.frames} frames]",
          repr(sess.answer("Summarize the stream.", gen)))
    print("\nlatency metrics:")
    print(sess.metrics.summary())


if __name__ == "__main__":
    main()
