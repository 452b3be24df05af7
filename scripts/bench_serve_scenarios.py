"""Live-serve scenarios: paced ingest + periodic answers, device-synced.

Re-validates the BASELINE streaming targets with the fixed deadline meter
(a deadline counts against DEVICE completion of the clip's published
snapshot — ThreadedIngestor force-fetches a scalar per clip):

- long:        1,200 frames @ 30 fps, QA every 5 s  (>= 1e3-frame streams)
- concurrent:    640 frames @ 30 fps, QA every 2 s  (ingest + answers share
                 the chip; answers must not stall the stream)

Model: full 32-layer Qwen2-VL ViT + Qwen2-VL-2B-shaped decoder (the answer
path at real vision scale; --arch 7b for the int8 flagship decoder).

Usage: python scripts/bench_serve_scenarios.py [--scenario long|concurrent]
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
    ap.add_argument("--scenario", choices=["long", "concurrent"],
                    default="long")
    ap.add_argument("--arch", choices=["2b", "7b"], default="2b")
    ap.add_argument("--side", type=int, default=224)
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--fps", type=float, default=30.0)
    ap.add_argument("--decode", type=int, default=16)
    ap.add_argument("--control", action="store_true",
                    help="run a paired ingest-only control pass first and "
                         "report answer-attributable misses (total minus "
                         "ambient shared-chip jitter)")
    ap.add_argument("--qa-interval", type=float, default=-1.0,
                    help="seconds between answers (-1 = scenario default; "
                         "0 = NO answers: ingest-only control run that "
                         "measures ambient tunnel/shared-chip deadline "
                         "jitter — subtract from the with-answers number)")
    ap.add_argument("--prefill-chunk", type=int, default=0,
                    help="with --preempt: chunk the prompt prefill too "
                         "(sequence chunks; exact) so clips preempt "
                         "mid-prefill")
    ap.add_argument("--preempt", type=int, default=0,
                    help="decode chunk size for preemptible answers: ingest "
                         "clips queued mid-answer run between chunks "
                         "(0 = fused one-dispatch answers)")
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
    from flash_vstream_tpu.runtime.metrics import MetricMeter
    from flash_vstream_tpu.runtime.streaming import (QwenStreamSession,
                                                     ThreadedIngestor)

    enable_compilation_cache()

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
        llm=llm, flash_memory=FlashMemoryConfig())
    if args.arch == "7b":
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

    n_frames = 1200 if args.scenario == "long" else 640
    qa_interval = 5.0 if args.scenario == "long" else 2.0
    if args.qa_interval >= 0:
        qa_interval = args.qa_interval
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(args.side, args.side),
                             clip_size=args.clip, bank_size=512,
                             max_len=8192)
    gen = GenerationConfig(max_new_tokens=args.decode, eos_token_ids=(),
                           preemptible_chunk=args.preempt,
                           prefill_chunk=args.prefill_chunk)
    q = "What is happening right now?"

    # prewarm: compile ingest + every answer bucket before the clock starts
    rng = np.random.default_rng(0)
    warm = [rng.integers(0, 255, (args.side, args.side, 3), np.uint8)
            for _ in range(args.clip)]
    sess.ingest_frames(warm)
    sess.block_until_ingested()
    snapshot, _ = sess._published
    from flash_vstream_tpu.runtime.streaming import bucket_candidates
    fm = cfg.flash_memory
    seen = set()
    for n in sorted(set(bucket_candidates(fm.dam_grid_len))
                    | set(bucket_candidates(fm.csm_grid_len))):
        key = (sess._bucket_t(min(n, fm.dam_grid_len), fm.dam_grid_len),
               sess._bucket_t(min(n, fm.csm_grid_len), fm.csm_grid_len))
        if key not in seen:
            seen.add(key)
            sess.answer_snapshot(snapshot, n, q, gen)
    sess.reset()
    sess.metrics = MetricMeter()

    frames = [rng.integers(0, 255, (args.side, args.side, 3), np.uint8)
              for _ in range(n_frames)]

    def run_phase(interval):
        """One paced stream; answers every `interval` s (0 = none)."""
        answers = []
        start = time.perf_counter()
        ing = ThreadedIngestor(sess, frames, fps=args.fps,
                               clip_size=args.clip).start()
        next_q = interval
        while not ing.wait(timeout=0.05):
            el = time.perf_counter() - start
            if interval > 0 and sess.n_frames and el >= next_q:
                next_q += interval
                t0 = time.perf_counter()
                sess.answer(q, gen)
                answers.append(time.perf_counter() - t0)
        ing.stop()
        wall = time.perf_counter() - start
        missed = ing.missed_deadlines
        sess.reset()
        return wall, missed, answers

    # paired control: an ingest-only pass right before the measured pass.
    # The chip and tunnel are SHARED here — ambient stalls alone miss tens
    # of deadlines on a bad day — so the publishable number is the DELTA
    # attributable to answers, not the raw count.
    control_missed = None
    if args.control:
        _, control_missed, _ = run_phase(0.0)
    wall, missed, answers = run_phase(qa_interval)

    arr = sorted(answers)
    out = {
        "metric": f"serve_scenario_{args.scenario}_{args.arch}",
        "frames": n_frames, "fps_target": args.fps, "clip": args.clip,
        "preempt": args.preempt,
        "qa_interval": qa_interval,
        "prefill_chunk": args.prefill_chunk,
        "wall_s": round(wall, 1),
        "missed_clip_deadlines": missed,
        "n_answers": len(answers),
        "answer_avg_s": round(float(np.mean(arr)), 3) if arr else None,
        "answer_max_s": round(float(np.max(arr)), 3) if arr else None,
        "deadline_method": "device-synced (per-clip host scalar fetch)",
    }
    if control_missed is not None:
        out["control_missed_no_answers"] = control_missed
        out["answer_attributable_misses"] = max(0, missed - control_missed)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
