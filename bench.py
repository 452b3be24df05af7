"""Benchmark: sustained streaming frame ingestion (encode + memory update).

Measures the BASELINE.json headline metric on the Qwen-generation pipeline at
full vision scale: Qwen2-VL ViT (32 layers, 1280 hidden, dual-resolution
stream) + Flash memory consolidation (weighted k-means over the CSM bank +
DAM retrieval) per ingested frame, on one chip.

Baseline: the north-star target of 30 fps sustained ingest
(BASELINE.json: ">=30 fps sustained frame ingestion + memory update").
Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    enable_compilation_cache()

    from flash_vstream_tpu.core.config import (
        FlashMemoryConfig, LLMConfig, QWEN2_VL_VIT, VStreamQwenConfig)
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import make_byte_qwen_tokenizer
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession

    # full-scale vision tower; tiny LLM stub (the LLM is not on the ingest path)
    cfg = VStreamQwenConfig(
        vit=QWEN2_VL_VIT,
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      attention_bias=True, mrope_sections=(2, 3, 3)),
        flash_memory=FlashMemoryConfig(),   # temporal 120, spatial 60
        image_token_id=258, video_token_id=263, vision_start_token_id=261,
    )
    dtype = jnp.bfloat16
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    if os.environ.get("BENCH_INT8_VIT"):
        # opt-in: weight-only int8 ViT blocks + w8a8 int8xint8 projections
        from flash_vstream_tpu.weights.quantize import (
            enable_w8a8_prefill, quantize_params)
        params = dict(params, vit=quantize_params(params["vit"]))
        enable_w8a8_prefill()

    clip_size = int(os.environ.get("BENCH_CLIP", "8"))       # frames per ingest
    n_clips = int(os.environ.get("BENCH_CLIPS", "30"))
    side = int(os.environ.get("BENCH_SIDE", "224"))

    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(side, side), clip_size=clip_size,
                             bank_size=1024, max_len=2048)

    rng = np.random.default_rng(0)
    # FRESH pixels for every ingest: the runtime dedupes identical enqueued
    # calls (CLAUDE.md), so re-sending one clip would skip uploads and
    # flatter the live number. One base clip, rolled per step, keeps host
    # memory flat while making every upload distinct.
    base = [rng.integers(0, 255, size=(side, side, 3), dtype=np.uint8)
            for _ in range(clip_size)]

    def fresh_clip(step: int):
        return [np.roll(f, shift=1 + step, axis=1) for f in base]

    step = 0
    # warmup (compile)
    sess.ingest_frames(fresh_clip(step)); step += 1
    sess.block_until_ingested()
    # fill past the memory budget so steady-state includes full clustering
    for _ in range(max((cfg.flash_memory.csm_grid_len * 2) // clip_size, 4)):
        sess.ingest_frames(fresh_clip(step)); step += 1
    sess.block_until_ingested()

    from flash_vstream_tpu.runtime.metrics import (
        ProfilerSession, V5E_BF16_TFLOPS, force_completion)
    # BEST of n_trials windows: the chip is shared and contention inflates
    # identical work several-fold between runs; the best window is the
    # closest measurement of the hardware (CLAUDE.md: idle-machine rule)
    n_trials = int(os.environ.get("BENCH_TRIALS", "3"))
    dts = []
    with ProfilerSession(os.environ.get("BENCH_TRACE")):
        for _ in range(n_trials):
            t0 = time.perf_counter()
            for _ in range(n_clips):
                sess.ingest_frames(fresh_clip(step)); step += 1
            # completion is forced by a host fetch of the final state:
            # through this tunnel jax.block_until_ready returns before the
            # device finishes, so dispatch-only timing inflates fps ~40x
            # (VERDICT r2)
            sess.block_until_ingested()
            dts.append(time.perf_counter() - t0)
    dt = min(dts)

    fps = n_clips * clip_size / dt

    # roofline sanity: the implied FLOP rate must not exceed the chip's peak
    t_clip = clip_size // 2
    p_full, p_small = sess.p_full, sess.p_small
    S = t_clip * (p_full + p_small)
    D, I, L, H = (cfg.vit.hidden_size, cfg.vit.intermediate_size,
                  cfg.vit.num_layers, cfg.vit.num_heads)
    hd = cfg.vit.head_dim
    per_layer = (4 * 2 * S * D * D            # qkv + o projections
                 + 2 * 2 * S * D * I          # mlp up + down
                 + 2 * 2 * t_clip * H * hd * (p_full ** 2 + p_small ** 2))
    vit_flops = L * per_layer
    implied_tflops = vit_flops * n_clips / dt / 1e12
    # int8xint8 MXU runs at 2x the bf16 rate on v5e
    peak = V5E_BF16_TFLOPS * (2 if os.environ.get("BENCH_INT8_VIT") else 1)
    print(f"sanity: {dt / n_clips * 1e3:.1f} ms/clip of {clip_size} frames, "
          f"ViT ~{vit_flops / 1e12:.2f} TFLOP/clip -> {implied_tflops:.1f} "
          f"TFLOP/s implied ({100 * implied_tflops / peak:.0f}% "
          f"of v5e peak; timing method: host scalar fetch)",
          file=sys.stderr)
    assert implied_tflops <= peak, (
        f"implied {implied_tflops:.0f} TFLOP/s exceeds the v5e peak "
        f"({peak}) — the timing did not capture device compute")

    baseline = 30.0
    print(json.dumps({
        "metric": "streaming_ingest_fps_encode_plus_memory_update",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
