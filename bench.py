"""Benchmark: sustained streaming frame ingestion (encode + memory update).

Measures the BASELINE.json headline metric on the Qwen-generation pipeline at
full vision scale: device preprocess + Qwen2-VL ViT (32 layers, 1280 hidden,
dual-resolution stream) + Flash memory consolidation (weighted k-means over
the CSM bank + DAM retrieval) per ingested clip, on one chip.

Measurement method (hard-won, CLAUDE.md + VERDICT r3):
- The PRIMARY number is device-compute-bound and tunnel-immune: a lax.scan
  INSIDE one jit whose carry is the streaming FlashState, so iteration i+1's
  memory update depends on iteration i's (chained — no fake cross-iteration
  overlap), with fresh pixel inputs per iteration (bank indexed i % n; the
  runtime dedupes identical enqueued calls). Completion is forced by a host
  scalar fetch (block_until_ready returns early through this tunnel).
- The chip is SHARED and the remote compile service serializes across
  processes: identical work varies up to 10x between runs. The scan runs
  BENCH_TRIALS times (default 5) and the best window is reported, with an
  in-process calibration matmul logged so a contended run is visible.
- The live-upload number (session ingest incl. host->device transfer over
  the ~23 MB/s tunnel) is a separate, deliberately distinct figure; set
  BENCH_LIVE=1 to measure and log it to stderr.

Baseline: the north-star target of 30 fps sustained ingest
(BASELINE.json: ">=30 fps sustained frame ingestion + memory update").
Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def compile_with_retries(call, retries=4, sleep_s=30):
    """First call of a jitted fn = compile + run. The remote compile service
    drops long compiles with a transport error (broken pipe ~30 min in) when
    contended; retry — the persistent compilation cache keeps any compile
    that did finish, so a retry is cheap once the server recovers."""
    import jax
    for attempt in range(retries):
        try:
            return call()
        except jax.errors.JaxRuntimeError as e:
            if "UNAVAILABLE" not in str(e) or attempt == retries - 1:
                raise
            print(f"bench: compile transport error (attempt {attempt + 1}): "
                  f"{str(e).splitlines()[0]}", file=sys.stderr)
            time.sleep(sleep_s)


def device_compute_fps(jax, jnp, cfg, params, clip, side, iters, trials):
    """Chained scan-in-jit ingest rate (frames/sec of pure device compute)."""
    from flash_vstream_tpu.models.flash_memory import (flash_stream_update,
                                                       init_flash_state)
    from flash_vstream_tpu.models.qwen2_vit import qwen_vit_blocks_frames
    from flash_vstream_tpu.ops.pooling import qwen_temporal_pool
    from flash_vstream_tpu.preprocess.image import (qwen_device_preprocess,
                                                    smart_resize)

    vit, fm = cfg.vit, cfg.flash_memory
    t_clip = clip // 2
    nh, nw = smart_resize(side, side, factor=56, max_pixels=4 * 224 * 224)
    gh, gw = nh // 14, nw // 14
    p_full, p_small = gh * gw, (gh // 2) * (gw // 2)
    S, S_small = t_clip * p_full, t_clip * p_small
    D = vit.hidden_size

    rng = np.random.default_rng(0)
    n_bank = 4
    frames = jnp.asarray(rng.integers(
        0, 255, (n_bank, clip, nh, nw, 3), dtype=np.uint8))

    # memory saturated: steady-state includes full clustering + retrieval
    state0 = init_flash_state(fm, p_full, p_small, D, bank_size=1024)
    state0 = state0._replace(
        tem_x=jnp.asarray(rng.normal(size=state0.tem_x.shape),
                          state0.tem_x.dtype),
        tem_valid=jnp.ones_like(state0.tem_valid),
        tem_weights=jnp.ones_like(state0.tem_weights),
        n_frames=jnp.int32(600))

    def loop(vparams, state, frames):
        def body(carry, i):
            state, acc = carry
            p = qwen_device_preprocess(frames[i % n_bank])
            small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
            allp = jnp.concatenate([p, small], axis=0)
            hidden = qwen_vit_blocks_frames(
                vparams, vit, allp, t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
            x = hidden[:S].reshape(t_clip, p_full, D)
            sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
            state, out = flash_stream_update(
                fm, state, x, sx, jnp.int32(t_clip),
                jax.random.fold_in(jax.random.PRNGKey(0), i))
            acc = acc + (out.spa_x[0, 0, 0].astype(jnp.float32)
                         + out.tem_x[0, 0, 0].astype(jnp.float32)
                         + out.spa_positions[0].astype(jnp.float32))
            return (state, acc), ()
        (state, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                       jnp.arange(iters))
        return acc

    jloop = jax.jit(loop)
    compile_with_retries(
        lambda: float(jloop(params["vit"], state0, frames)))  # compile+warm
    dts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jloop(params["vit"], state0, frames))    # fetch = completion
        dts.append(time.perf_counter() - t0)
    dt = min(dts) / iters

    # ViT FLOPs per clip (roofline sanity: implied rate <= chip peak)
    St = S + S_small
    per_layer = (4 * 2 * St * D * D
                 + 2 * 2 * St * D * vit.intermediate_size
                 + 2 * 2 * t_clip * vit.num_heads * vit.head_dim
                 * (p_full ** 2 + p_small ** 2))
    vit_flops = vit.num_layers * per_layer
    return clip / dt, dt, vit_flops, dts


def calibration_tflops(jax, jnp):
    """What the (shared) chip sustains on a plain big matmul RIGHT NOW."""
    m = 8192
    a = jnp.ones((m, m), jnp.bfloat16)

    def mm(a):
        def body(x, _):
            return jnp.dot(x, a, preferred_element_type=jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, a, None, length=8)
        return y[0, 0].astype(jnp.float32)

    f = jax.jit(mm)
    compile_with_retries(lambda: float(f(a)))
    t0 = time.perf_counter()
    float(f(a))
    dt = (time.perf_counter() - t0) / 8
    return 2 * m ** 3 / dt / 1e12


def live_session_fps(cfg, params, clip, side):
    """Secondary figure: live ingest through the session API, including the
    host->device frame upload (tunnel-bound, ~23 MB/s)."""
    from flash_vstream_tpu.preprocess.qwen_processor import (
        make_byte_qwen_tokenizer)
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(side, side), clip_size=clip,
                             bank_size=1024, max_len=2048)
    rng = np.random.default_rng(0)
    base = [rng.integers(0, 255, size=(side, side, 3), dtype=np.uint8)
            for _ in range(clip)]

    def fresh(step):
        return [np.roll(f, shift=1 + step, axis=1) for f in base]

    step = 0
    sess.ingest_frames(fresh(step)); step += 1
    sess.block_until_ingested()
    for _ in range(max((cfg.flash_memory.csm_grid_len * 2) // clip, 4)):
        sess.ingest_frames(fresh(step)); step += 1
    sess.block_until_ingested()
    n_clips = 20
    t0 = time.perf_counter()
    for _ in range(n_clips):
        sess.ingest_frames(fresh(step)); step += 1
    sess.block_until_ingested()
    return n_clips * clip / (time.perf_counter() - t0)


def main():
    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    enable_compilation_cache()

    from flash_vstream_tpu.core.config import (
        FlashMemoryConfig, LLMConfig, QWEN2_VL_VIT, VStreamQwenConfig)
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.runtime.metrics import V5E_BF16_TFLOPS

    # full-scale vision tower; tiny LLM stub (the LLM is not on the ingest path)
    cfg = VStreamQwenConfig(
        vit=QWEN2_VL_VIT,
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      attention_bias=True, mrope_sections=(2, 3, 3)),
        flash_memory=FlashMemoryConfig(),   # temporal 120, spatial 60
        image_token_id=264, video_token_id=263, vision_start_token_id=261,
    )
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("BENCH_INT8_VIT"):
        # opt-in: weight-only int8 ViT blocks + w8a8 int8xint8 projections
        from flash_vstream_tpu.weights.quantize import (
            enable_w8a8_prefill, quantize_params)
        params = dict(params, vit=quantize_params(params["vit"]))
        enable_w8a8_prefill()

    clip = int(os.environ.get("BENCH_CLIP", "8"))
    side = int(os.environ.get("BENCH_SIDE", "224"))
    iters = int(os.environ.get("BENCH_ITERS", "100"))
    trials = int(os.environ.get("BENCH_TRIALS", "5"))

    calib = calibration_tflops(jax, jnp)
    fps, dt_clip, vit_flops, dts = device_compute_fps(
        jax, jnp, cfg, params, clip, side, iters, trials)

    peak = V5E_BF16_TFLOPS * (2 if os.environ.get("BENCH_INT8_VIT") else 1)
    implied = vit_flops / dt_clip / 1e12
    print(f"sanity: {dt_clip * 1e3:.1f} ms/clip of {clip} frames "
          f"(chained scan-in-jit, best of {trials}; windows "
          f"{[round(d, 2) for d in dts]} s), ViT ~{vit_flops / 1e12:.2f} "
          f"TFLOP/clip -> {implied:.1f} TFLOP/s implied "
          f"({100 * implied / peak:.0f}% of v5e peak); calibration matmul "
          f"{calib:.0f} TF/s", file=sys.stderr)
    assert implied <= peak, (
        f"implied {implied:.0f} TFLOP/s exceeds the v5e peak ({peak}) — "
        f"the timing did not capture device compute")
    if calib < 0.5 * V5E_BF16_TFLOPS:
        print(f"WARNING: calibration {calib:.0f} TF/s < 50% of peak — the "
              f"shared chip is contended; the best-of-{trials} window may "
              f"still underreport", file=sys.stderr)

    if os.environ.get("BENCH_LIVE"):
        lfps = live_session_fps(cfg, params, clip, side)
        print(f"live session ingest (incl. tunnel upload): {lfps:.1f} fps",
              file=sys.stderr)

    baseline = 30.0
    print(json.dumps({
        # FROZEN metric name (r4+): keep longitudinally comparable across
        # BENCH_r{N}.json — do not rename.
        "metric": "streaming_ingest_fps_device_compute",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
