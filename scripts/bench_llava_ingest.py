"""LLaVA-family streaming ingest: CLIP ViT-L/14 encode + STAR memory update.

Same method as bench.py (live session, completion forced by a host scalar
fetch) plus a device-compute-only figure (scan inside one jit) so the
tunnel's host->device upload cost is visible separately.

Usage: python scripts/bench_llava_ingest.py [--clip 8] [--clips 100]
(--clips 100 is the published methodology: the ~32 ms dispatch+fetch tunnel
RTT amortizes to <0.4 ms/clip at 100 scan iterations; at 20 it inflated
earlier per-clip figures by ~1.4 ms.)
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
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--clips", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import VStreamLLaVAConfig, LLMConfig
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.models.vstream_llava import init_llava_params
    from flash_vstream_tpu.preprocess.tokenizer import ByteTokenizer
    from flash_vstream_tpu.runtime.streaming import LLaVAStreamSession

    enable_compilation_cache()

    # full CLIP ViT-L/14 tower + tiny LLM stub (not on the ingest path)
    cfg = VStreamLLaVAConfig(
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4))
    params = init_llava_params(jax.random.PRNGKey(0), cfg,
                               dtype=jnp.bfloat16)
    sess = LLaVAStreamSession(params, cfg, ByteTokenizer(),
                              clip_size=args.clip, max_len=2048)
    side = cfg.vit.image_size
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
              for _ in range(args.clip)]

    sess.ingest_frames(frames)
    sess.block_until_ingested()
    for _ in range(4):
        sess.ingest_frames(frames)
    sess.block_until_ingested()

    t0 = time.perf_counter()
    for _ in range(args.clips):
        sess.ingest_frames(frames)
    sess.block_until_ingested()
    dt_live = (time.perf_counter() - t0) / args.clips
    live_fps = args.clip / dt_live

    # device-compute-only: N ingests inside ONE jit, scalar fetch at the end
    from flash_vstream_tpu.models import vstream_llava
    from flash_vstream_tpu.models.star_memory import star_stream_update
    from flash_vstream_tpu.preprocess.image import clip_device_preprocess
    imgs = jnp.asarray(np.stack([np.stack(frames)] * 4))

    def loop(params, state, imgs, iters):
        def body(carry, i):
            state = carry
            images = clip_device_preprocess(imgs[i % 4])
            feats = vstream_llava.encode_frames(params, cfg, images)
            state = star_stream_update(params["ntm"], cfg.star, state, feats,
                                       jnp.int32(args.clip),
                                       jax.random.PRNGKey(0))
            return state, ()
        state, _ = jax.lax.scan(body, state, jnp.arange(iters))
        return state.long
    jloop = jax.jit(loop, static_argnums=(3,))
    from flash_vstream_tpu.models.star_memory import init_star_state
    st = init_star_state(cfg.star, cfg.projector.effective_input_dim)
    float(jnp.sum(jloop(params, st, imgs, args.clips).ravel()[0]))
    # best of 3 windows: the shared chip varies run to run (CLAUDE.md)
    dts = []
    for _ in range(3):
        st = init_star_state(cfg.star, cfg.projector.effective_input_dim)
        t0 = time.perf_counter()
        float(jnp.sum(jloop(params, st, imgs, args.clips).ravel()[0]))
        dts.append(time.perf_counter() - t0)
    dt_dev = min(dts) / args.clips
    dev_fps = args.clip / dt_dev

    print(json.dumps({
        "metric": "llava_ingest_fps",
        "clip": args.clip,
        "live_session_fps": round(live_fps, 1),
        "device_compute_fps": round(dev_fps, 1),
        "live_ms_per_clip": round(dt_live * 1e3, 1),
        "device_ms_per_clip": round(dt_dev * 1e3, 1),
        "method": "host scalar fetch (live) / scan-in-one-jit (device)",
    }))


if __name__ == "__main__":
    main()
