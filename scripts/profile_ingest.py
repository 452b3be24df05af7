"""Component-level timing of the streaming ingest path on the real chip.

Times each stage with the only reliable method here (CLAUDE.md): a lax.scan
of N iterations INSIDE one jit (fresh inputs per iteration via indexing),
ended by a host scalar fetch. Per-dispatch host timing lies (~35-45 ms
tunnel latency, async dispatch, enqueue dedupe). Params/state are jit
ARGUMENTS (closures would inline them as HLO constants -> HTTP 413 through
the remote compile service).

Stages: device preprocess, ViT encode (frame-batched dual-res), flash
memory update (kmeans+retrieval), patch merger, and the full fused ingest.

Usage: python scripts/profile_ingest.py [--clip 8] [--side 224] [--iters 20]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_scan(fn, xs, consts, iters, tag, flops_per_iter=None):
    """Run fn(xs[i % n], i, consts) for `iters` iterations inside ONE jit;
    return seconds/iteration (completion forced by a scalar fetch)."""
    import jax
    import jax.numpy as jnp

    n = jax.tree_util.tree_leaves(xs)[0].shape[0]

    def loop(xs, consts):
        def body(acc, i):
            out = fn(jax.tree.map(lambda a: a[i % n], xs), i, consts)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, "dtype")]
            s = sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)
            return acc + s, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(iters))
        return acc

    jloop = jax.jit(loop)
    float(jloop(xs, consts))              # compile + warmup
    t0 = time.perf_counter()
    float(jloop(xs, consts))              # fetch forces completion
    dt = (time.perf_counter() - t0) / iters
    extra = f" {flops_per_iter / dt / 1e12:.1f} TF/s" if flops_per_iter else ""
    print(f"{tag:32s} {dt * 1e3:8.2f} ms/iter{extra}", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--side", type=int, default=224)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--stages", type=str, default="all",
                    help="comma list: pre,vit,mem,merge,full")
    ap.add_argument("--int8-vit", action="store_true",
                    help="weight-only int8 ViT blocks + w8a8 (int8xint8 MXU)"
                         " projections/MLP — the ingest-side analogue of the"
                         " decoder's --w8a8-prefill")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import (
        FlashMemoryConfig, LLMConfig, QWEN2_VL_VIT, VStreamQwenConfig)
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.models.qwen2_vit import (patch_merger,
                                                    qwen_vit_blocks_frames)
    from flash_vstream_tpu.models.flash_memory import (
        cat_spa_tem, flash_stream_update, init_flash_state)
    from flash_vstream_tpu.ops.pooling import qwen_temporal_pool
    from flash_vstream_tpu.preprocess.image import (qwen_device_preprocess,
                                                    smart_resize)

    enable_compilation_cache()
    stages = args.stages.split(",") if args.stages != "all" else [
        "pre", "vit", "mem", "merge", "full"]

    cfg = VStreamQwenConfig(
        vit=QWEN2_VL_VIT,
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      attention_bias=True, mrope_sections=(2, 3, 3)),
        flash_memory=FlashMemoryConfig(),
    )
    dtype = jnp.bfloat16
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    vparams = params["vit"]
    if args.int8_vit:
        from flash_vstream_tpu.weights.quantize import (
            enable_w8a8_prefill, quantize_params)
        vparams = quantize_params(vparams)   # blocks only; merger stays bf16
        enable_w8a8_prefill()
    vit, fm = cfg.vit, cfg.flash_memory

    clip = args.clip
    t_clip = clip // 2
    nh, nw = smart_resize(args.side, args.side, factor=56,
                          max_pixels=4 * 224 * 224)
    gh, gw = nh // 14, nw // 14
    p_full, p_small = gh * gw, (gh // 2) * (gw // 2)
    S = t_clip * p_full
    S_small = t_clip * p_small
    D = vit.hidden_size
    rng = np.random.default_rng(0)

    # ViT flops for the dual-res stream
    St = S + S_small
    per_layer = (4 * 2 * St * D * D + 2 * 2 * St * D * vit.intermediate_size
                 + 2 * 2 * t_clip * vit.num_heads * vit.head_dim
                 * (p_full ** 2 + p_small ** 2))
    vit_flops = vit.num_layers * per_layer
    print(f"clip={clip} grid=({t_clip},{gh},{gw}) tokens={St} "
          f"ViT {vit_flops/1e12:.2f} TFLOP/clip", file=sys.stderr)

    results = {}

    if "pre" in stages:
        frames = jnp.asarray(rng.integers(
            0, 255, (4, clip, nh, nw, 3), dtype=np.uint8))
        results["preprocess_ms"] = 1e3 * timed_scan(
            lambda f, i, c: qwen_device_preprocess(f), frames, {},
            args.iters, "device preprocess")

    patches = jnp.asarray(rng.normal(size=(
        4, S, vit.in_channels * vit.temporal_patch_size * vit.patch_size ** 2)
    ), dtype)

    if "vit" in stages:
        def encode(p, i, c):
            small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
            allp = jnp.concatenate([p, small], axis=0)
            return qwen_vit_blocks_frames(
                c["vp"], vit, allp, t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
        results["vit_ms"] = 1e3 * timed_scan(
            encode, patches, {"vp": vparams}, args.iters,
            "ViT encode (dual-res)", flops_per_iter=vit_flops)

    if "mem" in stages:
        state = init_flash_state(fm, p_full, p_small, D, bank_size=1024)
        # saturate the memory so the update runs full clustering
        state = state._replace(
            tem_x=jnp.asarray(rng.normal(
                size=state.tem_x.shape), state.tem_x.dtype),
            tem_valid=jnp.ones_like(state.tem_valid),
            tem_weights=jnp.ones_like(state.tem_weights),
            n_frames=jnp.int32(600))
        xs = {
            "x": jnp.asarray(rng.normal(size=(4, t_clip, p_full, D)), dtype),
            "sx": jnp.asarray(rng.normal(size=(4, t_clip, p_small, D)),
                              dtype),
        }

        def update(x, i, c):
            st, out = flash_stream_update(
                fm, c["state"], x["x"], x["sx"], jnp.int32(t_clip),
                jax.random.PRNGKey(0))
            # return the FULL snapshot: returning only tem_x lets XLA
            # dead-code-eliminate the whole spatial path (DAM retrieval +
            # spa assembly) and underreport this stage ~2.6x
            return (out.spa_positions, out.tem_positions, out.spa_x,
                    out.tem_x)
        results["memory_update_ms"] = 1e3 * timed_scan(
            update, xs, {"state": state}, args.iters, "flash memory update")

    if "merge" in stages:
        n_vis = fm.dam_grid_len * p_full + fm.csm_grid_len * p_small
        vis = jnp.asarray(rng.normal(size=(4, n_vis, D)), dtype)
        results["merger_ms"] = 1e3 * timed_scan(
            lambda v, i, c: patch_merger(c["vp"], v), vis, {"vp": vparams},
            args.iters, "patch merger (full memory)")

    if "previt" in stages:
        # composite: device preprocess -> pool -> ViT (no memory). Localizes
        # the full-vs-sum-of-parts gap.
        frames = jnp.asarray(rng.integers(
            0, 255, (4, clip, nh, nw, 3), dtype=np.uint8))

        def previt(f, i, c):
            p = qwen_device_preprocess(f)
            small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
            allp = jnp.concatenate([p, small], axis=0)
            return qwen_vit_blocks_frames(
                c["vp"], vit, allp, t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
        results["previt_ms"] = 1e3 * timed_scan(
            previt, frames, {"vp": vparams}, args.iters,
            "pre+pool+ViT", flops_per_iter=vit_flops)

    if "vitmem" in stages:
        # composite: ViT -> memory update (no preprocess)
        state = init_flash_state(fm, p_full, p_small, D, bank_size=1024)
        state = state._replace(
            tem_x=jnp.asarray(rng.normal(
                size=state.tem_x.shape), state.tem_x.dtype),
            tem_valid=jnp.ones_like(state.tem_valid),
            tem_weights=jnp.ones_like(state.tem_weights),
            n_frames=jnp.int32(600))

        def vitmem(p, i, c):
            small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
            allp = jnp.concatenate([p, small], axis=0)
            hidden = qwen_vit_blocks_frames(
                c["vp"], vit, allp, t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
            x = hidden[:S].reshape(t_clip, p_full, D)
            sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
            st, out = flash_stream_update(fm, c["state"], x, sx,
                                          jnp.int32(t_clip),
                                          jax.random.PRNGKey(0))
            return (out.spa_positions, out.tem_positions, out.spa_x,
                    out.tem_x)
        results["vitmem_ms"] = 1e3 * timed_scan(
            vitmem, patches, {"vp": vparams, "state": state}, args.iters,
            "ViT+memory", flops_per_iter=vit_flops)

    if "full" in stages:
        state = init_flash_state(fm, p_full, p_small, D, bank_size=1024)
        frames = jnp.asarray(rng.integers(
            0, 255, (4, clip, nh, nw, 3), dtype=np.uint8))

        def ingest(f, i, c):
            p = qwen_device_preprocess(f)
            small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
            allp = jnp.concatenate([p, small], axis=0)
            hidden = qwen_vit_blocks_frames(
                c["vp"], vit, allp, t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
            x = hidden[:S].reshape(t_clip, p_full, D)
            sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
            st, out = flash_stream_update(fm, c["state"], x, sx,
                                          jnp.int32(t_clip),
                                          jax.random.PRNGKey(0))
            # the production ingest snapshots RAW memory rows; the patch
            # merger runs at answer time (runtime/streaming.py ingest)
            return (out.spa_positions, out.tem_positions, out.spa_x,
                    out.tem_x)
        dt = timed_scan(ingest, frames, {"vp": vparams, "state": state},
                        args.iters, "FULL ingest (pre+vit+mem)",
                        flops_per_iter=vit_flops)
        results["full_ms"] = 1e3 * dt
        results["fps"] = clip / dt

    print(json.dumps({"metric": "ingest_profile", "clip": clip, **{
        k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
