"""Probe: where the fused ingest loses time vs the sum of its stages.

profile_ingest.py measures pre 1.6 + vit 17.1 + mem 2.1 + merge 3.9 =
24.7 ms of stages but 36.6 ms for the fused whole — this probe times the
progressive compositions (pre+vit, pre+vit+mem, full) under the same
chained-scan/host-fetch harness to locate the junction that adds the cost.

Usage: python scripts/probe_ingest_fusion.py [--clip 8] [--iters 20]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, xs, consts, iters, tag):
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
    float(jloop(xs, consts))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jloop(xs, consts))
        best = min(best, time.perf_counter() - t0)
    dt = best / iters
    print(f"{tag:36s} {dt * 1e3:8.2f} ms/iter", file=sys.stderr)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", type=int, default=8)
    ap.add_argument("--side", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
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

    frames = jnp.asarray(rng.integers(
        0, 255, (4, clip, nh, nw, 3), dtype=np.uint8))
    state = init_flash_state(fm, p_full, p_small, D, bank_size=1024)

    def enc(f, c):
        p = qwen_device_preprocess(f)
        small, _ = qwen_temporal_pool(p, (t_clip, gh, gw))
        allp = jnp.concatenate([p, small], axis=0)
        return qwen_vit_blocks_frames(
            c["vp"], vit, allp, t_full=t_clip, hw_full=(gh, gw),
            t_small=t_clip, hw_small=(gh // 2, gw // 2))

    timed(lambda f, i, c: enc(f, c), frames, {"vp": vparams},
          args.iters, "pre+vit")

    def pvm(f, i, c):
        hidden = enc(f, c)
        x = hidden[:S].reshape(t_clip, p_full, D)
        sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
        st, out = flash_stream_update(fm, c["state"], x, sx,
                                      jnp.int32(t_clip), jax.random.PRNGKey(0))
        return out.tem_x

    timed(pvm, frames, {"vp": vparams, "state": state},
          args.iters, "pre+vit+mem")

    def pvm_st(f, i, c):
        # carry nothing, but also fetch the new state leaves (is the cost
        # in materializing st?)
        hidden = enc(f, c)
        x = hidden[:S].reshape(t_clip, p_full, D)
        sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
        st, out = flash_stream_update(fm, c["state"], x, sx,
                                      jnp.int32(t_clip), jax.random.PRNGKey(0))
        return (st.tem_x, out.tem_x)

    timed(pvm_st, frames, {"vp": vparams, "state": state},
          args.iters, "pre+vit+mem (+state out)")

    def full(f, i, c):
        hidden = enc(f, c)
        x = hidden[:S].reshape(t_clip, p_full, D)
        sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
        st, out = flash_stream_update(fm, c["state"], x, sx,
                                      jnp.int32(t_clip), jax.random.PRNGKey(0))
        ve = patch_merger(c["vp"], cat_spa_tem(out.spa_x, out.tem_x))
        return ve

    timed(full, frames, {"vp": vparams, "state": state},
          args.iters, "full (pre+vit+mem+merge)")

    def full_barrier(f, i, c):
        hidden = enc(f, c)
        x = hidden[:S].reshape(t_clip, p_full, D)
        sx = hidden[S:S + S_small].reshape(t_clip, p_small, D)
        st, out = flash_stream_update(fm, c["state"], x, sx,
                                      jnp.int32(t_clip), jax.random.PRNGKey(0))
        vis = jax.lax.optimization_barrier(
            cat_spa_tem(out.spa_x, out.tem_x))
        ve = patch_merger(c["vp"], vis)
        return ve

    timed(full_barrier, frames, {"vp": vparams, "state": state},
          args.iters, "full + barrier before merger")

    # merger alone on the memory-sized input, for reference
    n_vis = fm.dam_grid_len * p_full + fm.csm_grid_len * p_small
    vis = jnp.asarray(rng.normal(size=(4, n_vis, D)), dtype)
    timed(lambda v, i, c: patch_merger(c["vp"], v), vis, {"vp": vparams},
          args.iters, "merger alone")


if __name__ == "__main__":
    main()
