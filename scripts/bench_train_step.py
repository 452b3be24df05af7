"""Training-step throughput at 2B scale on one chip.

Measures the Qwen-family LoRA train step (frozen base + LoRA over
projections, full vision tower + decoder forward/backward with remat,
in-step grad accumulation) end-to-end: video patches -> dual-res ViT ->
Flash memory -> splice -> decoder -> loss -> LoRA grads -> Adam update.

Usage: python scripts/bench_train_step.py [--frames 16] [--seq 512]
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
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lora-rank", type=int, default=64)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims on CPU (script logic check)")
    args = ap.parse_args()

    import dataclasses
    import os as _os

    if args.tiny:
        _os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from flash_vstream_tpu.core.config import (
        FlashMemoryConfig, LLMConfig, QWEN2_VL_VIT, VStreamQwenConfig)
    from flash_vstream_tpu.core.runtime_setup import enable_compilation_cache
    from flash_vstream_tpu.models.llm import (cross_entropy_loss,
                                              decoder_forward, embed_tokens,
                                              lm_head)
    from flash_vstream_tpu.models.vstream_qwen import (build_qwen_positions,
                                                       encode_video,
                                                       init_qwen_params)
    from flash_vstream_tpu.parallel.sharding import create_mesh
    from flash_vstream_tpu.train.lora import (QWEN_TARGETS, init_lora_params,
                                              lora_views)
    from flash_vstream_tpu.train.trainer import TrainConfig, Trainer

    enable_compilation_cache()

    if args.tiny:
        from flash_vstream_tpu.core.config import tiny_qwen_config
        cfg = tiny_qwen_config()
        cfg = cfg.replace(flash_memory=FlashMemoryConfig(
            temporal_length=16, spatial_length=8))
    else:
        cfg = VStreamQwenConfig(
            vit=dataclasses.replace(QWEN2_VL_VIT, merger_out_dim=1536),
            llm=LLMConfig(vocab_size=151936, hidden_size=1536,
                          intermediate_size=8960, num_layers=28, num_heads=12,
                          num_kv_heads=2, attention_bias=True, rope_theta=1e6,
                          mrope_sections=(16, 24, 24)),
            flash_memory=FlashMemoryConfig(temporal_length=16,
                                           spatial_length=8),
        )
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    lora = init_lora_params(jax.random.PRNGKey(1), params,
                            rank=args.lora_rank, targets=QWEN_TARGETS)

    t, gh, gw = args.frames // 2, (4 if args.tiny else 16), (4 if args.tiny else 16)
    grid = (t, gh, gw)
    pd = 3 * 2 * 14 * 14
    dam = min(t, cfg.flash_memory.dam_grid_len) * gh * gw // 4
    csm = min(t, cfg.flash_memory.csm_grid_len) * (gh // 2) * (gw // 2) // 4
    n_vis = dam + csm
    S = args.seq
    start = 16
    assert start + n_vis < S

    def loss_fn(lora_params, batch, key, base):
        eff = lora_views(base, lora_params, alpha=32, rank=args.lora_rank)
        vis = encode_video(eff, cfg, batch["patches"], grid, key=key)
        ids = batch["ids"][None]
        embeds = embed_tokens(eff["llm"], ids)
        embeds = jnp.concatenate([
            embeds[:, :start],
            vis.video_embeds[None].astype(embeds.dtype),
            embeds[:, start + n_vis:]], axis=1)
        positions, _ = build_qwen_positions(S, start, n_vis,
                                            vis.visual_positions)
        h, _ = decoder_forward(eff["llm"], cfg.llm, embeds, positions,
                               remat=True)
        logits = lm_head(eff["llm"], cfg.llm, h)
        return cross_entropy_loss(logits, batch["labels"][None])

    tcfg = TrainConfig(learning_rate=8e-4, total_steps=100,
                       grad_accum=args.accum, warmup_ratio=0.0)
    trainer = Trainer(loss_fn, lora, tcfg, mesh=create_mesh(dp=1, tp=1),
                      frozen=params)

    rng = np.random.default_rng(0)
    batch = {
        # patches per microbatch: [t*gh*gw, pd]
        "patches": jnp.asarray(rng.normal(
            size=(args.accum, t * gh * gw, pd)).astype(np.float32)),
        "ids": jnp.asarray(rng.integers(1, cfg.llm.vocab_size - 1,
                                        (args.accum, S))),
        "labels": jnp.asarray(rng.integers(1, cfg.llm.vocab_size - 1,
                                           (args.accum, S))),
    }

    t0 = time.perf_counter()
    trainer.run_step(batch, jax.random.PRNGKey(0))
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        loss = trainer.run_step(batch, jax.random.PRNGKey(i + 1))
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    tok_per_step = args.accum * S
    print(json.dumps({
        "metric": "train_step_2b_lora",
        "frames": args.frames, "seq": S, "grad_accum": args.accum,
        "visual_tokens": int(n_vis),
        "step_p50_s": round(p50, 3),
        "tokens_per_s": round(tok_per_step / p50, 1),
        "first_step_s": round(compile_s, 1),
        "final_loss": round(float(loss), 3),
    }))


if __name__ == "__main__":
    main()
