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


def _llm_matmul_params(llm) -> float:
    """Matmul-visible parameter count of the decoder stack + LM head
    (embedding gather excluded — no MXU FLOPs)."""
    h, i, hk = llm.hidden_size, llm.intermediate_size, (
        llm.num_kv_heads * llm.head_dim)
    per_layer = h * h * 2 + 2 * h * hk + 3 * h * i
    return llm.num_layers * per_layer + llm.vocab_size * h


def _vit_matmul_params(vit) -> float:
    h, i = vit.hidden_size, vit.intermediate_size
    per_layer = 4 * h * h + 2 * h * i
    # patch embed + merger are <2% at these shapes; include patch embed
    pd = vit.in_channels * vit.temporal_patch_size * vit.patch_size ** 2
    return vit.num_layers * per_layer + pd * h


def train_step_model_flops(cfg, n_frames: int, seq: int, px: int,
                           n_vis: int) -> dict:
    """Analytic MODEL FLOPs of one fwd+bwd LoRA microbatch.

    LoRA convention — 4 * frozen_matmul_params * tokens (2 fwd + 2
    input-grad bwd; the dW matmuls are SKIPPED for the frozen base, XLA
    dead-code-eliminates them) + 3x-forward attention (dQ/dK/dV are input
    grads, always needed) + negligible adapter terms. The naive 6N
    full-finetune convention overstates a LoRA step's model FLOPs by 1.5x.
    Remat recompute NOT counted — it inflates hardware FLOPs, not model
    FLOPs.

    The reference runs this same shape on 8xA100 via torch+deepspeed
    (Qwen/scripts/train_and_eval.sh); MFU here = model_flops / time /
    chip_peak."""
    t = n_frames // 2
    g = px // 14
    full_tokens = t * g * g
    small_tokens = full_tokens // 4
    vit_tokens = full_tokens + small_tokens
    vit_mm = 4 * vit_tokens * _vit_matmul_params(cfg.vit)
    # per-frame block-diagonal attention (full res frames: g*g tokens;
    # pooled: g*g/4), fwd+bwd = 3 * fwd, fwd = 4 * S_f^2 * h per layer
    h_v = cfg.vit.hidden_size
    vit_attn = 3.0 * cfg.vit.num_layers * 4 * h_v * (
        t * (g * g) ** 2 + t * (g * g // 4) ** 2)
    dec_mm = 4 * seq * _llm_matmul_params(cfg.llm)
    # causal attention: fwd = 4 * S^2 * h / 2
    dec_attn = 3.0 * cfg.llm.num_layers * 2 * seq * seq * cfg.llm.hidden_size
    total = vit_mm + vit_attn + dec_mm + dec_attn
    return {
        "vit_matmul_tflop": vit_mm / 1e12,
        "vit_attn_tflop": vit_attn / 1e12,
        "decoder_matmul_tflop": dec_mm / 1e12,
        "decoder_attn_tflop": dec_attn / 1e12,
        "total_tflop": total / 1e12,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--lora-rank", type=int, default=64)
    ap.add_argument("--arch", choices=["2b", "7b"], default="2b",
                    help="7b = Qwen2-VL-7B int8 base (QLoRA) at production "
                         "shapes: pass --frames 240 --seq 14000 --px 448")
    ap.add_argument("--px", type=int, default=224,
                    help="frame side; 448 = the reference eval/train "
                         "max_pixels (4*224^2)")
    ap.add_argument("--vit-chunk", type=int, default=8,
                    help="frame-pairs per checkpointed ViT chunk")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims on CPU (script logic check)")
    ap.add_argument("--remat-group", type=int, default=0,
                    help="decoder remat group size (0 = auto: 2 for long "
                         "seqs). Larger = fewer saved boundaries but a "
                         "bigger backward working set")
    ap.add_argument("--ce-chunk", type=int, default=512)
    ap.add_argument("--mlp-chunk", type=int, default=0,
                    help="MLP seq-chunk (0 = OFF, the fast default: at "
                         "remat-group 4 chunking no longer lowers the AOT "
                         "peak but re-dequantizes the int4 MLP weights per "
                         "chunk — measured 1.78x slower at 7B)")
    ap.add_argument("--memory-analysis", action="store_true",
                    help="AOT-compile the step and print the XLA HBM "
                         "breakdown (args/temps/peak) WITHOUT executing — "
                         "the way to fit a 16 GB budget without OOM loops")
    ap.add_argument("--offload-moments", action="store_true",
                    help="rest Adam moments in pinned host memory between "
                         "steps (zero*_offload parity): shrinks the "
                         "device-resident argument footprint when the "
                         "shared chip's ambient HBM ceiling is low")
    ap.add_argument("--base-bits", type=int, choices=[4, 8], default=4,
                    help="frozen-base precision for --arch 7b. 4 (default) "
                         "= packed int4, QLoRA parity with the reference's "
                         "bnb 4-bit base — an int8 base peaks at 15.8 GiB, "
                         "above the ~15.2 GiB the runtime actually grants")
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
    elif args.arch == "7b":
        # production shapes: full Flash memory config, 7B decoder with an
        # int8 (QLoRA) base — a bf16 7B base cannot co-reside with training
        # state on one 16 GB chip
        cfg = VStreamQwenConfig(
            vit=dataclasses.replace(QWEN2_VL_VIT, merger_out_dim=3584),
            llm=LLMConfig(vocab_size=152064, hidden_size=3584,
                          intermediate_size=18944, num_layers=28,
                          num_heads=28, num_kv_heads=4, attention_bias=True,
                          rope_theta=1e6, mrope_sections=(16, 24, 24)),
            flash_memory=FlashMemoryConfig(),
        )
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
    if args.arch == "7b" and not args.tiny:
        from bench_answer_latency import build_int8_7b
        tiny_llm = dataclasses.replace(
            cfg.llm, num_layers=2, hidden_size=256, intermediate_size=512,
            num_heads=4, num_kv_heads=2, vocab_size=512,
            mrope_sections=(8, 12, 12))
        params = init_qwen_params(jax.random.PRNGKey(0),
                                  cfg.replace(llm=tiny_llm),
                                  dtype=jnp.bfloat16)
        params["llm"] = build_int8_7b(cfg.llm, jax.random.PRNGKey(1),
                                      jnp.bfloat16, bits=args.base_bits)
        # lm_head stays quantized: the vocab-tiled online-LSE CE never
        # materializes the bf16 head copy (models/llm.py
        # cross_entropy_loss_chunked vocab_tile)
        # quantized embedding (gather-time dequant): frozen under LoRA, and
        # the bf16 table is 1.09 GB of the argument budget (int8 0.54,
        # int4 0.27)
        if args.base_bits == 4:
            from flash_vstream_tpu.weights.quantize import quantize_weight4
            params["llm"]["embed"] = quantize_weight4(params["llm"]["embed"])
        else:
            from flash_vstream_tpu.weights.quantize import quantize_weight
            params["llm"]["embed"] = quantize_weight(params["llm"]["embed"])
        # quantized ViT: the tower is frozen under LoRA (reference excludes
        # it from LoRA targets, finetune_flash.py:544-554) — QLoRA treatment
        # shrinks another 1.26 GB (bf16) of arguments by 2-4x
        vit_targets = (r"layers/attn/w[qkvo]/w$", r"layers/mlp/fc[12]/w$",
                       r"merger/fc[12]/w$")
        if args.base_bits == 4:
            from flash_vstream_tpu.weights.quantize import quantize_params4
            params["vit"] = quantize_params4(params["vit"],
                                             targets=vit_targets)
        else:
            from flash_vstream_tpu.weights.quantize import quantize_params
            params["vit"] = quantize_params(params["vit"],
                                            targets=vit_targets)
    else:
        params = init_qwen_params(jax.random.PRNGKey(0), cfg,
                                  dtype=jnp.bfloat16)
    lora = init_lora_params(jax.random.PRNGKey(1), params,
                            rank=args.lora_rank, targets=QWEN_TARGETS)

    side_grid = 4 if args.tiny else args.px // 14
    t, gh, gw = args.frames // 2, side_grid, side_grid
    grid = (t, gh, gw)
    pd = 3 * 2 * 14 * 14
    dam = min(t, cfg.flash_memory.dam_grid_len) * gh * gw // 4
    csm = min(t, cfg.flash_memory.csm_grid_len) * (gh // 2) * (gw // 2) // 4
    n_vis = dam + csm
    S = args.seq
    start = 16
    assert start + n_vis < S

    def loss_fn(lora_params, batch, key, base):
        # mixed-precision LoRA: f32 master adapters + f32 Adam moments, but
        # bf16 factors inside the model so the decoder backward's cotangent
        # chains stay bf16 (f32 adapters leaked ~0.9 GB of f32 temps into
        # the 16 GB budget; grads still arrive f32 via the cast's VJP)
        lora_params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                   lora_params)
        eff = lora_views(base, lora_params, alpha=32, rank=args.lora_rank)
        # uint8 patches normalize per ViT chunk on device: halves the
        # biggest input argument (269 -> 135 MB at 240f/448px)
        from flash_vstream_tpu.preprocess.image import qwen_patch_norm
        vis = encode_video(eff, cfg, batch["patches"], grid, key=key,
                           vit_chunk=args.vit_chunk, vit_remat=True,
                           patch_norm=qwen_patch_norm())
        ids = batch["ids"][None]
        embeds = embed_tokens(eff["llm"], ids)
        embeds = jnp.concatenate([
            embeds[:, :start],
            vis.video_embeds[None].astype(embeds.dtype),
            embeds[:, start + n_vis:]], axis=1)
        positions, _ = build_qwen_positions(S, start, n_vis,
                                            vis.visual_positions)
        long_seq = S >= 8192
        # remat group 4 from the AOT memory_analysis sweep; MLP chunking
        # off by default (same 13.4 GiB peak at group 4, and chunking
        # re-dequantized the int4 MLP weights per chunk: 1.78x slower, r5)
        h, _ = decoder_forward(
            eff["llm"], cfg.llm, embeds, positions, remat=True,
            mlp_seq_chunk=args.mlp_chunk,
            remat_group=args.remat_group or (4 if long_seq else 1))
        if S * cfg.llm.vocab_size > 1 << 26:
            from flash_vstream_tpu.models.llm import (
                cross_entropy_loss_chunked)
            return cross_entropy_loss_chunked(eff["llm"], cfg.llm, h,
                                              batch["labels"][None],
                                              chunk=args.ce_chunk)
        logits = lm_head(eff["llm"], cfg.llm, h)
        return cross_entropy_loss(logits, batch["labels"][None])

    tcfg = TrainConfig(learning_rate=8e-4, total_steps=100,
                       grad_accum=args.accum, warmup_ratio=0.0,
                       mu_dtype="bfloat16" if args.arch == "7b" else None,
                       offload_moments=args.offload_moments)
    trainer = Trainer(loss_fn, lora, tcfg, mesh=create_mesh(dp=1, tp=1),
                      frozen=params)

    rng = np.random.default_rng(0)
    batch = {
        # patches per microbatch: [t*gh*gw, pd] RAW uint8 (window-layout
        # pixels, preprocess.qwen_patchify_u8); normalization happens per
        # ViT chunk inside the step
        "patches": jnp.asarray(rng.integers(
            0, 256, (args.accum, t * gh * gw, pd), dtype=np.uint8)),
        "ids": jnp.asarray(rng.integers(1, cfg.llm.vocab_size - 1,
                                        (args.accum, S))),
        "labels": jnp.asarray(rng.integers(1, cfg.llm.vocab_size - 1,
                                           (args.accum, S))),
    }

    if args.memory_analysis:
        key = jax.random.PRNGKey(0)
        with trainer.mesh:
            fn = trainer._train_step
            if hasattr(fn, "grad_jit"):
                # --offload-moments runs a two-phase step (plain function);
                # the grad phase is the activation-heavy HBM peak
                lowered = fn.grad_jit.lower(trainer.params, batch, key,
                                            trainer.frozen)
            else:
                lowered = fn.lower(trainer.params, trainer.opt_state, batch,
                                   key, trainer.frozen)
            t0 = time.perf_counter()
            compiled = lowered.compile()
            m = compiled.memory_analysis()
        gb = 1 << 30
        print(json.dumps({
            "metric": f"train_step_{args.arch}_memory",
            "base_bits": args.base_bits if args.arch == "7b" else 16,
            "frames": args.frames, "seq": S, "grad_accum": args.accum,
            "argument_gb": round(m.argument_size_in_bytes / gb, 2),
            "output_gb": round(m.output_size_in_bytes / gb, 2),
            "temp_gb": round(m.temp_size_in_bytes / gb, 2),
            "alias_gb": round(getattr(m, "alias_size_in_bytes", 0) / gb, 2),
            # TPU program code occupies HBM alongside buffers — a large
            # scanned/unrolled program eats real gigabytes of the budget
            "code_gb": round(getattr(m, "generated_code_size_in_bytes", 0)
                             / gb, 2),
            "peak_gb": round((m.argument_size_in_bytes
                              + m.temp_size_in_bytes) / gb, 2),
            "compile_s": round(time.perf_counter() - t0, 1),
        }))
        return

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
    # achieved MFU: analytic model FLOPs (6*params*tokens convention, remat
    # recompute excluded) / step time / v5e bf16 peak (VERDICT r4 next #2)
    fl = train_step_model_flops(cfg, args.frames, S, args.px, n_vis)
    step_tflop = args.accum * fl["total_tflop"]
    from flash_vstream_tpu.runtime.metrics import V5E_BF16_TFLOPS
    achieved = step_tflop / p50
    print(json.dumps({
        "metric": f"train_step_{args.arch}_lora",
        "base_bits": args.base_bits if args.arch == "7b" else 16,
        "frames": args.frames, "seq": S, "grad_accum": args.accum,
        "visual_tokens": int(n_vis),
        "step_p50_s": round(p50, 3),
        "tokens_per_s": round(tok_per_step / p50, 1),
        "model_tflop_per_step": round(step_tflop, 1),
        "achieved_tflops": round(achieved, 1),
        "mfu_pct_v5e_bf16": round(100 * achieved / V5E_BF16_TFLOPS, 1),
        "flop_convention": "lora-4N (dW skipped for frozen base) + 3x-fwd "
                           "attention; remat recompute excluded",
        "flop_split_tflop": {k: round(v * args.accum, 1)
                             for k, v in fl.items() if k != "total_tflop"},
        "first_step_s": round(compile_s, 1),
        "final_loss": round(float(loss), 3),
    }))


if __name__ == "__main__":
    main()
