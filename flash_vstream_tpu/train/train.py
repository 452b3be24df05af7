"""Training entry point (LLaVA-family recipes).

CLI rebuild of Flash-VStream-LLaVA/flash_vstream/train/train.py: two-stage
training (pretrain = projector/NTM only with the 'plain' template; finetune =
everything but the vision tower with vicuna_v1), length-grouped batching,
checkpoint auto-resume. Runs on a dp x tp mesh with ZeRO-sharded optimizer
states instead of DeepSpeed.

Training consumes precomputed ViT features (the reference's feature-mode
pipeline, train.py:700-760, which is also its canonical recipe: features are
extracted once, training never re-runs the frozen tower). --dry-run trains
the tiny config on synthetic data.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_synthetic_dataset(path: str, tokenizer, n_items: int = 16,
                            n_frames: int = 6, feat_shape=(64, 32)):
    """Synthetic conversations + features for dry runs."""
    os.makedirs(os.path.join(path, "feats"), exist_ok=True)
    items = []
    rng = np.random.default_rng(0)
    for i in range(n_items):
        vid = f"v{i}"
        np.save(os.path.join(path, "feats", vid + ".npy"),
                rng.normal(size=(n_frames, *feat_shape)).astype(np.float32))
        items.append({
            "id": i, "video": vid,
            "conversations": [
                {"from": "human", "value": f"<image>\nWhat is in video {i}?"},
                {"from": "gpt", "value": f"Scene number {i} with motion."},
            ],
        })
    data_path = os.path.join(path, "train.json")
    with open(data_path, "w") as f:
        json.dump(items, f)
    return data_path, os.path.join(path, "feats")


def run_training(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..core.config import VStreamLLaVAConfig, tiny_llava_config
    from ..models import vstream_llava
    from ..models.llm import (cross_entropy_loss, decoder_forward,
                              embed_tokens, lm_head)
    from ..models.projector import project
    from ..models.vstream_llava import (init_llava_params, pack_memory_tokens,
                                        star_valid_counts)
    from ..parallel.sharding import create_mesh
    from ..preprocess.tokenizer import ByteTokenizer, load_tokenizer
    from ..utils.logging import build_logger
    from . import recipes
    from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
    from .data import (DataConfig, SupervisedVideoDataset, collate_llava,
                       length_grouped_indices, spliced_labels,
                       spliced_segments)
    from .trainer import Trainer

    logger = build_logger("train")

    if args.dry_run:
        cfg = tiny_llava_config()
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        tokenizer = ByteTokenizer()
        if not args.data_path:
            args.data_path, args.feature_dir = build_synthetic_dataset(
                os.path.join(args.output_dir, "synthetic"), tokenizer)
    else:
        from ..weights.convert import load_llava_checkpoint
        cfg = VStreamLLaVAConfig()
        params = load_llava_checkpoint(args.model_path, cfg,
                                       dtype=jnp.bfloat16)
        tokenizer = load_tokenizer(args.model_path)
    assert args.feature_dir, "training consumes precomputed features"

    dcfg = DataConfig(
        data_path=args.data_path, video_dir=args.video_dir,
        feature_dir=args.feature_dir,
        video_max_frames=args.video_max_frames,
        conv_version="plain" if args.stage == "pretrain" else "v1",
        frame_bucket=args.frame_bucket)
    dataset = SupervisedVideoDataset(dcfg, tokenizer)

    tp = args.tp
    mesh = create_mesh(dp=len(jax.devices()) // tp, tp=tp)
    bsz = args.batch_size * mesh.shape["dp"]
    steps_per_epoch = max(len(dataset) // (bsz * args.grad_accum), 1)
    total_steps = args.max_steps or steps_per_epoch * args.epochs

    tcfg = (recipes.llava_pretrain if args.stage == "pretrain"
            else recipes.llava_finetune)(total_steps, args.grad_accum)
    if args.learning_rate:
        import dataclasses
        tcfg = dataclasses.replace(tcfg, learning_rate=args.learning_rate)

    n_mem = sum(star_valid_counts(cfg, args.frame_bucket))
    pad_id = tokenizer.pad_token_id or 0
    pre_len, post_len = args.pre_len, args.post_len
    image_slot = pre_len

    def loss_fn(params, batch, key):
        feats = batch["images"]                    # [B, T, P, D]
        B = feats.shape[0]

        def one(feat, n, k):
            mem = vstream_llava.consolidate(params, cfg, feat, n, k)
            return pack_memory_tokens(mem, n_mem)
        mems = jax.vmap(one)(feats, batch["n_frames"],
                             jax.random.split(key, B))
        mem_proj = project(params["projector"], cfg.projector, mems)
        ids = jnp.maximum(batch["input_ids"], 0)   # image slot id is -200
        embeds = jnp.concatenate([
            embed_tokens(params["llm"], ids[:, :image_slot]),
            mem_proj.astype(params["llm"]["embed"].dtype),
            embed_tokens(params["llm"], ids[:, image_slot + 1:])], axis=1)
        S = embeds.shape[1]
        pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        h, _ = decoder_forward(params["llm"], cfg.llm, embeds, pos,
                               segment_ids=batch["segments"], remat=True)
        return cross_entropy_loss(lm_head(params["llm"], cfg.llm, h),
                                  batch["labels"])

    trainer = Trainer(loss_fn, params, tcfg, mesh=mesh)

    start_step = 0
    if latest_checkpoint(args.output_dir):
        step, payload = restore_checkpoint(
            args.output_dir, template={"params": trainer.params,
                                       "opt_state": trainer.opt_state})
        trainer.params, trainer.opt_state = payload["params"], payload["opt_state"]
        start_step = step
        logger.info(f"resumed from checkpoint-{step}")

    order = length_grouped_indices(dataset.modality_lengths(),
                                   args.batch_size, mesh.shape["dp"])

    def make_group(idx0: int):
        group, idx = [], idx0
        for _ in range(args.grad_accum):
            samples = [dataset[order[(idx + j) % len(order)]]
                       for j in range(bsz)]
            idx += bsz
            b = collate_llava(samples, args.frame_bucket, pad_id,
                              fixed_pre_len=pre_len, fixed_post_len=post_len)
            group.append({
                "images": b["features"],
                "n_frames": b["n_frames"],
                "input_ids": b["input_ids"],
                "labels": spliced_labels(b, n_mem),
                "segments": spliced_segments(b, n_mem, pad_id),
            })
        stacked = {k: jnp.asarray(np.stack([g[k] for g in group]))
                   for k in group[0]}
        return stacked, idx

    losses = []
    idx = start_step * bsz * args.grad_accum
    for step in range(start_step, total_steps):
        batch, idx = make_group(idx)
        t0 = time.time()
        loss = trainer.run_step(batch, jax.random.PRNGKey(step))
        losses.append(loss)
        logger.info(f"step {step + 1}/{total_steps} loss={loss:.4f} "
                    f"({time.time() - t0:.2f}s)")
        if (step + 1) % args.save_steps == 0 or step + 1 == total_steps:
            save_checkpoint(args.output_dir, step + 1, trainer.params,
                            trainer.opt_state)

    return {"final_loss": losses[-1] if losses else None,
            "losses": losses, "steps": total_steps}


def make_parser():
    p = argparse.ArgumentParser(description="Flash-VStream TPU training")
    p.add_argument("--stage", choices=["pretrain", "finetune"],
                   default="finetune")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--video-dir", type=str, default="")
    p.add_argument("--feature-dir", type=str, default=None)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=1,
                   help="per-dp-shard microbatch size")
    p.add_argument("--grad-accum", type=int, default=1)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--video-max-frames", type=int, default=50)
    p.add_argument("--frame-bucket", type=int, default=16)
    p.add_argument("--pre-len", type=int, default=64,
                   help="fixed pre-image text length (left-padded)")
    p.add_argument("--post-len", type=int, default=192,
                   help="fixed post-image text length (right-padded)")
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dry-run", action="store_true")
    return p


def main(argv=None):
    run_training(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
