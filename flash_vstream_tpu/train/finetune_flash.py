"""Qwen-family LoRA finetuning entry.

CLI rebuild of Flash-VStream-Qwen/finetune_flash.py: ChatML supervision with
the video block expanded to the predicted post-compression token count
(preprocess L190-364), LoRA over LLM projections + merger (L544-578),
per-sample batch with gradient accumulation (bs 1 x ga 8, ZeRO-2 ->
dp-sharded Adam moments), checkpoint auto-resume, merged-weight export.

--dry-run runs the tiny config on synthetic frames.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np

from ..core.config import IGNORE_INDEX


def build_synthetic_dataset(path: str, n_items: int = 8, n_frames: int = 6,
                            side: int = 56):
    os.makedirs(os.path.join(path, "frames"), exist_ok=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    items = []
    for i in range(n_items):
        vid = f"v{i}"
        d = os.path.join(path, "frames", vid)
        os.makedirs(d, exist_ok=True)
        for t in range(n_frames):
            Image.fromarray(rng.integers(0, 255, (side, side, 3),
                                         dtype=np.uint8)
                            ).save(os.path.join(d, f"{t:06d}.jpg"))
        items.append({
            "id": i, "video": vid,
            "conversations": [
                {"from": "human", "value": f"<video>\nDescribe video {i}."},
                {"from": "gpt", "value": f"It shows scene {i}."},
            ],
        })
    data_path = os.path.join(path, "train.json")
    with open(data_path, "w") as f:
        json.dump(items, f)
    return data_path, os.path.join(path, "frames")


def preprocess_qwen_sample(item: dict, tokenizer, cfg, grid,
                           max_len: int = 512):
    """ChatML ids + labels (assistant-only supervision) + video span.

    Mirrors finetune_flash.py:190-364's hand-built token stream."""
    from ..preprocess.qwen_processor import build_video_prompt
    convs = item["conversations"]
    q = convs[0]["value"].replace("<video>", "").replace("<image>", "").strip()
    a = convs[1]["value"]
    input_ids, span = build_video_prompt(cfg, tokenizer, q, grid=grid)
    if hasattr(tokenizer, "special_id"):
        ans_ids = tokenizer.encode(a, add_bos=False) + [tokenizer.eos_token_id]
    else:
        ans_ids = tokenizer.encode(a, add_special_tokens=False) + [
            tokenizer.eos_token_id]
    ids = np.concatenate([input_ids, np.asarray(ans_ids, np.int64)])
    labels = np.full_like(ids, IGNORE_INDEX)
    labels[len(input_ids):] = ids[len(input_ids):]
    return ids[:max_len], labels[:max_len], span


def run_training(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..core.config import (FlashMemoryConfig, VStreamQwenConfig,
                               tiny_qwen_config)
    from ..models.llm import cross_entropy_loss
    from ..models.vstream_qwen import init_qwen_params, qwen_forward_train
    from ..parallel.sharding import create_mesh
    from ..preprocess.image import qwen_preprocess
    from ..preprocess.qwen_processor import make_byte_qwen_tokenizer
    from ..preprocess.video import load_video
    from ..utils.logging import build_logger
    from . import recipes
    from .checkpoint import (latest_checkpoint, restore_checkpoint,
                             save_checkpoint)
    from .lora import QWEN_TARGETS, init_lora_params, merge_lora
    from .trainer import Trainer
    from ..models.vstream_qwen import build_qwen_positions

    logger = build_logger("finetune_flash")

    if args.dry_run:
        cfg = tiny_qwen_config()
        params = init_qwen_params(jax.random.PRNGKey(0), cfg)
        tokenizer = make_byte_qwen_tokenizer()
        if not args.data_path:
            args.data_path, args.video_dir = build_synthetic_dataset(
                os.path.join(args.output_dir, "synthetic"))
    else:
        from ..preprocess.tokenizer import load_tokenizer
        from ..weights.convert import load_qwen_checkpoint
        cfg = VStreamQwenConfig()
        if args.flash_memory_dict:
            cfg = cfg.replace(flash_memory=FlashMemoryConfig.from_dict(
                json.loads(args.flash_memory_dict)))
        params = load_qwen_checkpoint(args.model_path, cfg,
                                      dtype=jnp.bfloat16)
        tokenizer = load_tokenizer(args.model_path)

    items = json.load(open(args.data_path))
    mesh = create_mesh(dp=len(jax.devices()), tp=1)
    total_steps = args.max_steps or max(
        len(items) // args.grad_accum, 1) * args.epochs
    tcfg = dataclasses.replace(
        recipes.qwen_lora(total_steps, args.grad_accum),
        learning_rate=args.learning_rate)

    lora = init_lora_params(jax.random.PRNGKey(1), params,
                            rank=args.lora_rank, targets=QWEN_TARGETS)
    alpha, rank = args.lora_alpha, args.lora_rank

    # variable grids -> one jitted loss per (grid, seq-len) bucket; samples
    # resize to a common resolution so the grid is constant, and ids pad to
    # --max-len
    max_len = args.max_len

    # pin ONE training resolution so every sample shares a grid (one
    # compiled step): smart-resize of the first video's resolution
    from ..preprocess.image import smart_resize, _resize_bilinear, _to_float_chw
    _first = load_video(os.path.join(args.video_dir, items[0]["video"]),
                        max_frames=1)[0]
    _h, _w = np.asarray(_first).shape[:2]
    train_hw = smart_resize(_h, _w, factor=56, max_pixels=args.max_pixels)

    def prepare(item):
        src = load_video(os.path.join(args.video_dir, item["video"]),
                         max_frames=args.max_frames)
        frames = list(src)
        # pad to a fixed frame count so every sample shares one grid (one
        # compiled step); short videos repeat their last frame, like the
        # reference's FRAME_FACTOR padding (vision_process.py:118-222)
        target = args.frame_bucket or args.max_frames
        while len(frames) < target:
            frames.append(frames[-1])
        # force the pinned resolution (mixed-resolution datasets would
        # otherwise produce per-sample grids and break batching)
        frames = [np.clip(_resize_bilinear(_to_float_chw(np.asarray(f)),
                                           train_hw) * 255, 0, 255)
                  .transpose(1, 2, 0).astype(np.uint8)
                  if np.asarray(f).shape[:2] != train_hw else np.asarray(f)
                  for f in frames]
        patches, grid = qwen_preprocess(frames, max_pixels=args.max_pixels)
        ids, labels, span = preprocess_qwen_sample(item, tokenizer, cfg, grid,
                                                   max_len)
        pad = max_len - len(ids)
        seg = np.concatenate([np.zeros(len(ids), np.int32),
                              np.full(pad, -1, np.int32)])
        ids = np.pad(ids, (0, pad))
        labels = np.pad(labels, (0, pad), constant_values=IGNORE_INDEX)
        return patches, grid, ids, labels, span, seg

    def make_loss(grid, span):
        def loss_fn(lora_params, batch, key):
            eff = merge_lora(params, lora_params, alpha=alpha, rank=rank)
            vis_key = key
            from ..models.vstream_qwen import encode_video
            vis = encode_video(eff, cfg, batch["patches"], grid, key=vis_key)
            positions, _ = build_qwen_positions(max_len, span[0], span[1],
                                                vis.visual_positions)
            from ..models.llm import decoder_forward, embed_tokens, lm_head
            ids = batch["ids"][None]
            embeds = embed_tokens(eff["llm"], ids)
            start, n_vis = span
            embeds = jnp.concatenate([
                embeds[:, :start],
                vis.video_embeds[None].astype(embeds.dtype),
                embeds[:, start + n_vis:]], axis=1)
            h, _ = decoder_forward(eff["llm"], cfg.llm, embeds, positions,
                                   segment_ids=batch["seg"][None], remat=True)
            logits = lm_head(eff["llm"], cfg.llm, h)
            return cross_entropy_loss(logits, batch["labels"][None])
        return loss_fn

    # build the trainer lazily from the first sample's shapes
    first = prepare(items[0])
    trainer = Trainer(make_loss(first[1], first[4]), lora, tcfg, mesh=mesh)

    start_step = 0
    if latest_checkpoint(args.output_dir):
        step, payload = restore_checkpoint(
            args.output_dir, template={"params": trainer.params,
                                       "opt_state": trainer.opt_state})
        trainer.params, trainer.opt_state = (payload["params"],
                                             payload["opt_state"])
        start_step = step
        logger.info(f"resumed from checkpoint-{step}")

    import jax.numpy as jnp2
    losses = []
    idx = start_step * args.grad_accum
    for step in range(start_step, total_steps):
        micro = []
        for _ in range(args.grad_accum):
            patches, grid, ids, labels, span, seg = prepare(
                items[idx % len(items)])
            idx += 1
            micro.append((patches, ids, labels, seg))
        # batch leaves: [grad_accum, ...] for the trainer's accumulation scan
        batch = {
            "patches": jnp2.asarray(np.stack([m[0] for m in micro])),
            "ids": jnp2.asarray(np.stack([m[1] for m in micro])),
            "labels": jnp2.asarray(np.stack([m[2] for m in micro])),
            "seg": jnp2.asarray(np.stack([m[3] for m in micro])),
        }
        loss = trainer.run_step(batch, jax.random.PRNGKey(step))
        losses.append(loss)
        logger.info(f"step {step + 1}/{total_steps} loss={loss:.4f}")
        if (step + 1) % args.save_steps == 0 or step + 1 == total_steps:
            save_checkpoint(args.output_dir, step + 1, trainer.params,
                            trainer.opt_state)

    if args.export_merged:
        from .checkpoint import export_safetensors
        merged = merge_lora(params, trainer.params, alpha=alpha, rank=rank)
        export_safetensors(os.path.join(args.output_dir,
                                        "model_merged.safetensors"), merged)

    return {"final_loss": losses[-1] if losses else None, "losses": losses}


def make_parser():
    p = argparse.ArgumentParser(description="Flash-VStream Qwen LoRA finetune")
    p.add_argument("--model-path", default=None)
    p.add_argument("--data-path", default=None)
    p.add_argument("--video-dir", default="")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=32)
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--grad-accum", type=int, default=8)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--max-frames", type=int, default=240)
    p.add_argument("--frame-bucket", type=int, default=None,
                   help="fixed frame count per sample (defaults to max-frames)")
    p.add_argument("--max-pixels", type=int, default=4 * 224 * 224)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--flash-memory-dict", default=None)
    p.add_argument("--export-merged", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    return p


def main(argv=None):
    run_training(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
