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


def build_synthetic_dataset(path: str, n_items: int = 8, n_frames=6,
                            side: int = 56, n_images: int = 0):
    """n_frames: one fixed length, or a per-item list (mixed lengths
    exercise the frame-count bucketing). n_images appends still-image items
    (mixed image+video finetuning data)."""
    os.makedirs(os.path.join(path, "frames"), exist_ok=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    items = []
    lens = (n_frames if isinstance(n_frames, (list, tuple))
            else [n_frames] * n_items)
    for i in range(n_items):
        vid = f"v{i}"
        d = os.path.join(path, "frames", vid)
        os.makedirs(d, exist_ok=True)
        for t in range(lens[i % len(lens)]):
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
    for i in range(n_images):
        name = f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
                        ).save(os.path.join(path, "frames", name))
        items.append({
            "id": n_items + i, "image": name,
            "conversations": [
                {"from": "human", "value": f"<image>\nDescribe image {i}."},
                {"from": "gpt", "value": f"It shows object {i}."},
            ],
        })
    data_path = os.path.join(path, "train.json")
    with open(data_path, "w") as f:
        json.dump(items, f)
    return data_path, os.path.join(path, "frames")


def preprocess_qwen_sample(item: dict, tokenizer, cfg, grid,
                           max_len: int = 512,
                           system_message: str = "You are a helpful assistant.",
                           kind: str = "video"):
    """Multi-turn ChatML ids + labels + video span.

    Mirrors the reference's hand-built token stream
    (Flash-VStream-Qwen/finetune_flash.py:190-364): the system block and all
    user turns are IGNORE; the FIRST user turn carries the expanded
    <|vision_start|><|video_pad|>*N<|vision_end|> block; every assistant turn
    supervises its answer tokens + <|im_end|> but not the role header or the
    trailing newline. kind="image" expands an <|image_pad|> block instead
    (h*w//4 tokens — the full merged patch grid, no Flash memory)."""
    from ..models.vstream_qwen import image_token_count, visual_token_count
    from ..preprocess.qwen_processor import (IM_END, IM_START,
                                             VISION_END, VISION_START,
                                             _image_pad_id, _video_pad_id)

    def enc(text):
        if hasattr(tokenizer, "special_id"):
            return tokenizer.encode(text, add_bos=False)
        return tokenizer.encode(text, add_special_tokens=False)

    if kind == "image":
        pad_tok = _image_pad_id(tokenizer, cfg)
        n_vis = image_token_count(grid[1], grid[2])
    else:
        pad_tok = _video_pad_id(tokenizer, cfg)
        dam, csm = visual_token_count(cfg, *grid)
        n_vis = dam + csm

    ids, labels = [], []
    system = enc(f"{IM_START}system\n{system_message}{IM_END}\n")
    ids += system
    labels += [IGNORE_INDEX] * len(system)

    span = None
    first_user = True
    for turn in item["conversations"]:
        who = turn["from"]
        text = turn["value"].replace("<video>\n", "").replace(
            "<image>\n", "").replace("<video>", "").replace("<image>", "")
        if who in ("human", "user"):
            if first_user:
                first_user = False
                head = enc(f"{IM_START}user\n{VISION_START}")
                tail = enc(f"{VISION_END}{text}{IM_END}\n")
                span = (len(ids) + len(head), n_vis)
                seq = head + [pad_tok] * n_vis + tail
            else:
                seq = enc(f"{IM_START}user\n{text}{IM_END}\n")
            ids += seq
            labels += [IGNORE_INDEX] * len(seq)
        else:
            prefix = enc(f"{IM_START}assistant\n")
            body = enc(text) + enc(IM_END)
            nl = enc("\n")
            ids += prefix + body + nl
            labels += ([IGNORE_INDEX] * len(prefix) + body
                       + [IGNORE_INDEX] * len(nl))
    assert span is not None, "conversation has no user turn"
    assert span[0] + span[1] <= max_len, (
        f"video block [{span[0]}, {span[0] + span[1]}) truncated by "
        f"max_len={max_len}")
    ids = np.asarray(ids, np.int64)
    labels = np.asarray(labels, np.int64)
    return ids[:max_len], labels[:max_len], span


def run_training(args) -> dict:
    import jax
    import jax.numpy as jnp

    from ..core.config import (FlashMemoryConfig, VStreamQwenConfig,
                               tiny_qwen_config)
    from ..models.llm import cross_entropy_loss
    from ..models.vstream_qwen import init_qwen_params
    from ..parallel.sharding import create_mesh
    from ..preprocess.image import qwen_preprocess
    from ..preprocess.qwen_processor import make_byte_qwen_tokenizer
    from ..preprocess.video import load_video
    from ..utils.logging import build_logger
    from . import recipes
    from .checkpoint import (latest_checkpoint, restore_checkpoint,
                             save_checkpoint)
    from .lora import (QWEN_TARGETS, init_lora_params, lora_views,
                       merge_lora)
    from .trainer import Trainer

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
        if args.int8_base and args.base_bits == 4:
            # QLoRA at the reference's base precision (bnb 4-bit +
            # LoRA): packed int4 with block input scales — what fits the
            # 240-frame/448px/14k-token production step on one 16 GB chip
            from ..weights.quantize import quantize_params4
            params = quantize_params4(params)
        elif args.int8_base:
            # QLoRA: frozen base in weight-only int8 (the reference's
            # bnb 4/8-bit + LoRA combination); adapters stay bf16/f32
            from ..weights.quantize import quantize_params
            params = quantize_params(params)
        tokenizer = load_tokenizer(args.model_path)

    items = json.load(open(args.data_path))
    if args.pp > 1 or args.sp > 1:
        from ..parallel.sharding import create_train_mesh
        mesh = create_train_mesh(pp=args.pp, sp=args.sp)
        logger.info(f"mesh: {dict(mesh.shape)} "
                    f"({'GPipe stages' if args.pp > 1 else 'ring attention'}"
                    f" x data parallel)")
    else:
        mesh = create_mesh(dp=len(jax.devices()), tp=1)
    total_steps = args.max_steps or max(
        len(items) // args.grad_accum, 1) * args.epochs
    tcfg = dataclasses.replace(
        recipes.qwen_lora(total_steps, args.grad_accum),
        learning_rate=args.learning_rate, zero_stage=args.zero_stage,
        offload_moments=args.offload_moments)

    lora = init_lora_params(jax.random.PRNGKey(1), params,
                            rank=args.lora_rank, targets=QWEN_TARGETS)
    alpha, rank = args.lora_alpha, args.lora_rank

    # variable grids -> (RESOLUTION x FRAME-COUNT) BUCKETS: items group by
    # their smart-resize target AND a frame-count rung; each bucket gets its
    # own jitted train step (shared params/optimizer state). Mixed-resolution
    # datasets train at their native aspect ratios (the reference resizes per
    # sample, vision_process.py:44-70), and short videos pad to the nearest
    # rung instead of running max_frames (240) worth of ViT compute.
    # The default max_len matches the reference's model_max_length
    # (Qwen/scripts/train_and_eval.sh:52: 14000 — the default eval memory
    # config at 448 px yields ~11.5k visual tokens, so anything shorter
    # truncates the video block on real datasets).
    max_len = args.max_len or (512 if args.dry_run else 14000)
    from ..preprocess.image import smart_resize, _resize_bilinear, _to_float_chw
    from ..preprocess.video import probe_video_hw, probe_video_len

    def frame_rung(n: int) -> int:
        if args.frame_bucket:                  # explicit fixed bucket
            return args.frame_bucket
        for b in (args.max_frames // 8, args.max_frames // 4,
                  args.max_frames // 2, args.max_frames):
            b = max(b + b % 2, 2)              # temporal PAIRS need even
            if n <= b:
                return b
        return args.max_frames

    def bucket_of(item):
        if "image" in item:
            # still-image samples: frame rung 0 marks the image modality
            # (mixed image+video finetuning; images bypass Flash memory)
            from PIL import Image
            with Image.open(os.path.join(args.video_dir, item["image"])) as f:
                w, h = f.size
            return (smart_resize(h, w, factor=56,
                                 max_pixels=args.max_pixels), 0)
        path = os.path.join(args.video_dir, item["video"])
        h, w = probe_video_hw(path)
        n = min(probe_video_len(path), args.max_frames)
        return (smart_resize(h, w, factor=56, max_pixels=args.max_pixels),
                frame_rung(n))

    buckets: dict = {}
    for item in items:
        buckets.setdefault(bucket_of(item), []).append(item)
    logger.info(f"(resolution, frames) buckets: "
                f"{ {bk: len(v) for bk, v in buckets.items()} }")

    def prepare(item, bk):
        train_hw, target = bk
        if target == 0:                            # image bucket
            from PIL import Image
            img = np.asarray(Image.open(os.path.join(
                args.video_dir, item["image"])).convert("RGB"))
            if img.shape[:2] != train_hw:
                img = np.clip(_resize_bilinear(_to_float_chw(img), train_hw)
                              * 255, 0, 255).transpose(1, 2, 0).astype(
                    np.uint8)
            # qwen_patchify pads the single frame across the temporal patch
            patches, grid = qwen_preprocess([img],
                                            max_pixels=args.max_pixels)
            ids, labels, span = preprocess_qwen_sample(
                item, tokenizer, cfg, grid, max_len, kind="image")
            pad = max_len - len(ids)
            seg = np.concatenate([np.zeros(len(ids), np.int32),
                                  np.full(pad, -1, np.int32)])
            ids = np.pad(ids, (0, pad))
            labels = np.pad(labels, (0, pad), constant_values=IGNORE_INDEX)
            return patches, grid, ids, labels, span, seg
        src = load_video(os.path.join(args.video_dir, item["video"]),
                         max_frames=target)
        frames = list(src)
        # pad to the bucket's fixed frame count so the bucket shares one
        # grid (one compiled step); short videos repeat their last frame,
        # like the reference's FRAME_FACTOR padding (vision_process.py:118-222)
        while len(frames) < target:
            frames.append(frames[-1])
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

    def make_loss(grid, span, kind="video"):
        # n_vis (span[1]) is bucket-constant (fixed grid); the splice START
        # is NOT — items in a bucket have different question lengths — so it
        # rides the batch as a traced scalar (vis_start) and the splice +
        # rope math use the dynamic forms. One compiled step per bucket.
        n_vis = span[1]

        def one_sample(lora_params, base, patches, ids, labels, seg,
                       vis_start, key):
            # merge-free views: no full merged copy in HBM, backward only
            # touches the rank-r factors (train/lora.LoRAWeight). `base`
            # arrives as a jit ARGUMENT via the trainer's frozen tree —
            # closing over it would capture the full model as HLO constants
            # (gigabytes of serialization per compile; see CLAUDE.md)
            # mixed-precision LoRA: f32 master adapters (Adam state) but
            # bf16 factors in the model, keeping the decoder backward's
            # cotangent chains bf16 (~0.9 GB of f32 temps at 240f/448px/12k
            # otherwise — measured by AOT memory_analysis)
            lora_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), lora_params)
            eff = lora_views(base, lora_params, alpha=alpha, rank=rank)
            from ..models.vstream_qwen import encode_image, encode_video
            if kind == "image":
                # still image: full patch grid, no Flash memory, standard
                # mm rope block (mm_grid_index) — build_qwen_positions
                # splices any visual block by the same resume-at-max+1 rule
                vis = encode_image(eff, cfg, patches, (grid[1], grid[2]))
            else:
                # frame-chunked + checkpointed ViT: at real shapes (240
                # frames @448px) a monolithic encode's saved activations
                # cannot fit one chip; chunking over frames is exact
                # (per-frame attention)
                vis = encode_video(eff, cfg, patches, grid, key=key,
                                   vit_chunk=args.vit_chunk, vit_remat=True)
            from ..models.vstream_qwen import (build_qwen_positions_dynamic,
                                               splice_embeds_dynamic)
            positions, _ = build_qwen_positions_dynamic(
                max_len, vis_start, n_vis, vis.visual_positions)
            from ..models.llm import decoder_forward, embed_tokens, lm_head
            embeds = embed_tokens(eff["llm"], ids[None])
            embeds = splice_embeds_dynamic(embeds, vis.video_embeds,
                                           vis_start)
            # remat group 4 from the AOT memory_analysis sweep at production
            # shapes. MLP seq-chunking is OFF: at group 4 it no longer
            # lowers the peak (13.39 GiB unchunked == 13.41 chunked, AOT
            # @240f/448px/14k) while the serialized chunks re-dequantize the
            # int4 MLP weights per chunk — measured 1.78x slower
            # (13.4 -> 7.6 s/step at the seq-8k probe shape, r5)
            h, _ = decoder_forward(eff["llm"], cfg.llm, embeds, positions,
                                   segment_ids=seg[None], remat=True,
                                   remat_group=4 if max_len >= 8192 else 1)
            if max_len * cfg.llm.vocab_size > 1 << 26:
                # production shapes (14k x 152k vocab): full f32 logits are
                # 8.5 GB — chunked CE keeps one [chunk, vocab] block live,
                # and int8 (QLoRA) heads additionally tile the vocab axis
                # so the bf16 dequant of the head never materializes
                from ..models.llm import cross_entropy_loss_chunked
                return cross_entropy_loss_chunked(eff["llm"], cfg.llm, h,
                                                  labels[None], chunk=512)
            logits = lm_head(eff["llm"], cfg.llm, h)
            return cross_entropy_loss(logits, labels[None])

        def encode_one(eff, patches, ids, vis_start, key):
            """Visual encode + splice + positions for ONE sample (vmapped);
            returns ([S, D] embeds, [3, S] positions) for the batched
            decoder used by the pp/sp paths."""
            from ..models.llm import embed_tokens
            from ..models.vstream_qwen import (build_qwen_positions_dynamic,
                                               encode_image, encode_video,
                                               splice_embeds_dynamic)
            if kind == "image":
                vis = encode_image(eff, cfg, patches, (grid[1], grid[2]))
            else:
                vis = encode_video(eff, cfg, patches, grid, key=key,
                                   vit_chunk=args.vit_chunk, vit_remat=True)
            positions, _ = build_qwen_positions_dynamic(
                max_len, vis_start, n_vis, vis.visual_positions)
            embeds = embed_tokens(eff["llm"], ids[None])
            embeds = splice_embeds_dynamic(embeds, vis.video_embeds,
                                           vis_start)
            return embeds[0], positions[:, 0, :]

        def loss_fn_mp(lora_params, batch, key, base):
            """pp/sp loss: per-sample visual encode (vmapped), then ONE
            batched decoder under shard_map — GPipe stages or a ring over
            the sequence, composing with the dp axis (manual-subset
            shard_map; the outer pjit keeps batch/ZeRO shardings)."""
            from ..models.llm import (cross_entropy_loss as ce2, lm_head)
            from ..parallel.pipeline import pipeline_decoder_forward
            from ..parallel.sequence import sp_decoder_forward
            B = batch["ids"].shape[0]
            lp16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                                lora_params)
            eff = lora_views(base, lp16, alpha=alpha, rank=rank)
            embeds, pos = jax.vmap(
                encode_one, in_axes=(None, 0, 0, 0, 0))(
                eff, batch["patches"], batch["ids"], batch["vis_start"],
                jax.random.split(key, B))
            pos = pos.transpose(1, 0, 2)              # [3, B, S]
            if args.pp > 1:
                h = pipeline_decoder_forward(
                    eff["llm"], cfg.llm, embeds, pos, mesh=mesh,
                    n_micro=B, segment_ids=batch["seg"], remat=True)
            else:
                h = sp_decoder_forward(
                    eff["llm"], cfg.llm, embeds, pos, mesh=mesh,
                    segment_ids=batch["seg"], remat=True)
            if max_len * cfg.llm.vocab_size > 1 << 26:
                from ..models.llm import cross_entropy_loss_chunked
                return cross_entropy_loss_chunked(eff["llm"], cfg.llm, h,
                                                  batch["labels"], chunk=512)
            return ce2(lm_head(eff["llm"], cfg.llm, h), batch["labels"])

        def loss_fn(lora_params, batch, key, base):
            # batch leaves [B, ...]; B = per-shard bsz x dp (the trainer
            # shards this dim over the dp mesh axis)
            B = batch["ids"].shape[0]
            losses = jax.vmap(one_sample,
                              in_axes=(None, None, 0, 0, 0, 0, 0, 0))(
                lora_params, base, batch["patches"], batch["ids"],
                batch["labels"], batch["seg"], batch["vis_start"],
                jax.random.split(key, B))
            return jnp.mean(losses)
        return loss_fn_mp if (args.pp > 1 or args.sp > 1) else loss_fn

    # one compiled step per bucket (grid+span fixed within a bucket); the
    # largest bucket builds the Trainer, the rest share its state
    order = sorted(buckets, key=lambda hw: -len(buckets[hw]))
    first_hw = order[0]
    first = prepare(buckets[first_hw][0], first_hw)

    def kind_of(bk):
        return "image" if bk[1] == 0 else "video"

    trainer = Trainer(make_loss(first[1], first[4], kind_of(first_hw)), lora,
                      tcfg, mesh=mesh, frozen=params)
    step_fns = {first_hw: trainer._train_step}

    def step_fn_for(hw):
        if hw not in step_fns:
            probe = prepare(buckets[hw][0], hw)
            step_fns[hw] = trainer.compile_step(
                make_loss(probe[1], probe[4], kind_of(hw)))
        return step_fns[hw]

    start_step = 0
    if latest_checkpoint(args.output_dir):
        step, payload = restore_checkpoint(
            args.output_dir, template={"params": trainer.params,
                                       "opt_state": trainer.opt_state})
        trainer.load_state(payload["params"], payload["opt_state"])
        start_step = step
        logger.info(f"resumed from checkpoint-{step}")

    import jax.numpy as jnp2
    losses = []
    # per-step microbatch: [grad_accum, B, ...] with B = bsz x dp so the
    # trainer shards samples over the dp mesh axis (reference ZeRO-2 data
    # parallel: bs 1/GPU x ga 8 x 8 GPUs, scripts/train_and_eval.sh:55-59)
    B = args.batch_size * mesh.shape["dp"]
    # deterministic schedule: each step draws from one resolution bucket,
    # buckets interleaved proportionally to their size (largest-remainder
    # pick, so a 9:1 dataset trains its buckets 9:1, matching the
    # reference's uniform-over-dataset sampling)
    from .data import proportional_schedule
    cursors = {hw: 0 for hw in order}
    schedule = proportional_schedule(
        {hw: len(buckets[hw]) for hw in order}, total_steps)
    # resume: replay the consumed prefix so data order is checkpoint-stable
    for s in range(start_step):
        cursors[schedule[s]] += args.grad_accum * B
    def make_step_batch(step: int):
        hw = schedule[step]
        bucket_items = buckets[hw]
        micro = []
        for _ in range(args.grad_accum):
            rows = []
            for _ in range(B):
                rows.append(prepare(
                    bucket_items[cursors[hw] % len(bucket_items)], hw))
                cursors[hw] += 1
            micro.append(tuple(np.stack([r[i] for r in rows])
                               for i in (0, 2, 3, 5))
                         + (np.asarray([r[4][0] for r in rows], np.int32),))
        batch = {
            "patches": jnp2.asarray(np.stack([m[0] for m in micro])),
            "ids": jnp2.asarray(np.stack([m[1] for m in micro])),
            "labels": jnp2.asarray(np.stack([m[2] for m in micro])),
            "seg": jnp2.asarray(np.stack([m[3] for m in micro])),
            "vis_start": jnp2.asarray(np.stack([m[4] for m in micro])),
        }
        return hw, batch

    # frame decode + patchify for the NEXT step overlaps device compute
    from ..utils.prefetch import BackgroundPrefetcher
    from .reporting import ScalarsWriter, StepProfiler, lr_at
    scalars = ScalarsWriter(args.scalars_file or
                            os.path.join(args.output_dir, "scalars.jsonl"))
    profiler = StepProfiler(args.profile_dir, start_step, args.profile_steps)
    prefetch = BackgroundPrefetcher(make_step_batch, start_step, total_steps)
    try:
        for step, (hw, batch) in zip(range(start_step, total_steps),
                                     prefetch):
            t0 = time.time()
            profiler.before_step(step)
            loss = trainer.run_step(batch, jax.random.PRNGKey(step),
                                    step_fn=step_fn_for(hw))
            profiler.after_step(step)
            dt = time.time() - t0
            losses.append(loss)
            scalars.write(step + 1, loss=loss, lr=lr_at(tcfg, step),
                          step_time_s=dt,
                          bucket=f"{hw[0][0]}x{hw[0][1]}x{hw[1]}f",
                          tokens_per_s=B * args.grad_accum * max_len
                          / max(dt, 1e-9))
            logger.info(f"step {step + 1}/{total_steps} loss={loss:.4f} "
                        f"bucket={hw} B={B}")
            if (step + 1) % args.save_steps == 0 or step + 1 == total_steps:
                save_checkpoint(args.output_dir, step + 1, trainer.params,
                                trainer.opt_state)
    finally:
        # unblock the producer thread if the loop exits early (an exception
        # in run_step would otherwise leave it stuck on the bounded queue)
        prefetch.close()
        profiler.close()
        scalars.close()

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
    p.add_argument("--batch-size", type=int, default=1,
                   help="per-dp-shard microbatch size (total = this x dp)")
    p.add_argument("--int8-base", action="store_true",
                   help="QLoRA: quantize the frozen base to weight-only "
                        "int8 (halves base HBM; bnb-bits analog)")
    p.add_argument("--base-bits", type=int, choices=[4, 8], default=4,
                   help="with --int8-base: frozen-base precision. 4 "
                        "(default, reference bnb-4bit parity) = packed "
                        "int4 block-128 — required headroom for the "
                        "240-frame production step on one chip; 8 = "
                        "weight-only int8")
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=32)
    p.add_argument("--learning-rate", type=float, default=8e-4)
    p.add_argument("--grad-accum", type=int, default=8)
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over a 'pp' mesh "
                        "axis; layers shard across stages, microbatches "
                        "flow over ICI). Composes with dp = devices/pp. "
                        "Requires num_layers %% pp == 0")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel width (ring attention over an "
                        "'sp' mesh axis; each chip holds seq/sp tokens — "
                        "the long-video lever). Composes with dp = "
                        "devices/sp. Requires max_len %% sp == 0")
    p.add_argument("--zero-stage", type=int, default=2, choices=(1, 2, 3),
                   help="3 = FSDP (params + frozen base dp-sharded, "
                        "reference deepspeed/zero3_config.json); LoRA "
                        "adapters are small, so stage 3 mainly shards the "
                        "frozen base across the dp mesh")
    p.add_argument("--offload-moments", action="store_true",
                   help="rest Adam moments in HOST memory between steps\n"
                        "(pinned_host; reference zero*_offload.json): frees\n"
                        "their HBM share for full-parameter finetunes at the\n"
                        "cost of per-step PCIe streaming")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--max-frames", type=int, default=240)
    p.add_argument("--frame-bucket", type=int, default=None,
                   help="force ONE fixed frame count per sample; default: "
                        "auto rungs max_frames/{8,4,2,1} so short videos "
                        "skip most of the ViT padding compute")
    p.add_argument("--max-pixels", type=int, default=4 * 224 * 224)
    p.add_argument("--vit-chunk", type=int, default=8,
                   help="frame-pairs per checkpointed ViT chunk during "
                        "training (0 = monolithic encode)")
    p.add_argument("--max-len", type=int, default=None,
                   help="sequence length; default 14000 (reference "
                        "model_max_length, train_and_eval.sh:52) or 512 "
                        "under --dry-run")
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--scalars-file", type=str, default=None,
                   help="JSONL scalars stream (default: "
                        "<output-dir>/scalars.jsonl)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler device trace here "
                        "(TensorBoard-loadable)")
    p.add_argument("--profile-steps", type=int, default=3,
                   help="trace window length in steps (with --profile-dir)")
    p.add_argument("--flash-memory-dict", default=None)
    p.add_argument("--export-merged", action="store_true")
    p.add_argument("--dry-run", action="store_true")
    return p


def main(argv=None):
    run_training(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
