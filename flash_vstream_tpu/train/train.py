"""Training entry point (LLaVA-family recipes).

CLI rebuild of Flash-VStream-LLaVA/flash_vstream/train/train.py: two-stage
training (pretrain = projector/NTM only with the 'plain' template; finetune =
everything but the vision tower with vicuna_v1), length-grouped batching,
checkpoint auto-resume. Runs on a dp x tp mesh with ZeRO-sharded optimizer
states instead of DeepSpeed.

Training consumes precomputed ViT features (the reference's canonical
feature-mode pipeline, train.py:700-760), raw video frame dirs (the frozen
tower runs inside the loss, train.py:764-793), single images
(train.py:694-716), and text-only conversations — each modality gets its own
fixed-shape compiled step. --dry-run trains the tiny config on synthetic
data (--synthetic-raw for the frames/image/text branches).
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


def build_synthetic_raw_dataset(path: str, n_videos: int = 4,
                                n_images: int = 2, n_text: int = 2,
                                n_frames: int = 4, side: int = 112):
    """Synthetic raw media: JPEG frame dirs + single images + text-only
    conversations, exercising every dataset branch (reference
    train.py:679-816)."""
    from PIL import Image
    media = os.path.join(path, "media")
    os.makedirs(media, exist_ok=True)
    rng = np.random.default_rng(0)
    items = []
    for i in range(n_videos):
        d = os.path.join(media, f"v{i}")
        os.makedirs(d, exist_ok=True)
        for t in range(n_frames):
            Image.fromarray(rng.integers(0, 255, (side, side, 3),
                                         dtype=np.uint8)
                            ).save(os.path.join(d, f"{t:06d}.jpg"))
        items.append({
            "id": f"v{i}", "video": f"v{i}",
            "conversations": [
                {"from": "human", "value": f"<image>\nWhat is in video {i}?"},
                {"from": "gpt", "value": f"Scene {i} with motion."}]})
    for i in range(n_images):
        name = f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
                        ).save(os.path.join(media, name))
        items.append({
            "id": f"i{i}", "image": name,
            "conversations": [
                {"from": "human", "value": f"<image>\nDescribe image {i}."},
                {"from": "gpt", "value": f"A colorful pattern {i}."}]})
    for i in range(n_text):
        items.append({
            "id": f"t{i}",
            "conversations": [
                {"from": "human", "value": f"Say the number {i}."},
                {"from": "gpt", "value": f"The number is {i}."}]})
    data_path = os.path.join(path, "train.json")
    with open(data_path, "w") as f:
        json.dump(items, f)
    return data_path, media


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
                       collate_text, length_grouped_indices,
                       proportional_schedule, spliced_labels,
                       spliced_segments)
    from .trainer import Trainer

    logger = build_logger("train")

    if args.dry_run:
        cfg = tiny_llava_config()
        params = init_llava_params(jax.random.PRNGKey(0), cfg)
        tokenizer = ByteTokenizer()
        if not args.data_path:
            if args.synthetic_raw:
                args.data_path, args.video_dir = build_synthetic_raw_dataset(
                    os.path.join(args.output_dir, "synthetic"),
                    side=cfg.vit.image_size)
            else:
                args.data_path, args.feature_dir = build_synthetic_dataset(
                    os.path.join(args.output_dir, "synthetic"), tokenizer)
    else:
        from ..weights.convert import load_llava_checkpoint
        cfg = VStreamLLaVAConfig()
        params = load_llava_checkpoint(args.model_path, cfg,
                                       dtype=jnp.bfloat16)
        tokenizer = load_tokenizer(args.model_path)

    dcfg = DataConfig(
        data_path=args.data_path, video_dir=args.video_dir,
        feature_dir=args.feature_dir,
        video_max_frames=args.video_max_frames,
        conv_version="plain" if args.stage == "pretrain" else "v1",
        frame_bucket=args.frame_bucket,
        image_size=cfg.vit.image_size)
    dataset = SupervisedVideoDataset(dcfg, tokenizer)

    # modality groups: videos (features or raw frames), single images, and
    # text-only conversations each get their own fixed-shape compiled step
    # (reference branches per item, train.py:679-816; TPU-first = one jit
    # per modality bucket, steps homogeneous)
    groups = {"video": [], "image": [], "text": []}
    for i, item in enumerate(dataset.items):
        m = ("video" if "video" in item
             else "image" if "image" in item else "text")
        groups[m].append(i)
    groups = {m: idxs for m, idxs in groups.items() if idxs}

    tp = args.tp
    mesh = create_mesh(dp=len(jax.devices()) // tp, tp=tp)
    bsz = args.batch_size * mesh.shape["dp"]
    steps_per_epoch = max(len(dataset) // (bsz * args.grad_accum), 1)
    total_steps = args.max_steps or steps_per_epoch * args.epochs

    tcfg = (recipes.llava_pretrain if args.stage == "pretrain"
            else recipes.llava_finetune)(total_steps, args.grad_accum)
    import dataclasses
    tcfg = dataclasses.replace(tcfg, zero_stage=args.zero_stage,
                           offload_moments=args.offload_moments)
    if args.learning_rate:
        tcfg = dataclasses.replace(tcfg, learning_rate=args.learning_rate)

    n_mem = sum(star_valid_counts(cfg, args.frame_bucket))
    grid = cfg.vit.image_size // cfg.vit.patch_size
    n_img = grid * grid // (4 if cfg.projector.use_4_vision_tokens else 1)
    pad_id = tokenizer.pad_token_id or 0
    pre_len, post_len = args.pre_len, args.post_len
    image_slot = pre_len

    def _decode_loss(params, embeds, segments, labels):
        B, S = embeds.shape[:2]
        pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        h, _ = decoder_forward(params["llm"], cfg.llm, embeds, pos,
                               segment_ids=segments, remat=True)
        return cross_entropy_loss(lm_head(params["llm"], cfg.llm, h), labels)

    def _splice(params, ids, visual):
        ids = jnp.maximum(ids, 0)                  # image slot id is -200
        return jnp.concatenate([
            embed_tokens(params["llm"], ids[:, :image_slot]),
            visual.astype(params["llm"]["embed"].dtype),
            embed_tokens(params["llm"], ids[:, image_slot + 1:])], axis=1)

    def video_loss(params, batch, key):
        if "frames" in batch:
            # raw-frame branch: the frozen tower runs inside the loss
            # (reference raw-video dataset branch, train.py:764-793)
            from ..preprocess.image import clip_device_preprocess
            B, T = batch["frames"].shape[:2]
            flat = batch["frames"].reshape(B * T, *batch["frames"].shape[2:])
            images = clip_device_preprocess(flat)
            feats = vstream_llava.encode_frames(params, cfg, images)
            feats = feats.reshape(B, T, *feats.shape[1:])
        else:
            feats = batch["images"]                # [B, T, P, D] precomputed

        def one(feat, n, k):
            mem = vstream_llava.consolidate(params, cfg, feat, n, k)
            return pack_memory_tokens(mem, n_mem)
        mems = jax.vmap(one)(feats, batch["n_frames"],
                             jax.random.split(key, feats.shape[0]))
        mem_proj = project(params["projector"], cfg.projector, mems)
        embeds = _splice(params, batch["input_ids"], mem_proj)
        return _decode_loss(params, embeds, batch["segments"],
                            batch["labels"])

    def image_loss(params, batch, key):
        # single-image branch: full patch features, no memory compression
        # (reference image branch train.py:694-716 + vstream_arch.py:333-336)
        from ..models.clip_vit import clip_encode
        from ..ops.pooling import merge_2x2_tokens
        from ..preprocess.image import clip_device_preprocess
        imgs = clip_device_preprocess(batch["image"])
        feats = clip_encode(params["vit"], cfg.vit, imgs)   # [B, P, D]
        if cfg.projector.use_4_vision_tokens:
            feats = merge_2x2_tokens(feats)
        proj = project(params["projector"], cfg.projector, feats)
        embeds = _splice(params, batch["input_ids"], proj)
        return _decode_loss(params, embeds, batch["segments"],
                            batch["labels"])

    def text_loss(params, batch, key):
        embeds = embed_tokens(params["llm"],
                              jnp.maximum(batch["input_ids"], 0))
        return _decode_loss(params, embeds, batch["segments"],
                            batch["labels"])

    MODALITY_LOSS = {"video": video_loss, "image": image_loss,
                     "text": text_loss}
    main_modality = next(iter(groups))
    trainer = Trainer(MODALITY_LOSS[main_modality], params, tcfg, mesh=mesh)
    step_fns = {main_modality: trainer._train_step}
    for m in groups:
        if m not in step_fns:
            step_fns[m] = trainer.compile_step(MODALITY_LOSS[m])

    start_step = 0
    if latest_checkpoint(args.output_dir):
        step, payload = restore_checkpoint(
            args.output_dir, template={"params": trainer.params,
                                       "opt_state": trainer.opt_state})
        trainer.load_state(payload["params"], payload["opt_state"])
        start_step = step
        logger.info(f"resumed from checkpoint-{step}")

    # length-grouped order within each modality group (the reference's
    # LengthGroupedSampler separates modalities at the megabatch level,
    # vstream_trainer.py:117-148; here every step is modality-homogeneous)
    all_lengths = dataset.modality_lengths()
    orders = {}
    for m, idxs in groups.items():
        sub = length_grouped_indices([abs(all_lengths[i]) for i in idxs],
                                     args.batch_size, mesh.shape["dp"])
        orders[m] = [idxs[j] for j in sub]

    def make_group(modality: str, idx0: int):
        group, idx, order = [], idx0, orders[modality]
        for _ in range(args.grad_accum):
            samples = [dataset[order[(idx + j) % len(order)]]
                       for j in range(bsz)]
            idx += bsz
            if modality == "text":
                group.append(collate_text(samples, pad_id,
                                          fixed_len=args.text_len))
                continue
            b = collate_llava(samples, args.frame_bucket, pad_id,
                              fixed_pre_len=pre_len, fixed_post_len=post_len)
            n_vis = n_img if modality == "image" else n_mem
            out = {
                "input_ids": b["input_ids"],
                "labels": spliced_labels(b, n_vis),
                "segments": spliced_segments(b, n_vis, pad_id),
            }
            if modality == "image":
                out["image"] = b["image"]
            elif "features" in b:
                out["images"] = b["features"]
                out["n_frames"] = b["n_frames"]
            else:
                out["frames"] = b["frames"]
                out["n_frames"] = b["n_frames"]
            group.append(out)
        stacked = {k: jnp.asarray(np.stack([g[k] for g in group]))
                   for k in group[0]}
        return stacked, idx

    modalities = list(groups)
    # steps interleave modalities proportionally to group size (largest-
    # remainder pick): the reference's sampler draws uniformly over the
    # dataset, so a 10k-video / 10-text dataset must NOT train text 1/3 of
    # the time the way a round-robin would
    schedule = proportional_schedule(
        {m: len(groups[m]) for m in modalities}, total_steps)
    cursors = {m: 0 for m in modalities}
    for s in range(start_step):                   # checkpoint-stable resume
        cursors[schedule[s]] += bsz * args.grad_accum

    # host-side batch assembly (decode/collate) overlaps device compute on
    # a prefetch thread (the reference's DataLoader workers, train.py:1031)
    from ..utils.prefetch import BackgroundPrefetcher

    def make_step_batch(step: int):
        m = schedule[step]
        batch, cursors[m] = make_group(m, cursors[m])
        return m, batch

    losses = []
    from .reporting import ScalarsWriter, StepProfiler, lr_at
    scalars = ScalarsWriter(args.scalars_file or
                            os.path.join(args.output_dir, "scalars.jsonl"))
    profiler = StepProfiler(args.profile_dir, start_step, args.profile_steps)
    prefetch = BackgroundPrefetcher(make_step_batch, start_step, total_steps)
    try:
        for step, (m, batch) in zip(range(start_step, total_steps), prefetch):
            t0 = time.time()
            profiler.before_step(step)
            loss = trainer.run_step(batch, jax.random.PRNGKey(step),
                                    step_fn=step_fns[m])
            profiler.after_step(step)
            dt = time.time() - t0
            losses.append(loss)
            scalars.write(step + 1, loss=loss, lr=lr_at(tcfg, step),
                          step_time_s=dt, modality=m,
                          samples_per_s=bsz * args.grad_accum / max(dt, 1e-9))
            logger.info(f"step {step + 1}/{total_steps} [{m}] "
                        f"loss={loss:.4f} ({dt:.2f}s)")
            if (step + 1) % args.save_steps == 0 or step + 1 == total_steps:
                save_checkpoint(args.output_dir, step + 1, trainer.params,
                                trainer.opt_state)
    finally:
        # unblock the producer thread if the loop exits early (an exception
        # in run_step would otherwise leave it stuck on the bounded queue)
        prefetch.close()
        profiler.close()
        scalars.close()

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
    p.add_argument("--text-len", type=int, default=512,
                   help="fixed sequence length for text-only batches")
    p.add_argument("--save-steps", type=int, default=100)
    p.add_argument("--scalars-file", type=str, default=None,
                   help="JSONL scalars stream (default: "
                        "<output-dir>/scalars.jsonl)")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler device trace here "
                        "(TensorBoard-loadable)")
    p.add_argument("--profile-steps", type=int, default=3,
                   help="trace window length in steps (with --profile-dir)")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--zero-stage", type=int, default=2, choices=(1, 2, 3),
                   help="1/2: dp-sharded Adam moments, replicated params "
                        "(reference zero2.json); 3: FSDP — params dp-sharded"
                        " too, gathered per layer on use (zero3.json)")
    p.add_argument("--offload-moments", action="store_true",
                   help="rest Adam moments in HOST memory between steps\n"
                        "(pinned_host; reference zero*_offload.json): frees\n"
                        "their HBM share for full-parameter finetunes at the\n"
                        "cost of per-step PCIe streaming")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--synthetic-raw", action="store_true",
                   help="dry-run on raw frame dirs + images + text instead "
                        "of precomputed features")
    return p


def main(argv=None):
    run_training(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
