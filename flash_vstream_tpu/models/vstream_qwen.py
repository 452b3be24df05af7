"""Flash-VStream-Qwen composition: Qwen2-VL ViT + Flash memory + Qwen2 LLM.

Reference: FlashVStreamQwen2VLModel
(Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:326-943) and the realtime
variant (models/vstream_qwen2vl_realtime.py).

The visual pipeline (dual-resolution patch streams -> varlen ViT -> Flash
memory -> PatchMerger) is one jit per (t, h, w) bucket; grid math and prompt
token counts are host-side mirrors of get_real_grid_thw /
get_spatial_real_grid_thw (model.py:43-76).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import VStreamQwenConfig
from ..ops.pooling import qwen_temporal_pool
from .flash_memory import (
    FlashMemoryOutput,
    am_rope_visual_positions,
    cat_spa_tem,
    flash_consolidate,
)
from .llm import decoder_forward, embed_tokens, init_llm_params, lm_head
from .qwen2_vit import init_qwen_vit_params, patch_merger, qwen_vit_blocks_frames


def init_qwen_params(key: jax.Array, cfg: VStreamQwenConfig,
                     dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "vit": init_qwen_vit_params(k1, cfg.vit, dtype),
        "llm": init_llm_params(k2, cfg.llm, dtype),
    }


# ---------------------------------------------------------------------------
# Grid math (host-side mirrors of model.py:43-76)
# ---------------------------------------------------------------------------

def csm_grid(cfg: VStreamQwenConfig, t: int, h: int, w: int) -> Tuple[int, int, int]:
    fm = cfg.flash_memory
    nh, nw = h // 2, w // 2
    nh += nh % 2
    nw += nw % 2
    return (min(t, fm.csm_grid_len), nh, nw)


def dam_grid(cfg: VStreamQwenConfig, t: int, h: int, w: int) -> Tuple[int, int, int]:
    return (min(t, cfg.flash_memory.dam_grid_len), h, w)


def visual_token_count(cfg: VStreamQwenConfig, t: int, h: int, w: int
                       ) -> Tuple[int, int]:
    """(dam_tokens, csm_tokens) in LLM space (grid.prod() // 4 each,
    model.py:889-898)."""
    dt, dh, dw = dam_grid(cfg, t, h, w)
    ct, ch, cw = csm_grid(cfg, t, h, w)
    return dt * dh * dw // 4, ct * ch * cw // 4


def image_token_count(h: int, w: int) -> int:
    """LLM tokens for one still image: the full patch grid merged 2x2.
    Images bypass Flash memory (no temporal axis to consolidate)."""
    return h * w // 4


def mm_grid_index(t: int, h: int, w: int) -> np.ndarray:
    """Standard Qwen2-VL 3D rope index over an LLM-space grid
    (get_mm_index, vstream_qwen2vl_model.py:889-898): (t, h//2, w//2)
    enumerated row-major. Returns [3, t*h*w//4] int64."""
    gh, gw = h // 2, w // 2
    t_idx = np.repeat(np.arange(t), gh * gw)
    h_idx = np.tile(np.repeat(np.arange(gh), gw), t)
    w_idx = np.tile(np.arange(gw), t * gh)
    return np.stack([t_idx, h_idx, w_idx]).astype(np.int64)


# ---------------------------------------------------------------------------
# Visual encoder pipeline
# ---------------------------------------------------------------------------

class QwenVisualOutput(NamedTuple):
    video_embeds: jnp.ndarray       # [n_visual, llm_hidden]
    visual_positions: jnp.ndarray   # [3, n_visual] AM-RoPE block positions


def encode_video(
    params: dict,
    cfg: VStreamQwenConfig,
    patches: jnp.ndarray,        # [t*h*w, pd] raw patchified pixels
    grid: Tuple[int, int, int],  # static (t, h, w)
    *,
    key: jax.Array,
    vit_chunk: int = 0,          # >0: frame-chunked encode (exact; frames
                                 # are independent through the block stack)
    vit_remat: bool = False,     # checkpoint each chunk (training memory)
    patch_norm=None,             # (scale_pd, shift_pd): patches arrive
                                 # UINT8 (preprocess.qwen_patchify_u8) and
                                 # normalize per chunk on device — halves
                                 # the train step's largest input argument.
                                 # The low-res temporal pool is linear and
                                 # affine-preserving, so pooling raw u8
                                 # then normalizing is the same transform.
) -> QwenVisualOutput:
    """Dual-resolution ViT encode + Flash memory + merger for one video.

    Mirrors FlashVStreamQwen2VisionTransformerPretrainedModel.forward
    (model.py:388-428): the pooled low-res stream is concatenated into the
    same varlen batch, attention is per frame (segment ids), then FlashMemory
    consolidates and PatchMerger projects to LLM space."""
    t, h, w = grid
    D = cfg.vit.hidden_size

    norm_fn = None
    if patch_norm is not None:
        scale_pd = jnp.asarray(patch_norm[0], jnp.float32)
        shift_pd = jnp.asarray(patch_norm[1], jnp.float32)

        def norm_fn(p):
            return (p.astype(jnp.float32) * scale_pd
                    + shift_pd).astype(jnp.bfloat16)

    # f32 pool for uint8 input: averaging raw 0-255 values in bf16 loses
    # mantissa bits (integer sums pass 256), a measured 4e-3 mean drift in
    # the final embeds; the small stream is cheap enough to pool in f32
    pool_in = (patches.astype(jnp.float32)
               if patches.dtype == jnp.uint8 else patches)
    small, small_grid = qwen_temporal_pool(
        pool_in, grid, cfg.vit.patch_size, cfg.vit.temporal_patch_size,
        cfg.vit.in_channels)
    chunk = min(vit_chunk, t) if vit_chunk else 0
    while chunk > 1 and t % chunk:     # largest divisor of t <= vit_chunk
        chunk -= 1
    if chunk > 1 and chunk < t:
        from .qwen2_vit import qwen_vit_encode_frames_chunked
        pd = patches.shape[-1]
        x, sx = qwen_vit_encode_frames_chunked(
            params["vit"], cfg.vit,
            patches.reshape(t, h * w, pd),
            small.reshape(t, small_grid[1] * small_grid[2], pd),
            hw_full=(h, w), hw_small=(small_grid[1], small_grid[2]),
            chunk=chunk, remat=vit_remat, norm_fn=norm_fn)
    else:
        if norm_fn is not None:
            patches, small = norm_fn(patches), norm_fn(small)
        all_patches = jnp.concatenate([patches, small], axis=0)
        # attention is block-diagonal per temporal frame, so the
        # uniform-grid encoder batches frames instead of masking a padded
        # [S, S] problem
        hidden = qwen_vit_blocks_frames(
            params["vit"], cfg.vit, all_patches,
            t_full=t, hw_full=(h, w),
            t_small=small_grid[0], hw_small=(small_grid[1], small_grid[2]))
        n_full = t * h * w
        x = hidden[:n_full].reshape(t, h * w, D)
        sx = hidden[n_full:].reshape(t, small_grid[1] * small_grid[2], D)

    fm = flash_consolidate(cfg.flash_memory, x, sx, key=key)
    merged_in = cat_spa_tem(fm.spa_x, fm.tem_x)                     # [N_tok, D]
    video_embeds = patch_merger(params["vit"], merged_in)           # [N/4, llm]

    vis_pos = am_rope_visual_positions(
        fm.spa_positions, fm.tem_positions,
        (h, w), (small_grid[1], small_grid[2]))
    return QwenVisualOutput(video_embeds, vis_pos)


def encode_image(
    params: dict,
    cfg: VStreamQwenConfig,
    patches: jnp.ndarray,        # [h*w, pd] patchified pixels (t=1 grid;
                                 # qwen_patchify duplicates the single frame
                                 # across the temporal patch)
    grid_hw: Tuple[int, int],    # static (h, w) patch grid
    patch_norm=None,             # (scale_pd, shift_pd) for uint8 input
) -> QwenVisualOutput:
    """Still-image encode: varlen ViT on the (1, h, w) grid + PatchMerger.

    Beyond-reference capability: the reference's get_rope_index raises
    NotImplementedError on image tokens (vstream_qwen2vl_model.py:864-866)
    and its processor has no image path wired. Images take the standard
    Qwen2-VL route — full-resolution single-segment attention, NO Flash
    memory (nothing temporal to consolidate), standard mm rope index."""
    h, w = grid_hw
    from .qwen2_vit import grid_positions, grid_segments, qwen_vit_blocks
    if patch_norm is not None:
        scale_pd = jnp.asarray(patch_norm[0], jnp.float32)
        shift_pd = jnp.asarray(patch_norm[1], jnp.float32)
        patches = (patches.astype(jnp.float32) * scale_pd
                   + shift_pd).astype(jnp.bfloat16)
    pos = jnp.asarray(grid_positions([(1, h, w)]))
    seg = jnp.asarray(grid_segments([(1, h, w)]))
    hidden = qwen_vit_blocks(params["vit"], cfg.vit, patches, pos, seg)
    image_embeds = patch_merger(params["vit"], hidden)      # [h*w//4, llm]
    vis_pos = jnp.asarray(mm_grid_index(1, h, w), jnp.int32)
    return QwenVisualOutput(image_embeds, vis_pos)


# ---------------------------------------------------------------------------
# LLM integration
# ---------------------------------------------------------------------------

def splice_video_embeds(
    params: dict,
    cfg: VStreamQwenConfig,
    input_ids: np.ndarray,        # [S] host-side, with video-pad token block
    video_embeds: jnp.ndarray,    # [n_visual, llm_hidden]
    pad_id: Optional[int] = None,  # defaults to cfg.video_token_id; pass the
                                   # image pad id to splice an image block
) -> jnp.ndarray:
    """Replace the contiguous video-pad token block with video embeddings
    (model.py:528-538). Returns [1, S, llm_hidden]."""
    (vid_pos,) = np.where(input_ids == (
        cfg.video_token_id if pad_id is None else pad_id))
    assert len(vid_pos) == video_embeds.shape[0], (
        f"video token count {len(vid_pos)} != embeds {video_embeds.shape[0]}")
    start = int(vid_pos[0])
    assert np.array_equal(vid_pos, np.arange(start, start + len(vid_pos))), \
        "video tokens must be contiguous"
    ids = jnp.asarray(input_ids)[None]
    embeds = embed_tokens(params["llm"], ids)
    dtype = embeds.dtype
    return jnp.concatenate([
        embeds[:, :start],
        video_embeds[None].astype(dtype),
        embeds[:, start + len(vid_pos):],
    ], axis=1)


def build_qwen_positions(
    seq_len: int,
    video_start: int,
    n_visual: int,
    visual_positions: jnp.ndarray,   # [3, n_visual]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side 3D rope positions with the AM-RoPE visual block spliced in
    (mirror of get_rope_index, model.py:778-939, one video, batch 1).

    Returns ([3, 1, seq_len], rope_delta scalar). Text after the video resumes
    at max(visual)+1; rope_delta = max(pos)+1-seq_len feeds decode positions
    (prepare_inputs_for_generation, model.py:612-626)."""
    pre = jnp.broadcast_to(jnp.arange(video_start)[None], (3, video_start))
    vis = visual_positions + video_start
    tail_len = seq_len - video_start - n_visual
    st_idx = jnp.max(vis) + 1
    tail = st_idx + jnp.broadcast_to(jnp.arange(tail_len)[None], (3, tail_len))
    pos = jnp.concatenate([pre, vis, tail], axis=1)
    rope_delta = jnp.max(pos) + 1 - seq_len
    return pos[:, None, :], rope_delta


def build_qwen_positions_dynamic(
    seq_len: int,
    video_start: jnp.ndarray,        # [] int32 TRACED splice offset
    n_visual: int,                   # static (bucket-constant)
    visual_positions: jnp.ndarray,   # [3, n_visual]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """build_qwen_positions with a TRACED video start offset.

    One compiled train step serves a whole shape bucket even when items'
    pre-video text lengths differ (the reference recomputes get_rope_index
    per sample on host; here the offset is a device scalar and the splice
    rule — text counts to start, visual block offset by start, tail resumes
    at max+1 — is expressed as masks over a static [3, seq_len] grid).
    Returns ([3, 1, seq_len], rope_delta scalar)."""
    i = jnp.arange(seq_len)
    start = jnp.asarray(video_start, jnp.int32)
    j = jnp.clip(i - start, 0, n_visual - 1)
    vis_at = visual_positions[:, j]                     # [3, S]
    in_vis = (i >= start) & (i < start + n_visual)
    after = i >= start + n_visual
    st_idx = jnp.max(visual_positions) + start + 1
    text_after = st_idx + (i - start - n_visual)
    pos = jnp.where(in_vis[None], vis_at + start,
                    jnp.where(after[None], text_after[None],
                              jnp.broadcast_to(i[None], (3, seq_len))))
    rope_delta = jnp.max(pos) + 1 - seq_len
    return pos[:, None, :], rope_delta


def splice_embeds_dynamic(embeds: jnp.ndarray, visual: jnp.ndarray,
                          start: jnp.ndarray) -> jnp.ndarray:
    """Overwrite embeds[0, start:start+n_vis] with the visual block at a
    TRACED offset (pairs with build_qwen_positions_dynamic)."""
    return jax.lax.dynamic_update_slice(
        embeds, visual[None].astype(embeds.dtype), (0, start, 0))


def qwen_forward_train(
    params: dict,
    cfg: VStreamQwenConfig,
    patches: jnp.ndarray,
    grid: Tuple[int, int, int],
    input_ids: jnp.ndarray,       # [1, S]
    video_span: Tuple[int, int],  # static (start, n_visual)
    positions: jnp.ndarray,       # [3, 1, S] precomputed (AM-RoPE spliced)
    segment_ids: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Training forward -> logits. Positions come precomputed from
    prepare_inputs_for_training's host mirror (qwen_rope_positions)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    vis = encode_video(params, cfg, patches, grid, key=key)
    start, n_vis = video_span
    embeds = embed_tokens(params["llm"], input_ids)
    embeds = jnp.concatenate([
        embeds[:, :start],
        vis.video_embeds[None].astype(embeds.dtype),
        embeds[:, start + n_vis:],
    ], axis=1)
    h, _ = decoder_forward(params["llm"], cfg.llm, embeds, positions,
                           segment_ids=segment_ids, remat=remat)
    return lm_head(params["llm"], cfg.llm, h)
