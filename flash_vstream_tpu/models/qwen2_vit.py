"""Qwen2-VL vision transformer (Flash-VStream-Qwen generation).

Replaces FlashVStreamQwen2VisionTransformerPretrainedModel's block stack
(Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:326-428) TPU-natively:

- the varlen `cu_seqlens` attention over concatenated (video, frame) sequences
  becomes segment-id fused attention (one segment per temporal frame-pair,
  matching cu_seqlens = repeat_interleave(h*w, t), model.py:419-422);
- 2D rotary position tables and segment ids are computed host-side from the
  concrete grid_thw list (they are data-independent given grids) and fed to a
  single padded, jitted encoder — variable resolutions become shape buckets;
- the dual-resolution low-res pathway (temporal_pool) is concatenated into the
  same padded batch, exactly like the reference concatenates full+pooled
  streams into one varlen batch (model.py:395-414).

PatchMerger (2x2 token merge MLP) mirrors HF's PatchMerger.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import VitConfig
from .layers import (
    dense,
    gelu_mlp,
    init_dense,
    layer_norm,
    mha,
    vision_rope_angles,
)


def init_qwen_vit_params(key: jax.Array, cfg: VitConfig, dtype=jnp.float32) -> dict:
    D, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    pd = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    out_dim = cfg.merger_out_dim
    keys = jax.random.split(key, 8)

    def stack_init(k, din, dout):
        ks = jax.random.split(k, L)
        ps = [init_dense(ki, din, dout, bias=True, dtype=dtype) for ki in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    def ln(shape):
        return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}

    return {
        "patch_embed": {"w": jax.random.normal(keys[0], (pd, D), dtype) * 0.02},
        "layers": {
            "ln1": ln((L, D)), "ln2": ln((L, D)),
            "attn": {
                "wq": stack_init(keys[1], D, D),
                "wk": stack_init(keys[2], D, D),
                "wv": stack_init(keys[3], D, D),
                "wo": stack_init(keys[4], D, D),
            },
            "mlp": {
                "fc1": stack_init(keys[5], D, I),
                "fc2": stack_init(keys[6], I, D),
            },
        },
        "merger": {
            "ln_q": ln((D,)),
            "fc1": init_dense(keys[7], D * 4, D * 4, bias=True, dtype=dtype),
            "fc2": init_dense(jax.random.fold_in(key, 9), D * 4, out_dim,
                              bias=True, dtype=dtype),
        },
    }


# ---------------------------------------------------------------------------
# Host-side metadata from grid lists (concrete at input-preparation time)
# ---------------------------------------------------------------------------

def grid_positions(grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Per-token (h, w) positions for concatenated grids in Qwen window
    layout ([t, h/2, w/2, 2, 2] token order). Returns [S, 2] int32.

    Mirrors rot_pos_emb (vstream_qwen2vl_model.py:359-386)."""
    out = []
    for t, h, w in grid_thw:
        hb, wb = h // 2, w // 2
        hh = np.arange(2)
        hpos = (np.arange(hb)[:, None, None, None] * 2 + hh[None, None, :, None])
        hpos = np.broadcast_to(hpos, (hb, wb, 2, 2))
        wpos = (np.arange(wb)[None, :, None, None] * 2 + hh[None, None, None, :])
        wpos = np.broadcast_to(wpos, (hb, wb, 2, 2))
        pos = np.stack([hpos.reshape(-1), wpos.reshape(-1)], axis=1)
        out.append(np.tile(pos, (t, 1)))
    return np.concatenate(out, axis=0).astype(np.int32)


def grid_segments(grid_thw: Sequence[Tuple[int, int, int]]) -> np.ndarray:
    """Segment ids: one per temporal frame-pair (attention is within-frame,
    matching cu_seqlens = repeat_interleave(h*w, t)). Returns [S] int32."""
    out = []
    seg = 0
    for t, h, w in grid_thw:
        for _ in range(t):
            out.append(np.full(h * w, seg, np.int32))
            seg += 1
    return np.concatenate(out)


def prepare_vit_inputs(grid_thw: Sequence[Tuple[int, int, int]],
                       pad_to: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad positions/segments to the bucket size (padding segment id = -1)."""
    pos = grid_positions(grid_thw)
    seg = grid_segments(grid_thw)
    S = pos.shape[0]
    assert S <= pad_to, f"{S} tokens exceed bucket {pad_to}"
    pos = np.pad(pos, ((0, pad_to - S), (0, 0)))
    seg = np.pad(seg, (0, pad_to - S), constant_values=-1)
    return pos, seg


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def qwen_vit_blocks(
    params: dict,
    cfg: VitConfig,
    patches: jnp.ndarray,        # [S, pd] (padded)
    positions: jnp.ndarray,      # [S, 2] (h, w)
    segment_ids: jnp.ndarray,    # [S]; -1 padding
) -> jnp.ndarray:
    """Patch embed + rotary + scanned attention blocks. Returns [S, D]."""
    x = dense(patches, params["patch_embed"]["w"])[None]       # [1, S, D]
    cos, sin = vision_rope_angles(positions[:, 0], positions[:, 1],
                                  cfg.head_dim)
    seg = segment_ids[None]

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], 1e-6)
        attn, _ = mha(lp["attn"], h, num_heads=cfg.num_heads,
                      num_kv_heads=cfg.num_heads, head_dim=cfg.head_dim,
                      rope=(cos, sin), q_segment_ids=seg, kv_segment_ids=seg)
        x = x + attn
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], 1e-6)
        x = x + gelu_mlp(lp["mlp"], h, cfg.hidden_act)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x[0]


def qwen_vit_blocks_frames(
    params: dict,
    cfg: VitConfig,
    patches: jnp.ndarray,        # [S, pd], S = t_full*hw_full + t_small*hw_small
    *,
    t_full: int, hw_full: Tuple[int, int],
    t_small: int, hw_small: Tuple[int, int],
) -> jnp.ndarray:
    """Frame-batched encoder for the uniform-grid case (the common path:
    one video, dual-resolution streams).

    Attention in Qwen2-VL is block-diagonal per temporal frame (cu_seqlens =
    repeat_interleave(h*w, t)), so instead of masking an [S, S] score matrix
    (up to ~50x wasted compute at 240-frame offline scale) each stream
    reshapes to [frames, tokens/frame] and attention runs as a batch of small
    full-attention problems. QKV/MLP/LN still run once over the concatenated
    token stream. Returns [S, D].
    """
    D = cfg.hidden_size
    n_full = t_full * hw_full[0] * hw_full[1]
    P_full = hw_full[0] * hw_full[1]
    P_small = hw_small[0] * hw_small[1]

    x = dense(patches, params["patch_embed"]["w"])             # [S, D]
    pos_f = jnp.asarray(grid_positions([(1, *hw_full)]))
    pos_s = jnp.asarray(grid_positions([(1, *hw_small)]))
    rope_f = vision_rope_angles(pos_f[:, 0], pos_f[:, 1], cfg.head_dim)
    rope_s = vision_rope_angles(pos_s[:, 0], pos_s[:, 1], cfg.head_dim)

    def attn_stream(lp, h, rope):
        # h: [T, P, D] frames-as-batch. Projections run over the FLATTENED
        # [T*P, D] token stream: one big matmul instead of T small ones, and
        # the row count clears the w8a8 prefill threshold when the ViT is
        # int8-quantized (layers.dense dispatches on QuantWeight).
        T, P, _ = h.shape
        hf = h.reshape(T * P, D)
        q = dense(hf, lp["attn"]["wq"]["w"], lp["attn"]["wq"].get("b"))
        k = dense(hf, lp["attn"]["wk"]["w"], lp["attn"]["wk"].get("b"))
        v = dense(hf, lp["attn"]["wv"]["w"], lp["attn"]["wv"].get("b"))
        q = q.reshape(T, P, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(T, P, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(T, P, cfg.num_heads, cfg.head_dim).transpose(0, 2, 1, 3)
        from .layers import apply_rope
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)
        # flash_attention dispatches by shape: at streaming ingest's
        # frame-local lengths (P=256 full / 64 small @224px) it takes plain
        # XLA attention (measured 121 vs 104 TF/s for the 32-layer stack,
        # scripts/probe_vit_variants.py --single-layer), switching to the
        # Pallas kernel past the S~512 crossover (448px+ frames).
        from ..kernels.flash_attention import flash_attention
        out = flash_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(T * P, D)
        out = dense(out, lp["attn"]["wo"]["w"], lp["attn"]["wo"].get("b"))
        return out.reshape(T, P, D)

    def body(x, lp):
        h = layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], 1e-6)
        a_full = attn_stream(lp, h[:n_full].reshape(t_full, P_full, D), rope_f)
        a_small = attn_stream(lp, h[n_full:].reshape(t_small, P_small, D),
                              rope_s)
        attn = jnp.concatenate([a_full.reshape(-1, D),
                                a_small.reshape(-1, D)])
        x = x + attn
        h = layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], 1e-6)
        x = x + gelu_mlp(lp["mlp"], h, cfg.hidden_act)
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def qwen_vit_encode_frames_chunked(
    params: dict,
    cfg: VitConfig,
    full: jnp.ndarray,           # [T, P_full, pd] raw window-layout patches
    small: jnp.ndarray,          # [T, P_small, pd] pooled patches
    *,
    hw_full: Tuple[int, int], hw_small: Tuple[int, int],
    chunk: int, remat: bool = False,
    norm_fn=None,                # applied per chunk (uint8-patch training:
                                 # keeps only [chunk, P, pd] normalized
                                 # blocks live instead of the full video)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frame-chunked dual-resolution encode: (x [T,P_full,D], sx [T,P_small,D]).

    Qwen2-VL ViT attention is block-diagonal per temporal frame (cu_seqlens
    = repeat_interleave(h*w, t), model.py:419-422), so frames are fully
    independent through the block stack and chunking over frames is EXACT.
    With remat=True each chunk is a jax.checkpoint boundary: training at
    real shapes (240 frames @448px ≈ 150k tokens) keeps only the per-chunk
    outputs resident instead of 32 layers of full-stream activations —
    the memory that makes the reference's gradient-checkpointed ViT fit
    (finetune_flash.py:80-82) maps to chunk-level recompute here."""
    T, P_full, pd = full.shape
    P_small = small.shape[1]
    assert T % chunk == 0, f"frame count {T} not divisible by chunk {chunk}"
    D = cfg.hidden_size

    def one(args):
        f, s = args                                   # [chunk, P, pd]
        if norm_fn is not None:
            f, s = norm_fn(f), norm_fn(s)
        allp = jnp.concatenate([f.reshape(chunk * P_full, pd),
                                s.reshape(chunk * P_small, pd)], axis=0)
        hidden = qwen_vit_blocks_frames(
            params, cfg, allp, t_full=chunk, hw_full=hw_full,
            t_small=chunk, hw_small=hw_small)
        n_full = chunk * P_full
        return (hidden[:n_full].reshape(chunk, P_full, D),
                hidden[n_full:].reshape(chunk, P_small, D))

    fn = jax.checkpoint(one) if remat else one
    x, sx = jax.lax.map(fn, (full.reshape(T // chunk, chunk, P_full, pd),
                             small.reshape(T // chunk, chunk, P_small, pd)))
    return (x.reshape(T, P_full, D), sx.reshape(T, P_small, D))


def patch_merger(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """HF PatchMerger: LN, merge 2x2 window tokens, 2-layer GELU MLP.
    x: [S, D] (S multiple of 4, window-contiguous) -> [S/4, out_dim]."""
    m = params["merger"]
    h = layer_norm(x, m["ln_q"]["scale"], m["ln_q"]["bias"], 1e-6)
    w1 = m["fc1"]["w"]
    if h.dtype == jnp.float32:
        # Flash-memory banks are f32 (k-means numerics); matmul in the
        # weight dtype — f32 operands run the MXU at 1/4 rate (measured
        # 16.9 ms vs 3.9 for the fused ingest merger on f32 vs bf16 input)
        h = h.astype(w1.dtype if hasattr(w1, "dtype") else jnp.bfloat16)
    h = h.reshape(-1, h.shape[-1] * 4)
    h = jax.nn.gelu(dense(h, m["fc1"]["w"], m["fc1"]["b"]),
                    approximate=False)
    return dense(h, m["fc2"]["w"], m["fc2"]["b"])
