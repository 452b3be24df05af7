"""Spatial/temporal pooling ops for memory consolidation.

Reference semantics:
- compress_spatial_features (vstream_arch.py:193-212): avg-pool a p x p ViT
  patch grid down to s x s.
- reshape_2x2_image_features (vstream_arch.py:163-172): concatenate 2x2
  neighbor patches channelwise (mm_use_4_vision_tokens).
- FlashMemory.temporal_pool (vstream_qwen2vl_model.py:113-142): 2x downsample
  the raw Qwen2-VL patch stream by averaging pixels of 2x2 patch windows.

All are pure reshape+mean compositions that XLA fuses; no kernels needed.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp


def spatial_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Average-pool patch tokens x: [..., P, D] (P = p*p) to out_size**2 tokens."""
    *lead, P, D = x.shape
    p = round(math.isqrt(P))
    assert p * p == P, f"patch grid must be square, got P={P}"
    if p == out_size:
        return x
    if out_size == 1:
        return jnp.mean(x, axis=-2, keepdims=True)
    assert p % out_size == 0
    r = p // out_size
    x = x.reshape(*lead, out_size, r, out_size, r, D)
    return jnp.mean(x, axis=(-4, -2)).reshape(*lead, out_size * out_size, D)


def merge_2x2_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """Concatenate 2x2 neighbor patches channelwise: [..., P, D] -> [..., P/4, 4D].

    Channel order matches reshape_2x2_image_features (vstream_arch.py:163-172):
    (r0c0, r0c1, r1c0, r1c1).
    """
    *lead, P, D = x.shape
    p = round(math.isqrt(P))
    assert p * p == P and p % 2 == 0
    x = x.reshape(*lead, p // 2, 2, p // 2, 2, D)
    x = jnp.swapaxes(x, -4, -3)                  # [..., p/2, p/2, 2, 2, D]
    return x.reshape(*lead, (p // 2) ** 2, 4 * D)


def qwen_temporal_pool(x: jnp.ndarray, grid_thw: Tuple[int, int, int],
                       patch_size: int = 14, temporal_patch_size: int = 2,
                       channels: int = 3) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """Low-resolution pathway for the dual-resolution Qwen ViT.

    x: [t*h*w, C*tp*ps*ps] raw patchified pixels in Qwen window layout
    (rows grouped as [t, h/2, w/2, 2, 2]); grid_thw = (t, h, w) with h, w
    multiples of 4 (guaranteed by the factor-56 smart resize,
    vstream_qwen2vl_processor.py:110-117).

    Returns the 2x-downsampled patch stream [t*(h/2)*(w/2), C*tp*ps*ps] and
    the new grid (t, h/2, w/2). Mirrors FlashMemory.temporal_pool
    (vstream_qwen2vl_model.py:113-142).
    """
    t, h, w = grid_thw
    ps, tp, C = patch_size, temporal_patch_size, channels
    xdim = C * tp * ps * ps
    assert x.shape[-1] == xdim
    assert h % 4 == 0 and w % 4 == 0, (
        f"grid h,w must be multiples of 4 for temporal_pool, got {(h, w)}")
    # Undo window layout -> per-pixel grid, average 2x2 patch windows' pixels.
    x = x.reshape(t, h // 2, w // 2, 2, 2, C, tp, ps, ps)
    # -> [t, hb, wb, C, tp, 2(hh), ps, 2(ww), ps]: one 2ps x 2ps pixel block
    x = x.transpose(0, 1, 2, 5, 6, 3, 7, 4, 8)
    # 2x2 average pool over the 2ps x 2ps pixel block: reinterpret rows/cols
    # as (ps, 2) and average the inner pairs.
    x = x.reshape(t, h // 2, w // 2, C, tp, ps, 2, ps, 2)
    x = jnp.mean(x, axis=(-3, -1))                       # [t, hb, wb, C, tp, ps, ps]
    # Re-window: group the (h/2, w/2) patch grid into 2x2 windows again.
    nh, nw = h // 4, w // 4
    x = x.reshape(t, nh, 2, nw, 2, C, tp, ps, ps)
    x = x.transpose(0, 1, 3, 2, 4, 5, 6, 7, 8)           # [t, nh, nw, 2, 2, C, tp, ps, ps]
    x = x.reshape(t * nh * nw * 4, xdim)
    return x, (t, h // 2, w // 2)
