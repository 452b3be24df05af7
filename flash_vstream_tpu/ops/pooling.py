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
from functools import lru_cache as _lru_cache
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


@_lru_cache(maxsize=None)
def _pool_matrix(ps: int):
    """[4, ps*ps, ps*ps] map from a 2x2 patch window's pixels to the pooled
    patch: output pixel (p, q) averages combined-block pixels
    (2p+dy, 2q+dx); block pixel (P, Q) lives in source patch
    (a, b) = (P//ps, Q//ps) at local (P%ps, Q%ps)."""
    import numpy as np
    M = np.zeros((4, ps * ps, ps * ps), np.float32)
    for p in range(ps):
        for q in range(ps):
            o = p * ps + q
            for dy in (0, 1):
                for dx in (0, 1):
                    P, Q = 2 * p + dy, 2 * q + dx
                    a, b = P // ps, Q // ps
                    s = (P % ps) * ps + (Q % ps)
                    M[a * 2 + b, s, o] += 0.25
    return M


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

    Implementation: the pooled patch is a fixed LINEAR map of its window's
    four source patches, applied per (channel, temporal) plane as one
    einsum on the MXU. The window layout already groups each pooled patch's
    sources (window (i, j) holds original patches (2i+a, 2j+b)), so no
    pixel-level reshapes are needed — the earlier 9-D reshape with (14, 14)
    trailing dims padded 10.4x under TPU (8, 128) tiling and OOM'd
    real-shape training (551 MB -> 5.6 GB at 240 frames @448px).
    """
    t, h, w = grid_thw
    ps, tp, C = patch_size, temporal_patch_size, channels
    xdim = C * tp * ps * ps
    assert x.shape[-1] == xdim
    assert h % 4 == 0 and w % 4 == 0, (
        f"grid h,w must be multiples of 4 for temporal_pool, got {(h, w)}")
    M = jnp.asarray(_pool_matrix(ps), x.dtype)
    n = t * (h // 2) * (w // 2)
    blocks = x.reshape(n, 4, C * tp, ps * ps)
    pooled = jnp.einsum("nacp,apq->ncq", blocks, M,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    # pooled grid (h/2, w/2) in row-major order == window order; re-window
    # the POOLED grid into 2x2 groups for the output layout
    nh, nw = h // 4, w // 4
    pooled = pooled.reshape(t, nh, 2, nw, 2, xdim).transpose(0, 1, 3, 2, 4, 5)
    return pooled.reshape(t * nh * nw * 4, xdim), (t, h // 2, w // 2)
