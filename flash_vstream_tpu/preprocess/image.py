"""Host-side image preprocessing feeding the device graphs.

Reference semantics:
- CLIP preprocessing + pad-to-square (Flash-VStream-LLaVA/flash_vstream/
  mm_utils.py:16-42, CLIPImageProcessor defaults)
- Qwen smart_resize with factor 56 = patch*merge*pool and window patchify
  (Flash-VStream-Qwen/models/vstream_qwen2vl_processor.py:110-157,
  qwen_vl_utils/vision_process.py:44-70)

Decode/resize runs on host (numpy/PIL); normalize/patchify are cheap numpy
ops emitted in the final device layout so the device graph starts at the
patch stream.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np

OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _to_float_chw(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 CHW in [0, 1]."""
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    if img.ndim == 3 and img.shape[-1] in (1, 3):
        img = img.transpose(2, 0, 1)
    return img.astype(np.float32)


def _resize_bilinear(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize CHW float image to (H, W) via PIL (antialiased)."""
    from PIL import Image
    h, w = size
    chw = np.clip(img * 255.0, 0, 255).astype(np.uint8).transpose(1, 2, 0)
    pil = Image.fromarray(chw).resize((w, h), Image.BICUBIC)
    return np.asarray(pil).astype(np.float32).transpose(2, 0, 1) / 255.0


def expand2square(img: np.ndarray, fill: Sequence[float]) -> np.ndarray:
    """Pad CHW image to square with the given per-channel fill
    (mm_utils.py:16-28 semantics)."""
    c, h, w = img.shape
    if h == w:
        return img
    s = max(h, w)
    out = np.empty((c, s, s), img.dtype)
    out[:] = np.asarray(fill, img.dtype)[:, None, None]
    top, left = (s - h) // 2, (s - w) // 2
    out[:, top:top + h, left:left + w] = img
    return out


def clip_preprocess(frames: Sequence[np.ndarray], image_size: int = 336,
                    pad_to_square: bool = True) -> np.ndarray:
    """Frames (uint8 HWC or float CHW) -> [T, 3, S, S] normalized."""
    out = []
    for f in frames:
        img = _to_float_chw(f)
        if pad_to_square:
            img = expand2square(img, OPENAI_CLIP_MEAN)
        img = _resize_bilinear(img, (image_size, image_size))
        img = (img - OPENAI_CLIP_MEAN[:, None, None]) / OPENAI_CLIP_STD[:, None, None]
        out.append(img)
    return np.stack(out)


def clip_resize_u8(frames: Sequence[np.ndarray], image_size: int = 336,
                   pad_to_square: bool = True) -> np.ndarray:
    """Host half of the CLIP pipeline: pad-to-square + resize only, keeping
    uint8 HWC ([T, S, S, 3]); normalization/CHW happen on device
    (clip_device_preprocess) — 4x less host->device transfer."""
    from PIL import Image
    out = []
    fill = tuple(int(round(c * 255)) for c in OPENAI_CLIP_MEAN)
    for f in frames:
        f = np.asarray(f)
        if f.dtype != np.uint8:
            if f.ndim == 3 and f.shape[0] in (1, 3):
                f = f.transpose(1, 2, 0)
            f = np.clip(f * 255.0, 0, 255).astype(np.uint8)
        img = Image.fromarray(f)
        if pad_to_square and img.width != img.height:
            s = max(img.size)
            bg = Image.new("RGB", (s, s), fill)
            bg.paste(img, ((s - img.width) // 2, (s - img.height) // 2))
            img = bg
        if img.size != (image_size, image_size):
            img = img.resize((image_size, image_size), Image.BICUBIC)
        out.append(np.asarray(img))
    return np.stack(out)


def to_uint8_hwc(frame: np.ndarray) -> np.ndarray:
    """Normalize any supported frame layout (uint8 HWC, float HWC/CHW in
    [0,1]) to uint8 HWC."""
    f = np.asarray(frame)
    if f.dtype == np.uint8:
        return f
    if f.ndim == 3 and f.shape[0] in (1, 3) and f.shape[-1] not in (1, 3):
        f = f.transpose(1, 2, 0)
    return np.clip(f * 255.0, 0, 255).astype(np.uint8)


def qwen_resize_u8(frames: Sequence[np.ndarray], hw,
                   pad_to_even: bool = True) -> np.ndarray:
    """Host half of the Qwen pipeline: any frame layout -> uint8 HWC at the
    smart-resize target (single fix point shared by the offline pipeline and
    both streaming engines); optionally pads to an even count (temporal
    pairs). Device half: qwen_device_preprocess."""
    nh, nw = hw
    out = []
    for f in frames:
        f = to_uint8_hwc(f)
        if f.shape[:2] != (nh, nw):
            from PIL import Image
            f = np.asarray(Image.fromarray(f).resize((nw, nh), Image.BICUBIC))
        out.append(f)
    if pad_to_even and len(out) % 2:
        out.append(out[-1])
    return np.stack(out)


def frame_hw(frame: np.ndarray):
    """(H, W) of a frame in any supported layout."""
    f = np.asarray(frame)
    if f.ndim == 3 and f.shape[0] in (1, 3) and f.shape[-1] not in (1, 3):
        return f.shape[1], f.shape[2]
    return f.shape[0], f.shape[1]


def clip_device_preprocess(frames_u8):
    """Device half: uint8 [T, S, S, 3] -> normalized [T, 3, S, S] (jnp,
    lives inside the encode jit)."""
    import jax.numpy as jnp
    x = frames_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(OPENAI_CLIP_MEAN)) / jnp.asarray(OPENAI_CLIP_STD)
    return x.transpose(0, 3, 1, 2)


def smart_resize(height: int, width: int, factor: int = 56,
                 min_pixels: int = 56 * 56 * 4,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Qwen smart resize: round to factor, clamp total pixels
    (vision_process.py:44-70)."""
    if height < factor or width < factor:
        scale = factor / min(height, width)
        height, width = math.ceil(height * scale), math.ceil(width * scale)
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return max(h_bar, factor), max(w_bar, factor)


def qwen_patchify(frames: np.ndarray, patch_size: int = 14,
                  temporal_patch_size: int = 2, merge_size: int = 2
                  ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Normalized frames [T, 3, H, W] -> (patch rows [t*h*w, C*tp*ps*ps],
    grid (t, h, w)) in Qwen window layout [t, h/2, w/2, 2, 2].

    Mirrors Qwen2VLImageProcessor._preprocess patchify; T is padded to a
    multiple of temporal_patch_size by repeating the last frame
    (vision_process.py FRAME_FACTOR padding)."""
    T, C, H, W = frames.shape
    tp, ps, m = temporal_patch_size, patch_size, merge_size
    if T % tp:
        frames = np.concatenate([frames, frames[-1:].repeat(tp - T % tp, 0)])
        T = frames.shape[0]
    t, h, w = T // tp, H // ps, W // ps
    x = frames.reshape(t, tp, C, h // m, m, ps, w // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)   # [t, hb, wb, hh, ww, C, tp, ps, ps]
    return x.reshape(t * h * w, C * tp * ps * ps), (t, h, w)


def qwen_patchify_u8(frames_u8: np.ndarray, patch_size: int = 14,
                     temporal_patch_size: int = 2, merge_size: int = 2
                     ) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """uint8 frames [T, H, W, 3] -> UNNORMALIZED uint8 patch rows in the
    same Qwen window layout as qwen_patchify (a pure index permutation —
    no arithmetic, so it is bit-exact and commutes with normalization).

    Training memory lever: the [t*h*w, 1176] patches are the train step's
    input argument; uint8 halves it vs bf16 (269 MB at 240 frames @448 px)
    and quarters the host->device transfer. Pair with qwen_patch_norm's
    per-element affine, applied per ViT chunk ON DEVICE
    (models/vstream_qwen.encode_video patch_norm=...)."""
    T, H, W, C = frames_u8.shape
    tp, ps, m = temporal_patch_size, patch_size, merge_size
    x = frames_u8.transpose(0, 3, 1, 2)               # [T, C, H, W]
    if T % tp:
        x = np.concatenate([x, x[-1:].repeat(tp - T % tp, 0)])
        T = x.shape[0]
    t, h, w = T // tp, H // ps, W // ps
    x = x.reshape(t, tp, C, h // m, m, ps, w // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(t * h * w, C * tp * ps * ps), (t, h, w)


def qwen_patch_norm(patch_size: int = 14, temporal_patch_size: int = 2,
                    channels: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """(scale_pd, shift_pd) f32 vectors over the patch feature dim such that
    normalized = u8 * scale + shift reproduces ((u8/255) - mean) / std.
    The pd layout is [C, tp, ps, ps] (qwen_patchify), so the per-channel
    CLIP constants broadcast as repeats of tp*ps*ps."""
    rep = temporal_patch_size * patch_size * patch_size
    scale = np.repeat(1.0 / (255.0 * OPENAI_CLIP_STD), rep)
    shift = np.repeat(-OPENAI_CLIP_MEAN / OPENAI_CLIP_STD, rep)
    return scale.astype(np.float32), shift.astype(np.float32)


def qwen_device_preprocess(frames_u8, patch_size: int = 14,
                           temporal_patch_size: int = 2, merge_size: int = 2,
                           dtype=None):
    """Device-side fused preprocess: uint8 frames [T, H, W, 3] -> normalized
    patch rows [t*h*w, C*tp*ps*ps] (jnp ops, lives inside the ingest jit).

    This is the north-star 'decode -> resize -> normalize -> patchify fused
    into a single XLA preprocessing graph' (BASELINE.json): the host ships raw
    uint8 (4x less PCIe/tunnel traffic than f32), normalization and window
    patchify fuse into the ViT's first matmul. T must be a multiple of
    temporal_patch_size; H, W multiples of patch_size*merge_size.

    Layout order matters on TPU: the window patchify is a 9-D transpose, so
    it runs on the RAW uint8 bytes (1 B/elem) and the CLIP affine applies
    LAST on the already-patchified rows via per-feature scale/shift vectors
    (qwen_patch_norm) — normalizing first would push 4 bytes/elem through
    the transpose engine. `dtype` (default bfloat16) is the output dtype;
    downstream is the bf16 patch-embed matmul either way."""
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    T, H, W, C = frames_u8.shape
    tp, ps, m = temporal_patch_size, patch_size, merge_size
    x = frames_u8.astype(jnp.bfloat16)                # u8 values exact in bf16
    x = x.transpose(0, 3, 1, 2)                       # [T, C, H, W]
    t, h, w = T // tp, H // ps, W // ps
    x = x.reshape(t, tp, C, h // m, m, ps, w // m, m, ps)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    x = x.reshape(t * h * w, C * tp * ps * ps)
    scale, shift = qwen_patch_norm(ps, tp, C)
    return (x.astype(jnp.float32) * jnp.asarray(scale)
            + jnp.asarray(shift)).astype(dtype)


def qwen_preprocess(frames: Sequence[np.ndarray],
                    max_pixels: int = 4 * 224 * 224,
                    factor: int = 56) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """Raw frames -> (patch rows, grid). Resize with the factor-56 smart
    resize (keeps pooled grids even, processor.py:110-117), CLIP-normalize,
    patchify."""
    first = _to_float_chw(frames[0])
    _, H, W = first.shape
    nh, nw = smart_resize(H, W, factor=factor, max_pixels=max_pixels)
    out = []
    for f in frames:
        img = _to_float_chw(f)
        if img.shape[1:] != (nh, nw):    # skip no-op PIL round trips
            img = _resize_bilinear(img, (nh, nw))
        img = (img - OPENAI_CLIP_MEAN[:, None, None]) / OPENAI_CLIP_STD[:, None, None]
        out.append(img)
    return qwen_patchify(np.stack(out))
