"""Qwen prompt construction: ChatML with the video-pad block expanded to the
predicted post-compression token count.

Reference: FlashVStreamQwen2VLProcessor.__call__
(Flash-VStream-Qwen/models/vstream_qwen2vl_processor.py:353-387): the
'<|video_pad|>' placeholder expands to (dam_tokens + csm_tokens) copies
(predicted via the grid math), and visual_position_ids mark the block.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..core.config import VStreamQwenConfig
from ..models.vstream_qwen import visual_token_count
from .prompts import conv_chatml
from .tokenizer import ByteTokenizer

VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
VIDEO_PAD = "<|video_pad|>"
IMAGE_PAD = "<|image_pad|>"
IM_START = "<|im_start|>"
IM_END = "<|im_end|>"

QWEN_SPECIALS = (IM_START, IM_END, VISION_START, VISION_END, VIDEO_PAD,
                 IMAGE_PAD)


def make_byte_qwen_tokenizer() -> ByteTokenizer:
    return ByteTokenizer(specials=QWEN_SPECIALS)


def _video_pad_id(tokenizer, cfg: VStreamQwenConfig) -> int:
    if isinstance(tokenizer, ByteTokenizer):
        return tokenizer.special_id(VIDEO_PAD)
    return cfg.video_token_id


def _image_pad_id(tokenizer, cfg: VStreamQwenConfig) -> int:
    if isinstance(tokenizer, ByteTokenizer):
        return tokenizer.special_id(IMAGE_PAD)
    return cfg.image_token_id


def build_video_prompt(
    cfg: VStreamQwenConfig,
    tokenizer,
    question: str,
    grid: Optional[Tuple[int, int, int]] = None,
    n_video_tokens: Optional[int] = None,
    system: str = "You are a helpful assistant.",
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Build ChatML ids with the expanded video block.

    Either `grid` (offline: (t, h, w), token count predicted via grid math) or
    `n_video_tokens` (streaming: dummy_video_tokens, processor.py:367-375)
    must be given. Returns (input_ids [S], (video_start, n_visual))."""
    media = ([("video_tokens", n_video_tokens)] if n_video_tokens is not None
             else [("video", grid)])
    input_ids, spans = build_mm_prompt(cfg, tokenizer, question, media,
                                       system=system)
    start, n, _ = spans[0]
    return input_ids, (start, n)


def build_mm_prompt(
    cfg: VStreamQwenConfig,
    tokenizer,
    question: str,
    media: list,   # ordered [("video", (t,h,w)) | ("image", (h,w)) |
                   #          ("video_tokens", n)]
    system: str = "You are a helpful assistant.",
) -> Tuple[np.ndarray, list]:
    """Build ChatML ids with EVERY media block expanded, in order.

    Generalizes the reference processor's single-video expansion
    (vstream_qwen2vl_processor.py:353-387) to interleaved images and videos:
    each video placeholder expands to (dam + csm) tokens via the grid math;
    each image expands to h*w//4 tokens (standard Qwen2-VL, full patch grid
    merged 2x2 — images bypass Flash memory). Returns
    (input_ids [S], spans=[(start, n_tokens, kind), ...])."""
    from ..models.vstream_qwen import image_token_count

    counts, kinds = [], []
    for kind, g in media:
        if kind == "video":
            dam, csm = visual_token_count(cfg, *g)
            counts.append(dam + csm)
            kinds.append("video")
        elif kind == "video_tokens":
            counts.append(int(g))
            kinds.append("video")
        elif kind == "image":
            counts.append(image_token_count(*g))
            kinds.append("image")
        else:
            raise ValueError(f"unknown media kind {kind!r}")

    conv = conv_chatml.copy()
    conv.system = system
    blocks = "".join(
        f"{VISION_START}{VIDEO_PAD if k == 'video' else IMAGE_PAD}"
        f"{VISION_END}" for k in kinds)
    conv.append_message(conv.roles[0], blocks + question)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    if isinstance(tokenizer, ByteTokenizer):
        def enc(t):
            return tokenizer.encode(t, add_bos=False)
    else:
        def enc(t):
            return tokenizer.encode(t, add_special_tokens=False)

    ids: list = []
    spans = []
    rest = prompt
    for kind, cnt in zip(kinds, counts):
        pad_tok = VIDEO_PAD if kind == "video" else IMAGE_PAD
        pad_id = (_video_pad_id(tokenizer, cfg) if kind == "video"
                  else _image_pad_id(tokenizer, cfg))
        pre, rest = rest.split(pad_tok, 1)
        ids.extend(enc(pre))
        spans.append((len(ids), cnt, kind))
        ids.extend([pad_id] * cnt)
    ids.extend(enc(rest))
    return np.asarray(ids, np.int64), spans


def visual_position_ids(input_ids: np.ndarray, video_span: Tuple[int, int]
                        ) -> np.ndarray:
    """0..L-1 at video-pad positions, -1 elsewhere (processor.py:380-387)."""
    start, n = video_span
    out = np.full(len(input_ids), -1, np.int64)
    out[start:start + n] = np.arange(n)
    return out
