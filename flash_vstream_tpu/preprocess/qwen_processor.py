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
IM_START = "<|im_start|>"
IM_END = "<|im_end|>"

QWEN_SPECIALS = (IM_START, IM_END, VISION_START, VISION_END, VIDEO_PAD)


def make_byte_qwen_tokenizer() -> ByteTokenizer:
    return ByteTokenizer(specials=QWEN_SPECIALS)


def _video_pad_id(tokenizer, cfg: VStreamQwenConfig) -> int:
    if isinstance(tokenizer, ByteTokenizer):
        return tokenizer.special_id(VIDEO_PAD)
    return cfg.video_token_id


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
    if n_video_tokens is None:
        assert grid is not None
        dam, csm = visual_token_count(cfg, *grid)
        n_video_tokens = dam + csm
    conv = conv_chatml.copy()
    conv.system = system
    user_msg = f"{VISION_START}{VIDEO_PAD}{VISION_END}{question}"
    conv.append_message(conv.roles[0], user_msg)
    conv.append_message(conv.roles[1], None)
    prompt = conv.get_prompt()

    pad_id = _video_pad_id(tokenizer, cfg)
    pre, post = prompt.split(VIDEO_PAD)
    if isinstance(tokenizer, ByteTokenizer):
        ids_pre = tokenizer.encode(pre, add_bos=False)
        ids_post = tokenizer.encode(post, add_bos=False)
    else:
        ids_pre = tokenizer.encode(pre, add_special_tokens=False)
        ids_post = tokenizer.encode(post, add_special_tokens=False)
    input_ids = np.asarray(
        ids_pre + [pad_id] * n_video_tokens + ids_post, np.int64)
    return input_ids, (len(ids_pre), n_video_tokens)


def visual_position_ids(input_ids: np.ndarray, video_span: Tuple[int, int]
                        ) -> np.ndarray:
    """0..L-1 at video-pad positions, -1 elsewhere (processor.py:380-387)."""
    start, n = video_span
    out = np.full(len(input_ids), -1, np.int64)
    out[start:start + n] = np.arange(n)
    return out
