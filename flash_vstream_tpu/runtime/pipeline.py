"""Offline question-answering pipelines for both model families.

These are the framework's equivalents of the reference's `model.generate()`
entry points for offline video QA:
- LLaVA: eval_video/model_msvd_qa.py:147-156 (encode -> STAR -> splice ->
  generate with conv_vicuna_v1)
- Qwen: inference_mcq_vqa.py:291-346 (processor -> visual pipeline -> ChatML
  -> generate)

Everything device-side is jitted per shape bucket; the host only decodes
frames, tokenizes, and runs the decode loop.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import VStreamLLaVAConfig, VStreamQwenConfig
from ..models import vstream_llava, vstream_qwen
from ..preprocess.image import (clip_device_preprocess, clip_preprocess,
                                clip_resize_u8)
from ..preprocess.prompts import conv_templates
from ..preprocess.qwen_processor import build_video_prompt
from ..preprocess.tokenizer import (ByteTokenizer,
                                    KeywordsStoppingCriteria,
                                    tokenizer_image_token)
from .generation import GenerationConfig, Generator, trim_stop_strings


def _bucket(n: int, sizes=(8, 16, 32, 64, 128, 256, 512, 1024, 2048)) -> int:
    for s in sizes:
        if n <= s:
            return s
    return sizes[-1]


class LLaVAPipeline:
    """Offline LLaVA-generation video QA."""

    def __init__(self, params: dict, cfg: VStreamLLaVAConfig, tokenizer,
                 conv_template: str = "vicuna_v1", max_len: int = 4096):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.conv_template = conv_template
        self.generator = Generator(params["llm"], cfg.llm, max_len=max_len)
        # params passed as jit arguments (NOT closed over: closures inline
        # weights as HLO constants, which breaks remote compile)
        self._encode = jax.jit(
            lambda params, u8: vstream_llava.encode_frames(
                params, cfg, clip_device_preprocess(u8)))
        self._consolidate = jax.jit(
            lambda params, feats, n, key: vstream_llava.consolidate(
                params, cfg, feats, n, key))
        from ..models.clip_vit import clip_encode
        self._encode_full = jax.jit(
            lambda params, imgs: clip_encode(params["vit"], cfg.vit, imgs))

    def encode_video(self, frames: Sequence[np.ndarray]) -> jnp.ndarray:
        imgs = clip_resize_u8(frames, self.cfg.vit.image_size)
        return self._encode(self.params, jnp.asarray(imgs))

    def answer_image(self, image: np.ndarray, question: str,
                     gen: Optional[GenerationConfig] = None) -> str:
        """Single-image QA: full 576-token patch features projected directly,
        no memory consolidation (reference image path,
        vstream_arch.py:333-336)."""
        from ..models.llm import embed_tokens
        from ..models.projector import project
        imgs = clip_preprocess([image], self.cfg.vit.image_size)
        feats = self._encode_full(self.params, jnp.asarray(imgs))[0]
        proj = project(self.params["projector"], self.cfg.projector, feats)

        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        input_ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        (img_pos,) = np.where(input_ids == -200)
        p = int(img_pos[0])
        params = self.params
        embeds = jnp.concatenate([
            embed_tokens(params["llm"], jnp.asarray(input_ids[:p])[None]),
            proj[None].astype(params["llm"]["embed"].dtype),
            embed_tokens(params["llm"], jnp.asarray(input_ids[p + 1:])[None]),
        ], axis=1)
        positions = jnp.arange(embeds.shape[1])[None]
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        out_ids = self.generator.generate(
            embeds, positions, gen,
            stopping=KeywordsStoppingCriteria([conv.stop_str],
                                              self.tokenizer))
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or (conv.stop_str,))

    def answer(self, frames: Sequence[np.ndarray], question: str,
               gen: Optional[GenerationConfig] = None, seed: int = 0,
               features: Optional[jnp.ndarray] = None) -> str:
        if features is None:
            features = self.encode_video(frames)
        T = features.shape[0]
        Tb = _bucket(T)
        feats = jnp.pad(features, ((0, Tb - T), (0, 0), (0, 0)))
        memory = self._consolidate(self.params, feats, jnp.int32(T),
                                   jax.random.PRNGKey(seed))

        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        input_ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)

        embeds, positions = vstream_llava.build_multimodal_embeds(
            self.params, self.cfg, input_ids, memory, T)
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        # sampling decodes (reference eval temperature=0.002) stop on the
        # conversation separator mid-stream, not just at trim time
        out_ids = self.generator.generate(
            embeds, positions, gen,
            stopping=KeywordsStoppingCriteria([conv.stop_str],
                                              self.tokenizer))
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or (conv.stop_str,))


class QwenPipeline:
    """Offline Qwen-generation video QA / MCQ."""

    def __init__(self, params: dict, cfg: VStreamQwenConfig, tokenizer,
                 max_len: int = 16384, max_pixels: int = 4 * 224 * 224):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_pixels = max_pixels
        self.generator = Generator(params["llm"], cfg.llm, max_len=max_len)
        self._encode_cache = {}

    def _encode_fn(self, grid):
        """jit per grid bucket: uint8 frames -> device-fused preprocess
        (normalize+patchify, 4x less transfer than f32 patches) -> visual
        pipeline."""
        if grid not in self._encode_cache:
            from ..preprocess.image import qwen_device_preprocess

            def fn(params, frames_u8, key):
                patches = qwen_device_preprocess(frames_u8)
                return vstream_qwen.encode_video(params, self.cfg, patches,
                                                 grid, key=key)
            self._encode_cache[grid] = jax.jit(fn)
        return self._encode_cache[grid]

    def _encode_image_fn(self, grid_hw):
        key = ("image", grid_hw)
        if key not in self._encode_cache:
            from ..preprocess.image import qwen_device_preprocess

            def fn(params, frames_u8):
                patches = qwen_device_preprocess(frames_u8)
                return vstream_qwen.encode_image(params, self.cfg, patches,
                                                 grid_hw)
            self._encode_cache[key] = jax.jit(fn)
        return self._encode_cache[key]

    def answer_image(self, image: np.ndarray, question: str,
                     gen: Optional[GenerationConfig] = None) -> str:
        """Single-image QA: full patch grid through the ViT + merger, no
        Flash memory, standard Qwen2-VL mm rope (beyond the reference, whose
        get_rope_index raises NotImplementedError on image tokens,
        vstream_qwen2vl_model.py:864-866)."""
        from ..models.flash_memory import mm_rope_positions
        from ..preprocess.image import frame_hw, qwen_resize_u8, smart_resize
        from ..preprocess.qwen_processor import build_mm_prompt
        H, W = frame_hw(image)
        nh, nw = smart_resize(H, W, factor=56, max_pixels=self.max_pixels)
        frames_u8 = qwen_resize_u8([image], (nh, nw))
        grid_hw = (nh // 14, nw // 14)
        vis = self._encode_image_fn(grid_hw)(self.params,
                                             jnp.asarray(frames_u8))

        from ..preprocess.qwen_processor import _image_pad_id
        input_ids, spans = build_mm_prompt(
            self.cfg, self.tokenizer, question, [("image", grid_hw)])
        start, n, _ = spans[0]
        embeds = vstream_qwen.splice_video_embeds(
            self.params, self.cfg, input_ids, vis.video_embeds,
            pad_id=_image_pad_id(self.tokenizer, self.cfg))
        positions, rope_delta = mm_rope_positions(
            input_ids, [(start, np.asarray(vis.visual_positions))])
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        decode_start = len(input_ids) + int(rope_delta)
        out_ids = self.generator.generate(
            embeds, jnp.asarray(positions)[:, None, :], gen,
            decode_pos_start=decode_start)
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or ("<|im_end|>",))

    def answer(self, frames: Sequence[np.ndarray], question: str,
               gen: Optional[GenerationConfig] = None, seed: int = 0) -> str:
        from ..preprocess.image import frame_hw, qwen_resize_u8, smart_resize
        H, W = frame_hw(frames[0])
        nh, nw = smart_resize(H, W, factor=56, max_pixels=self.max_pixels)
        frames_u8 = qwen_resize_u8(frames, (nh, nw))
        grid = (len(frames_u8) // 2, nh // 14, nw // 14)
        vis = self._encode_fn(grid)(self.params, jnp.asarray(frames_u8),
                                    jax.random.PRNGKey(seed))

        input_ids, video_span = build_video_prompt(
            self.cfg, self.tokenizer, question, grid=grid)
        embeds = vstream_qwen.splice_video_embeds(
            self.params, self.cfg, input_ids, vis.video_embeds)
        positions, rope_delta = vstream_qwen.build_qwen_positions(
            len(input_ids), video_span[0], video_span[1], vis.visual_positions)
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        decode_start = len(input_ids) + int(rope_delta)
        out_ids = self.generator.generate(embeds, positions, gen,
                                          decode_pos_start=decode_start)
        text = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        # ChatML assistant turns terminate on <|im_end|>
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or ("<|im_end|>",))
