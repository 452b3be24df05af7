"""Flash-VStream-LLaVA composition: CLIP ViT + STAR memory + projector + Vicuna.

Reference: VStreamMetaForCausalLM / VStreamLlamaForCausalLM
(Flash-VStream-LLaVA/flash_vstream/model/vstream_arch.py:68-743,
language_model/vstream_llama.py:28-129).

TPU-first: the whole visual path (encode -> pool -> consolidate -> project)
is one jit per frame-count bucket; the LLM splice is computed host-side from
static token counts (star_valid_counts) so the decoder always sees a
fixed-shape embedding sequence.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import IMAGE_TOKEN_INDEX, VStreamLLaVAConfig
from ..ops.ntm import init_ntm_params
from ..ops.pooling import merge_2x2_tokens, spatial_pool
from .clip_vit import clip_encode, init_clip_params
from .llm import decoder_forward, embed_tokens, init_llm_params, lm_head
from .projector import init_projector_params, project
from .star_memory import (
    STARMemory,
    star_consolidate,
    star_stream_update,
    star_token_count,
)


def init_llava_params(key: jax.Array, cfg: VStreamLLaVAConfig,
                      dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "vit": init_clip_params(k1, cfg.vit, dtype),
        "projector": init_projector_params(k2, cfg.projector, dtype),
        "ntm": init_ntm_params(k3, cfg.projector.effective_input_dim,
                               cfg.star.turing_hidden_dim, dtype),
        "llm": init_llm_params(k4, cfg.llm, dtype),
    }


def encode_frames(params: dict, cfg: VStreamLLaVAConfig,
                  images: jnp.ndarray) -> jnp.ndarray:
    """ViT-encode frames [T, C, H, W] -> pooled features [T, P_cur, D].

    Mirrors encode_images + (optional) 2x2 merge + compress_spatial_features
    (vstream_arch.py:316-319)."""
    feats = clip_encode(params["vit"], cfg.vit, images)       # [T, P, D]
    if cfg.projector.use_4_vision_tokens:
        feats = merge_2x2_tokens(feats)                       # [T, P/4, 4D]
    return spatial_pool(feats, cfg.star.current_size)         # [T, P_cur, D]


def consolidate(params: dict, cfg: VStreamLLaVAConfig, features: jnp.ndarray,
                n_valid: jnp.ndarray, key: jax.Array) -> STARMemory:
    return star_consolidate(params["ntm"], cfg.star, features, n_valid, key)


def star_valid_counts(cfg, n_frames: int,
                      streaming: bool = False) -> Tuple[int, int, int, int]:
    """Host-side mirror of the validity masks in star_consolidate /
    star_stream_update: token counts per section for a video of n_frames.

    Offline excludes the current frames from the history (vstream_arch.py:
    248-250); streaming folds every frame into long/Turing memory
    (embed_video_streaming, vstream_arch.py:657-658)."""
    star = cfg.star
    n_hist = n_frames if streaming else max(n_frames - star.current_length, 0)
    n_turing = min(n_hist, star.turing_length) * star.turing_size ** 2
    n_long = min(n_hist, star.long_length) * star.long_size ** 2
    n_key = (star.key_length if n_hist > 0 and star.long_length > 0
             else 0) * star.current_size ** 2
    n_cur = min(n_frames, star.current_length) * star.current_size ** 2
    return n_turing, n_long, n_key, n_cur


def pack_memory_tokens(memory: STARMemory, n_mem: int) -> jnp.ndarray:
    """Pack the valid memory tokens (preserving order) into [n_mem, D]."""
    order = jnp.argsort(~memory.valid, stable=True)
    return memory.tokens[order][:n_mem]


def build_multimodal_embeds(
    params: dict,
    cfg: VStreamLLaVAConfig,
    input_ids: np.ndarray,          # [S] host-side; one IMAGE_TOKEN_INDEX
    memory: STARMemory,
    n_frames: int,
    streaming: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splice projected memory tokens at the <image> position.

    Mirrors prepare_inputs_labels_for_multimodal's token surgery
    (vstream_arch.py:355-436) for batch 1. Returns (embeds [1, S', D],
    positions [1, S'])."""
    n_mem = sum(star_valid_counts(cfg, n_frames, streaming=streaming))
    mem_tokens = pack_memory_tokens(memory, n_mem)
    mem_proj = project(params["projector"], cfg.projector, mem_tokens)

    (img_pos,) = np.where(input_ids == IMAGE_TOKEN_INDEX)
    assert len(img_pos) == 1, "expected exactly one <image> token"
    p = int(img_pos[0])
    pre = jnp.asarray(input_ids[:p])[None]
    post = jnp.asarray(input_ids[p + 1:])[None]
    embeds = jnp.concatenate([
        embed_tokens(params["llm"], pre),
        mem_proj[None].astype(params["llm"]["embed"].dtype),
        embed_tokens(params["llm"], post),
    ], axis=1)
    S = embeds.shape[1]
    positions = jnp.arange(S)[None]
    return embeds, positions


def llava_forward_train(
    params: dict,
    cfg: VStreamLLaVAConfig,
    images: jnp.ndarray,        # [B, T, C, H, W]
    n_frames: jnp.ndarray,      # [B]
    input_ids: jnp.ndarray,     # [B, S] with IMAGE_TOKEN_INDEX slots...
    image_slot: int,            # static splice position (collator aligns it)
    n_mem: int,                 # static memory token count for the bucket
    labels: jnp.ndarray,        # [B, S'] aligned to the spliced sequence
    segment_ids: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    remat: bool = True,
) -> jnp.ndarray:
    """Training forward -> logits [B, S', V]. The collator pads every sample
    of a batch to the same frame bucket and splice position, so the spliced
    sequence is fixed-shape (see train/data.py)."""
    B, T = images.shape[:2]
    if key is None:
        key = jax.random.PRNGKey(0)
    flat = images.reshape(B * T, *images.shape[2:])
    feats = encode_frames(params, cfg, flat)
    feats = feats.reshape(B, T, *feats.shape[1:])

    def one(feat, n, k):
        mem = consolidate(params, cfg, feat, n, k)
        return pack_memory_tokens(mem, n_mem)
    mems = jax.vmap(one)(feats, n_frames, jax.random.split(key, B))
    mem_proj = project(params["projector"], cfg.projector, mems)

    pre = input_ids[:, :image_slot]
    post = input_ids[:, image_slot + 1:]
    embeds = jnp.concatenate([
        embed_tokens(params["llm"], pre),
        mem_proj.astype(params["llm"]["embed"].dtype),
        embed_tokens(params["llm"], post),
    ], axis=1)
    S = embeds.shape[1]
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    h, _ = decoder_forward(params["llm"], cfg.llm, embeds, positions,
                           segment_ids=segment_ids, remat=remat)
    return lm_head(params["llm"], cfg.llm, h)
