"""Decoder-only transformer covering Llama (Vicuna-7B) and Qwen2(-VL).

Replaces the reference's HF LlamaForCausalLM / Qwen2VLModel decoders
(Flash-VStream-LLaVA/flash_vstream/model/language_model/vstream_llama.py,
Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:543-571) with a single
functional JAX implementation:

- parameters are stacked per-layer pytrees scanned with lax.scan (one compiled
  block body; fast compiles at 28-32 layers);
- M-RoPE (3-axis positions with frequency sections) generalizes 1D RoPE —
  Llama passes positions broadcast over the three axes with sections=None;
- KV cache decode threads per-layer cache slices through the scan;
- optional remat (gradient checkpointing) per layer for training.

Weight layout matches HF checkpoints after conversion (weights/convert.py).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LLMConfig
from .layers import (
    KVCache,
    dense,
    init_dense,
    mha,
    mrope_angles,
    rms_norm,
    rope_angles,
    swiglu_mlp,
)


def init_llm_params(key: jax.Array, cfg: LLMConfig, dtype=jnp.float32) -> dict:
    """Random-init parameters with HF-compatible structure, stacked over layers."""
    keys = jax.random.split(key, 8)
    D, I, Dh = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    Hq, Hkv, L = cfg.num_heads, cfg.num_kv_heads, cfg.num_layers

    def stack_init(k, din, dout, bias):
        ks = jax.random.split(k, L)
        ps = [init_dense(ki, din, dout, bias=bias, dtype=dtype) for ki in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *ps)

    params = {
        "embed": jax.random.normal(keys[0], (cfg.vocab_size, D), dtype) * 0.02,
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "attn": {
                "wq": stack_init(keys[1], D, Hq * Dh, cfg.attention_bias),
                "wk": stack_init(keys[2], D, Hkv * Dh, cfg.attention_bias),
                "wv": stack_init(keys[3], D, Hkv * Dh, cfg.attention_bias),
                "wo": stack_init(keys[4], Hq * Dh, D, False),
            },
            "mlp": {
                "gate": stack_init(keys[5], D, I, False),
                "up": stack_init(keys[6], D, I, False),
                "down": stack_init(keys[7], I, D, False),
            },
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jax.random.normal(
            jax.random.fold_in(key, 99), (D, cfg.vocab_size), dtype) * 0.02
    return params


def _rope_for(cfg: LLMConfig, positions: jnp.ndarray):
    """positions: [B, S] (1D) or [3, B, S] (M-RoPE)."""
    if cfg.mrope_sections is not None:
        if positions.ndim == 2:
            positions = jnp.broadcast_to(positions[None], (3, *positions.shape))
        return mrope_angles(positions, cfg.head_dim, cfg.mrope_sections,
                            cfg.rope_theta)
    if positions.ndim == 3:
        positions = positions[0]
    return rope_angles(positions, cfg.head_dim, cfg.rope_theta)


def decoder_block(
    x: jnp.ndarray,                         # [B, S, D]
    layer_params: dict,                     # ONE layer's (unstacked) params
    cfg: LLMConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    *,
    segment_ids: Optional[jnp.ndarray] = None,
    mlp_seq_chunk: int = 0,
) -> jnp.ndarray:
    """One decoder layer, no-cache path (pre-norm attn + SwiGLU MLP with
    residuals). The unit decoder_forward scans and parallel/pipeline.py
    stages; exposed so pipeline stages run exactly the same math."""
    h = rms_norm(x, layer_params["attn_norm"], cfg.rms_norm_eps)
    attn_out, _ = mha(
        layer_params["attn"], h,
        num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim, rope=(cos, sin), causal=True,
        q_segment_ids=segment_ids, kv_segment_ids=segment_ids)
    x = x + attn_out
    h = rms_norm(x, layer_params["mlp_norm"], cfg.rms_norm_eps)
    return x + swiglu_mlp(layer_params["mlp"], h, seq_chunk=mlp_seq_chunk)


def decoder_forward(
    params: dict,
    cfg: LLMConfig,
    input_embeds: jnp.ndarray,              # [B, S, D]
    positions: jnp.ndarray,                 # [B, S] or [3, B, S]
    *,
    segment_ids: Optional[jnp.ndarray] = None,   # [B, S]; -1 = padding
    cache: Optional[KVCache] = None,
    remat: bool = False,
    mlp_seq_chunk: int = 0,   # chunked MLP (exact; caps bwd HBM at scale)
    remat_group: int = 1,     # layers per checkpoint boundary (no-cache
                              # path): g>1 divides the stacked boundary
                              # saves [L, B, S, D] by g at the cost of
                              # recomputing g layers per backward step
    decode_multi: bool = False,  # S>1 tokens against an EXISTING cache
                                 # prefix (speculative verify step) — takes
                                 # the in-place decode path, not prefill
) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Run the decoder stack; returns final hidden states and updated cache."""
    cos, sin = _rope_for(cfg, positions)
    x = input_embeds

    def raw_block(x, layer_params, kv, cache_len, cache_segments):
        h = rms_norm(x, layer_params["attn_norm"], cfg.rms_norm_eps)
        attn_out, new_kv = mha(
            layer_params["attn"], h,
            num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
            head_dim=cfg.head_dim, rope=(cos, sin), causal=True,
            q_segment_ids=segment_ids, kv_segment_ids=segment_ids,
            kv_cache=kv, cache_len=cache_len, cache_segments=cache_segments)
        x = x + attn_out
        h = rms_norm(x, layer_params["mlp_norm"], cfg.rms_norm_eps)
        x = x + swiglu_mlp(layer_params["mlp"], h, seq_chunk=mlp_seq_chunk)
        return x, new_kv

    block = (jax.checkpoint(raw_block, static_argnums=()) if remat
             else raw_block)

    if cache is None:
        g = max(remat_group, 1) if remat else 1
        if g > 1 and cfg.num_layers % g == 0:
            # scan over layer GROUPS with one checkpoint per group: the
            # scan's saved carries shrink from L to L/g copies of [B, S, D]
            # (2.6 GB at 7B/seq-14k), recomputing g layers in backward.
            # (An unrolled python loop over groups was measured WORSE:
            # without the scan the scheduler overlaps copy-starts across
            # layers and peak temps nearly doubled, 6.1 -> 11.3 GiB at the
            # 7B QLoRA production shape.)
            grouped = jax.tree.map(
                lambda p: p.reshape(cfg.num_layers // g, g, *p.shape[1:]),
                params["layers"])

            def group_scan(x, group_params):
                # NESTED checkpoint: the group boundary bounds the scan's
                # saved carries; the per-layer checkpoint keeps the group's
                # backward from saving intra-layer intermediates (the f32
                # rope/attention broadcasts are ~170 MB per layer at 7B)
                def inner(x, lp):
                    x, _ = block(x, lp, None, None, None)
                    return x, None
                x, _ = jax.lax.scan(inner, x, group_params)
                return x, None
            x, _ = jax.lax.scan(jax.checkpoint(group_scan), x, grouped)
        else:
            def body(x, layer_params):
                x, _ = block(x, layer_params, None, None, None)
                return x, None
            x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    elif input_embeds.shape[1] == 1 or decode_multi:
        # decode step: fori_loop over layers with in-place updates on the
        # FULL stacked cache (layers.mha_decode). The scan path below would
        # restack [L, B, Hkv, Smax, D] k/v buffers every token — that HBM
        # copy (~cache size per step) dominated decode latency at 7B.
        from .layers import mha_decode
        S_new = input_embeds.shape[1]
        seg_new = (segment_ids if segment_ids is not None
                   else jnp.zeros((input_embeds.shape[0], S_new), jnp.int32))
        cache = cache.with_segments(seg_new)
        quant = cache.quantized

        def body(l, state):
            x, kc_all, vc_all, ks_all, vs_all = state
            layer_params = jax.tree.map(
                lambda p: jax.lax.dynamic_index_in_dim(p, l, 0,
                                                       keepdims=False),
                params["layers"])
            h = rms_norm(x, layer_params["attn_norm"], cfg.rms_norm_eps)
            attn_out, kc_all, vc_all, ks_all, vs_all = mha_decode(
                layer_params["attn"], h,
                num_heads=cfg.num_heads, num_kv_heads=cfg.num_kv_heads,
                head_dim=cfg.head_dim, rope=(cos, sin),
                kc_all=kc_all, vc_all=vc_all, layer=l,
                cache_len=cache.length, cache_segments=cache.segments,
                ks_all=ks_all, vs_all=vs_all)
            x = x + attn_out
            h = rms_norm(x, layer_params["mlp_norm"], cfg.rms_norm_eps)
            x = x + swiglu_mlp(layer_params["mlp"], h)
            return x, kc_all, vc_all, ks_all, vs_all

        if quant:
            x, nk, nv, nks, nvs = jax.lax.fori_loop(
                0, cfg.num_layers, body,
                (x, cache.k, cache.v, cache.k_scale, cache.v_scale))
            new_cache = cache._replace(k=nk, v=nv, k_scale=nks,
                                       v_scale=nvs).advance(S_new)
        else:
            def body_plain(l, state):
                x, kc_all, vc_all = state
                x, kc_all, vc_all, _, _ = body(l, (x, kc_all, vc_all,
                                                   None, None))
                return x, kc_all, vc_all
            x, nk, nv = jax.lax.fori_loop(0, cfg.num_layers, body_plain,
                                          (x, cache.k, cache.v))
            new_cache = cache._replace(k=nk, v=nv).advance(S_new)
    else:
        S = input_embeds.shape[1]
        seg_new = (segment_ids if segment_ids is not None
                   else jnp.zeros((input_embeds.shape[0], S), jnp.int32))
        cache = cache.with_segments(seg_new)

        if cache.quantized:
            def body(carry, xs):
                x, cache_len = carry
                layer_params, kc, vc, ks, vs = xs
                x, new_kv = block(x, layer_params, (kc, vc, ks, vs),
                                  cache_len, cache.segments)
                return (x, cache_len), new_kv
            (x, _), (nk, nv, nks, nvs) = jax.lax.scan(
                body, (x, cache.length),
                (params["layers"], cache.k, cache.v,
                 cache.k_scale, cache.v_scale))
            new_cache = cache._replace(k=nk, v=nv, k_scale=nks,
                                       v_scale=nvs).advance(S)
        else:
            def body(carry, xs):
                x, cache_len = carry
                layer_params, kc, vc = xs
                x, (nkc, nvc) = block(x, layer_params, (kc, vc), cache_len,
                                      cache.segments)
                return (x, cache_len), (nkc, nvc)
            (x, _), (nk, nv) = jax.lax.scan(
                body, (x, cache.length), (params["layers"], cache.k, cache.v))
            new_cache = cache._replace(k=nk, v=nv).advance(S)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    return x, new_cache


def lm_head(params: dict, cfg: LLMConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Logits in f32 (reference casts logits to float, vstream_qwen2vl_model.py:558)."""
    from .layers import dense
    w = params.get("lm_head")
    if w is None:
        w = params["embed"].T
    return dense(hidden, w).astype(jnp.float32)


def embed_tokens(params: dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    w = params["embed"]
    if hasattr(w, "q"):            # int8 embedding: gather rows, then scale
        return (w.q[input_ids].astype(jnp.bfloat16)
                * w.scale[0].astype(jnp.bfloat16))
    if hasattr(w, "q4"):           # int4 embedding: gather packed byte rows,
        # select the row's biased nibble, unbias, block-scale. Rows pack
        # along the VOCAB axis (quantize_weight4 axis -2) split-half: row r
        # lives in byte row r % (V//2) (low nibble for r < V//2, high above).
        half = w.q4.shape[0]
        byte = w.q4[input_ids % half]                      # [..., D] uint8
        lo = (byte & 0xF).astype(jnp.int8) - 8
        hi = (byte >> 4).astype(jnp.int8) - 8
        q = jnp.where((input_ids < half)[..., None], lo, hi)
        nb = w.scale.shape[0]
        bs = (w.q4.shape[0] * 2) // nb
        sc = w.scale[input_ids // bs]                      # [..., D]
        return q.astype(jnp.bfloat16) * sc.astype(jnp.bfloat16)
    return w[input_ids]


def _largest_divisor_le(n: int, cap: int) -> int:
    c = min(cap, n)
    while n % c:
        c -= 1
    return c


def cross_entropy_loss_chunked(params: dict, cfg: LLMConfig,
                               hidden: jnp.ndarray,   # [B, S, D]
                               labels: jnp.ndarray,   # [B, S]
                               chunk: int = 2048,
                               ignore_index: int = -100,
                               vocab_tile: int = 0) -> jnp.ndarray:
    """Shifted causal-LM loss WITHOUT materializing the [S, vocab] logits.

    At production shapes (S=14000, vocab=152k) full f32 logits are 8.5 GB —
    more than half a v5e chip. Sequence chunks run lm_head + CE inside a
    checkpointed lax.map, so only one [chunk, vocab] block is live at a
    time (forward and backward). Numerically identical to
    cross_entropy_loss(lm_head(...), labels)).

    vocab_tile > 0 additionally tiles the VOCAB axis with an online
    log-sum-exp (the flash-attention softmax trick applied to the loss):
    per tile only a [chunk, tile] logits block and — when the head is an
    int8 QuantWeight — a [D, tile] dequantized slice exist, so an int8
    lm_head never materializes its 1 GB bf16 copy. The label logit comes
    from an exact per-token column gather. QuantWeight heads default to
    tiling (8192). Checkpointed per tile: the backward recomputes tiles
    instead of saving them."""
    B, S, D = hidden.shape
    h = hidden[:, :-1]
    l = labels[:, 1:]
    n = S - 1
    pad = (-n) % chunk
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        l = jnp.pad(l, ((0, 0), (0, pad)), constant_values=ignore_index)
    nb = (n + pad) // chunk
    hs = h.reshape(B, nb, chunk, D).swapaxes(0, 1)      # [nb, B, chunk, D]
    ls = l.reshape(B, nb, chunk).swapaxes(0, 1)

    w = params.get("lm_head")
    quant = w is not None and hasattr(w, "q")
    quant4 = w is not None and hasattr(w, "q4")
    if vocab_tile == 0 and (quant or quant4):
        vocab_tile = 8192
    V = cfg.vocab_size

    def one(args):
        hh, ll = args
        logits = lm_head(params, cfg, hh)
        valid = ll != ignore_index
        safe = jnp.where(valid, ll, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return (jnp.sum(jnp.where(valid, nll, 0.0)),
                jnp.sum(valid.astype(jnp.int32)))

    def one_tiled(args):
        hh, ll = args                          # [B, chunk, D], [B, chunk]
        valid = ll != ignore_index
        safe = jnp.where(valid, ll, 0)

        vt = _largest_divisor_le(V, vocab_tile)
        nt = V // vt

        def tile_body(carry, t):
            m, s, lab = carry                  # [B, chunk] f32 each
            if quant:
                wq = jax.lax.dynamic_slice_in_dim(w.q, t * vt, vt, axis=1)
                sc = jax.lax.dynamic_slice_in_dim(w.scale, t * vt, vt,
                                                  axis=1)
                lg = jnp.dot(hh, wq.astype(hh.dtype),
                             preferred_element_type=jnp.float32)
                lg = lg * sc[0].astype(jnp.float32)
            elif quant4:
                # int4 head: dequantize only the [D, tile] column slice
                from ..weights.quantize import QuantWeight4, dequantize_weight4
                q4 = jax.lax.dynamic_slice_in_dim(w.q4, t * vt, vt, axis=1)
                sc = jax.lax.dynamic_slice_in_dim(w.scale, t * vt, vt, axis=1)
                lg = jnp.dot(hh,
                             dequantize_weight4(QuantWeight4(q4, sc),
                                                hh.dtype),
                             preferred_element_type=jnp.float32)
            elif w is None:
                wt = jax.lax.dynamic_slice_in_dim(params["embed"], t * vt,
                                                  vt, axis=0)
                lg = jnp.dot(hh, wt.T.astype(hh.dtype),
                             preferred_element_type=jnp.float32)
            else:
                wt = jax.lax.dynamic_slice_in_dim(w, t * vt, vt, axis=1)
                lg = jnp.dot(hh, wt.astype(hh.dtype),
                             preferred_element_type=jnp.float32)
            mt = jnp.max(lg, axis=-1)
            nm = jnp.maximum(m, mt)
            s = (s * jnp.exp(m - nm)
                 + jnp.sum(jnp.exp(lg - nm[..., None]), axis=-1))
            # the label logit of tokens whose label falls in this tile (a
            # tiny in-tile gather — a column gather of the full int8 head
            # transposes/copies it as a temp, measured +0.5 GB)
            local = safe - t * vt
            in_tile = (local >= 0) & (local < vt)
            got = jnp.take_along_axis(
                lg, jnp.clip(local, 0, vt - 1)[..., None], axis=-1)[..., 0]
            lab = jnp.where(in_tile, got, lab)
            return (nm, s, lab), None

        init = (jnp.full(ll.shape, -jnp.inf, jnp.float32),
                jnp.zeros(ll.shape, jnp.float32),
                jnp.zeros(ll.shape, jnp.float32))
        (m, s, lab), _ = jax.lax.scan(jax.checkpoint(tile_body), init,
                                      jnp.arange(nt))
        nll = m + jnp.log(s) - lab
        return (jnp.sum(jnp.where(valid, nll, 0.0)),
                jnp.sum(valid.astype(jnp.int32)))

    body = one_tiled if vocab_tile else one
    sums, counts = jax.lax.map(jax.checkpoint(body), (hs, ls))
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       ignore_index: int = -100) -> jnp.ndarray:
    """Shifted causal-LM loss, mean over non-ignored targets
    (reference: vstream_qwen2vl_model.py:560-571)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
