"""Shared transformer layers: norms, RoPE (1D / M-RoPE / 2D vision), MLPs,
attention with KV cache.

Functional style: parameters are plain nested-dict pytrees; every layer is a
pure function, so the whole stack jits/pjits and layer parameters can be
stacked and scanned (TPU-idiomatic: one compiled block body instead of L
unrolled copies).

Weight conventions follow HF checkpoints (rotate_half RoPE, separate
q/k/v/o projections) so HF safetensors convert 1:1 (weights/convert.py).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels.flash_attention import flash_attention


# ---------------------------------------------------------------------------
# Norms / activations
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)).astype(x.dtype)


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    """erf GELU (HF nn.GELU default; the tanh approximation drifts logits)."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": gelu_exact,
    "quick_gelu": quick_gelu,
    "silu": jax.nn.silu,
}


# w8a8 prefill: when enabled, QuantWeight matmuls with >= _W8A8_MIN_ROWS
# rows ALSO quantize the activations per-token to int8 and run an int8xint8
# MXU dot (2x the bf16 rate on v5e). Decode matvecs (1-8 rows) stay
# weight-only — they are HBM-bound, not MXU-bound. Trace-time flag: set it
# BEFORE building jitted programs (weights/quantize.enable_w8a8_prefill).
W8A8_PREFILL = False
_W8A8_MIN_ROWS = 128


def _w8a8_dot(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    xs = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(xq, q, (((xq.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (out.astype(jnp.float32) * xs * scale).astype(x.dtype)


def dense(x: jnp.ndarray, w, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Matmul accepting a plain weight, a weight-only int8 QuantWeight
    (weights/quantize.py: int8 operand converts in the MXU feed, per-channel
    scale on the output — HBM reads stay int8), or a merge-free LoRAWeight
    view (train/lora.py: x@w + ((x@a)@b)*scale — the merged matrix is never
    materialized and backward touches only the rank-r factors)."""
    if hasattr(w, "a"):            # LoRAWeight (base may itself be quantized)
        out = dense(x, w.w)
        out = out + jnp.dot(jnp.dot(x, w.a.astype(x.dtype)),
                            w.b.astype(x.dtype)).astype(out.dtype)
    elif hasattr(w, "q"):          # QuantWeight
        if (W8A8_PREFILL and x.ndim >= 2
                and x.shape[-2] >= _W8A8_MIN_ROWS):
            out = _w8a8_dot(x, w.q, w.scale)
        else:
            out = jnp.dot(x, w.q.astype(x.dtype))
            out = out * w.scale.astype(out.dtype)
    elif hasattr(w, "q4"):         # QuantWeight4 (4-bit base)
        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        from ..kernels.int4_matmul import int4_matmul, int4_matmul_supported
        if (w.q4.ndim == 2 and jax.default_backend() == "tpu"
                and int4_matmul_supported(rows, w.q4.shape[0],
                                          w.scale.shape[0], w.q4.shape[1])):
            # decode matvec: Pallas kernel reads the PACKED bytes from HBM
            # (0.5 B/weight) and unpacks+scales in VMEM — XLA would
            # materialize the dequantized matrix (19x slower, measured)
            out = int4_matmul(x.reshape(rows, x.shape[-1]), w.q4, w.scale,
                              out_dtype=x.dtype)
            out = out.reshape(*x.shape[:-1], w.q4.shape[-1])
        else:
            # prefill/training: block scales can't factor out of the dot, so
            # dequantize to a transient bf16 tile and let XLA schedule/free
            # it around the matmul (at S >= 4k the matmul is compute-bound,
            # so the extra weight write+read amortizes to noise; the 4x
            # argument-HBM saving is what fits a 7B QLoRA step on one chip)
            from ..weights.quantize import dequantize_weight4
            out = jnp.dot(x, dequantize_weight4(w, x.dtype))
    else:
        out = jnp.dot(x, w.astype(x.dtype))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Rotary embeddings
# ---------------------------------------------------------------------------

def rope_angles(positions: jnp.ndarray, head_dim: int,
                theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for HF-style rotate_half RoPE.

    positions: [..., S] -> cos/sin [..., S, head_dim] (the half-dim freqs
    duplicated, matching HF's `emb = cat(freqs, freqs)`).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def mrope_angles(positions: jnp.ndarray, head_dim: int,
                 sections: Tuple[int, int, int],
                 theta: float = 1000000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE (Qwen2-VL): positions [3, B, S] (t/h/w axes), sections split the
    half-dim frequency bands among the axes. Returns cos/sin [B, S, head_dim].

    Matches HF's apply_multimodal_rotary_pos_emb: freq band i takes its angle
    from axis sections_map[i].
    """
    assert sum(sections) == head_dim // 2
    cos3, sin3 = rope_angles(positions, head_dim, theta)   # [3, B, S, head_dim]
    # build the per-frequency axis selector over the duplicated layout
    sel = jnp.concatenate([
        jnp.full((s,), i, jnp.int32) for i, s in enumerate(sections)
    ])
    sel = jnp.concatenate([sel, sel])                       # [head_dim]
    cos = jnp.take_along_axis(
        jnp.moveaxis(cos3, 0, -1), sel[None, None, :, None], axis=-1)[..., 0]
    sin = jnp.take_along_axis(
        jnp.moveaxis(sin3, 0, -1), sel[None, None, :, None], axis=-1)[..., 0]
    return cos, sin


def vision_rope_angles(hpos: jnp.ndarray, wpos: jnp.ndarray,
                       head_dim: int, theta: float = 10000.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Qwen2-VL vision 2D rotary: half the (half-dim) bands rotate by the
    h position, the other half by w. hpos/wpos: [S] -> cos/sin [S, head_dim].

    Matches VisionRotaryEmbedding(head_dim//2) + stack([h, w]).flatten(1)
    (vstream_qwen2vl_model.py:359-386).
    """
    quarter = head_dim // 4
    inv_freq = 1.0 / (theta ** (jnp.arange(0, quarter, dtype=jnp.float32) / quarter))
    hf = hpos.astype(jnp.float32)[:, None] * inv_freq       # [S, quarter]
    wf = wpos.astype(jnp.float32)[:, None] * inv_freq
    freqs = jnp.concatenate([hf, wf], axis=-1)              # [S, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)          # [S, head_dim]
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, S, D]; cos/sin: [B, S, D] or [S, D]."""
    if cos.ndim == 2:
        cos, sin = cos[None], sin[None]
    cos = cos[:, None].astype(jnp.float32)
    sin = sin[:, None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    return (xf * cos + rotate_half(xf) * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Stacked per-layer KV cache. The decoder's scan-over-layers threads the
    per-layer [B, Hkv, Smax, D] slices through the scan body; `length` is the
    filled prefix (shared across layers). `segments` tracks per-position
    segment ids (-1 = padding) so left-padded batched prompts mask correctly
    during decode.

    dtype=int8 stores k/v quantized per (position, head) with f32 scales
    (k_scale/v_scale, [L, B, Hkv, Smax, 1]) — decode is bound by cache HBM
    reads, and int8 halves them at <1% score error (weights/quantize.py is
    the same trade for the weight matvecs)."""
    k: jnp.ndarray         # [L, B, Hkv, Smax, D]
    v: jnp.ndarray         # [L, B, Hkv, Smax, D]
    length: jnp.ndarray    # [] int32: filled prefix length
    segments: jnp.ndarray  # [B, Smax] int32; -1 = padding
    k_scale: Optional[jnp.ndarray] = None   # [L, B, Hkv, Smax, 1] f32
    v_scale: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, num_layers: int, batch: int, num_kv_heads: int,
               max_len: int, head_dim: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (num_layers, batch, num_kv_heads, max_len, head_dim)
        ks = vs = None
        if dtype == jnp.int8:
            # two distinct buffers: aliased leaves in a donated pytree are a
            # double-donation error
            ks = jnp.zeros(shape[:-1] + (1,), jnp.float32)
            vs = jnp.zeros(shape[:-1] + (1,), jnp.float32)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32),
                   jnp.full((batch, max_len), -1, jnp.int32), ks, vs)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    def advance(self, n) -> "KVCache":
        return self._replace(length=self.length + n)

    def with_segments(self, seg: jnp.ndarray) -> "KVCache":
        """Write segment ids for the S tokens being appended at `length`."""
        new = jax.lax.dynamic_update_slice(
            self.segments, seg.astype(jnp.int32), (0, self.length))
        return self._replace(segments=new)


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the head_dim axis: x [..., D] ->
    (int8 [..., D], f32 scale [..., 1])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                 -127, 127).astype(jnp.int8)
    return q, scale


# ---------------------------------------------------------------------------
# Attention / MLP blocks
# ---------------------------------------------------------------------------

def init_dense(key, din, dout, bias=False, dtype=jnp.float32, scale=None):
    if scale is None:
        scale = 1.0 / math.sqrt(din)
    p = {"w": jax.random.normal(key, (din, dout), dtype) * scale}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def cache_attention(q, kc, vc, ks, vs, *, q_offset, q_segment_ids,
                    kv_segment_ids):
    """Decode-step attention over a (possibly int8-quantized) cache prefix.

    bf16 caches go through flash_attention's XLA decode path. int8 caches
    stay int8 in HBM (the convert fuses into the dot operand feed); the
    per-position scales apply to the scores (q.(k*s) = (q.k_q)*s) and to p
    before the PV matvec."""
    if ks is None:
        return flash_attention(q, kc, vc, causal=True, q_offset=q_offset,
                               q_segment_ids=q_segment_ids,
                               kv_segment_ids=kv_segment_ids)
    B, Hq, Sq, D = q.shape
    Hkv, Skv = kc.shape[1], kc.shape[2]
    g = Hq // Hkv
    scale = 1.0 / (D ** 0.5)
    qg = q.reshape(B, Hkv, g, Sq, D)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, kc.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    s = s * ks[..., 0][:, :, None, None, :] * scale
    mask = jnp.ones((B, 1, 1, Sq, Skv), bool)
    qi = jnp.arange(Sq)[:, None] + q_offset
    ki = jnp.arange(Skv)[None, :]
    mask = mask & (qi >= ki)[None, None, None]
    if kv_segment_ids is not None:
        seg = (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
        seg = seg & (kv_segment_ids[:, None, :] >= 0)
        mask = mask & seg[:, None, None]
    from ..kernels.flash_attention import DEFAULT_MASK_VALUE
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)
    pv = (p * vs[..., 0][:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", pv, vc.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return out.reshape(B, Hq, Sq, D).astype(q.dtype)


def mha(
    params: dict,
    x: jnp.ndarray,                      # [B, S, D]
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    causal: bool = False,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    kv_cache: Optional[Tuple] = None,    # per-layer (k, v[, ks, vs])
    cache_len: Optional[jnp.ndarray] = None,
    cache_segments: Optional[jnp.ndarray] = None,   # [B, Smax] (-1 padding)
) -> Tuple[jnp.ndarray, Optional[Tuple]]:
    """Multi-head attention with optional GQA, RoPE and per-layer KV cache.

    With a cache: S > 1 is a prefill (cache assumed to start at cache_len=0;
    attention runs over the fresh k/v through the fused Pallas path); S == 1
    is a decode step (one query against the cache prefix). int8 caches carry
    per-position scales as the 3rd/4th cache elements. Returns the updated
    per-layer cache slices.
    """
    B, S, D = x.shape
    q = dense(x, params["wq"]["w"], params["wq"].get("b"))
    k = dense(x, params["wk"]["w"], params["wk"].get("b"))
    v = dense(x, params["wv"]["w"], params["wv"].get("b"))
    q = q.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    if rope is not None:
        q = apply_rope(q, *rope)
        k = apply_rope(k, *rope)

    new_cache = None
    if kv_cache is not None:
        kc, vc = kv_cache[0], kv_cache[1]
        quant = kc.dtype == jnp.int8
        start = (0, 0, cache_len, 0)
        if quant:
            kq, ksn = quantize_kv(k)
            vq, vsn = quantize_kv(v)
            kc = jax.lax.dynamic_update_slice(kc, kq, start)
            vc = jax.lax.dynamic_update_slice(vc, vq, start)
            ksc = jax.lax.dynamic_update_slice(kv_cache[2], ksn, start)
            vsc = jax.lax.dynamic_update_slice(kv_cache[3], vsn, start)
            new_cache = (kc, vc, ksc, vsc)
        else:
            kc = jax.lax.dynamic_update_slice(kc, k.astype(kc.dtype), start)
            vc = jax.lax.dynamic_update_slice(vc, v.astype(vc.dtype), start)
            ksc = vsc = None
            new_cache = (kc, vc)
        if S > 1:
            out = flash_attention(q, k, v, causal=True,
                                  q_segment_ids=q_segment_ids,
                                  kv_segment_ids=kv_segment_ids)
        else:
            # batched decode with left-padded prompts: mask padded cache slots
            q_seg = (jnp.zeros((B, S), jnp.int32)
                     if cache_segments is not None else None)
            out = cache_attention(q, kc, vc, ksc, vsc, q_offset=cache_len,
                                  q_segment_ids=q_seg,
                                  kv_segment_ids=cache_segments)
    else:
        out = flash_attention(q, k, v, causal=causal,
                              q_segment_ids=q_segment_ids,
                              kv_segment_ids=kv_segment_ids)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, num_heads * head_dim)
    out = dense(out, params["wo"]["w"], params["wo"].get("b"))
    return out, new_cache


def mha_decode(
    params: dict,
    x: jnp.ndarray,                      # [B, 1, D] single decode token
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    rope: Tuple[jnp.ndarray, jnp.ndarray],
    kc_all: jnp.ndarray,                 # [L, B, Hkv, Smax, D] stacked cache
    vc_all: jnp.ndarray,
    layer: jnp.ndarray,                  # [] int32 layer index
    cache_len: jnp.ndarray,              # [] int32 filled prefix
    cache_segments: Optional[jnp.ndarray],   # [B, Smax] (-1 padding)
    ks_all: Optional[jnp.ndarray] = None,    # int8 cache scales
    vs_all: Optional[jnp.ndarray] = None,
) -> Tuple:
    """Decode-step attention updating the FULL stacked cache in place.

    The prefill path threads per-layer cache slices through a scan, which
    restacks the whole [L, B, Hkv, Smax, D] buffers every call — fine once
    per prompt, but at decode that HBM copy dominates the step. Here the new
    token's k/v write into the stacked buffers with a [1,B,Hkv,1,D]
    dynamic_update_slice (bytes ~ B*Hkv*D, not the cache size), which XLA
    performs in place on the loop-carried buffer.
    """
    B, S, D = x.shape
    q = dense(x, params["wq"]["w"], params["wq"].get("b"))
    k = dense(x, params["wk"]["w"], params["wk"].get("b"))
    v = dense(x, params["wv"]["w"], params["wv"].get("b"))
    q = q.reshape(B, S, num_heads, head_dim).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    q = apply_rope(q, *rope)
    k = apply_rope(k, *rope)

    start = (layer, 0, 0, cache_len, 0)
    if ks_all is not None:
        kq, ksn = quantize_kv(k)
        vq, vsn = quantize_kv(v)
        kc_all = jax.lax.dynamic_update_slice(kc_all, kq[None], start)
        vc_all = jax.lax.dynamic_update_slice(vc_all, vq[None], start)
        ks_all = jax.lax.dynamic_update_slice(ks_all, ksn[None], start)
        vs_all = jax.lax.dynamic_update_slice(vs_all, vsn[None], start)
        ks = jax.lax.dynamic_index_in_dim(ks_all, layer, 0, keepdims=False)
        vs = jax.lax.dynamic_index_in_dim(vs_all, layer, 0, keepdims=False)
    else:
        kc_all = jax.lax.dynamic_update_slice(
            kc_all, k[None].astype(kc_all.dtype), start)
        vc_all = jax.lax.dynamic_update_slice(
            vc_all, v[None].astype(vc_all.dtype), start)
        ks = vs = None
    kc = jax.lax.dynamic_index_in_dim(kc_all, layer, 0, keepdims=False)
    vc = jax.lax.dynamic_index_in_dim(vc_all, layer, 0, keepdims=False)
    q_seg = (jnp.zeros((B, S), jnp.int32)
             if cache_segments is not None else None)
    out = cache_attention(q, kc, vc, ks, vs, q_offset=cache_len,
                          q_segment_ids=q_seg,
                          kv_segment_ids=cache_segments)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, num_heads * head_dim)
    out = dense(out, params["wo"]["w"], params["wo"].get("b"))
    return out, kc_all, vc_all, ks_all, vs_all


def swiglu_mlp(params: dict, x: jnp.ndarray,
               seq_chunk: int = 0) -> jnp.ndarray:
    """SwiGLU MLP; seq_chunk > 0 processes the sequence in checkpointed
    chunks. The MLP is per-token, so chunking is exact — it exists because
    one layer's BACKWARD holds ~4 [S, I] intermediates (gate, up, dsilu,
    dgate), which at production training shapes (S=14000, I=18944 bf16) is
    ~2 GB of transient HBM; chunking caps it at 4 [chunk, I]."""
    if seq_chunk and x.ndim == 3 and x.shape[1] > seq_chunk:
        B, S, D = x.shape
        c = seq_chunk
        while S % c:                  # largest divisor of S <= seq_chunk
            c -= 1
        if c == 1:
            return swiglu_mlp(params, x)
        xs = x.reshape(B, S // c, c, D).swapaxes(0, 1)

        def one(h):
            return swiglu_mlp(params, h)
        out = jax.lax.map(jax.checkpoint(one), xs)
        return out.swapaxes(0, 1).reshape(B, S, D)
    gate = dense(x, params["gate"]["w"])
    up = dense(x, params["up"]["w"])
    return dense(jax.nn.silu(gate) * up, params["down"]["w"])


def gelu_mlp(params: dict, x: jnp.ndarray, act: str = "quick_gelu") -> jnp.ndarray:
    h = ACTIVATIONS[act](dense(x, params["fc1"]["w"], params["fc1"].get("b")))
    return dense(h, params["fc2"]["w"], params["fc2"].get("b"))
