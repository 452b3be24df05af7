"""Sequence parallelism: ring attention over an 'sp' mesh axis.

Beyond the reference — it has NO distributed attention of any kind (its
training forward asserts "not support cache + dist_attn yet",
vstream_qwen2vl_model.py:508-509; long video is handled only by bounding
the token budget, SURVEY.md §5.7). Here the sequence dimension shards
across chips and attention runs as a RING: K/V chunks rotate neighbor-to-
neighbor over ICI (`ppermute`) while each chip's Q stays resident,
accumulating the softmax online (running max / denominator), so no chip
ever materializes the full sequence.

Design notes:
- the ring is a STATIC python loop over n_sp steps (n_sp is a mesh
  constant), each step one ppermute + one chunk-attention — XLA overlaps
  the collective with the next step's compute (latency hiding over ICI).
- online-softmax combination is exact (same math as flash attention's kv
  loop, lifted to the inter-chip level); a causal mask compares GLOBAL
  positions derived from the chunk's ring offset.
- everything is plain jnp + ppermute, so `jax.grad` differentiates through
  the ring (the transpose of ppermute is the reverse rotation): sequence-
  parallel TRAINING needs no custom backward.
- per-step scores materialize at [B, H, S_local, S_local] — the chunk
  granularity bounds memory exactly like flash attention's kv blocks bound
  VMEM; the Pallas kernel can slot under each chunk step later without
  changing the ring protocol.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import LLMConfig

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def create_sp_mesh(sp: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    sp = sp or len(devices)
    return Mesh(np.asarray(devices[:sp]), ("sp",))


def ring_attention_local(q, k, v, *, axis: str, n_sp: int, causal: bool,
                         scale: Optional[float] = None,
                         q_segment_ids=None, kv_segment_ids=None):
    """Inside shard_map over `axis`: q/k/v are the LOCAL sequence chunk
    [B, H, S_local, D] (kv heads must equal q heads here — GQA expands
    before entry or shards heads over a tp axis). segment ids are the local
    [B, S_local] chunks. Returns local attention output [B, H, S_local, D].
    """
    B, H, Sl, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)
    r = jax.lax.axis_index(axis)
    qpos = r * Sl + jnp.arange(Sl)                       # global q positions

    m = jnp.full((B, H, Sl, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((B, H, Sl, 1), jnp.float32)
    acc = jnp.zeros((B, H, Sl, D), jnp.float32)
    perm = [(i, (i + 1) % n_sp) for i in range(n_sp)]

    kc, vc, kseg = k, v, kv_segment_ids
    for step in range(n_sp):                             # static ring walk
        kv_rank = (r - step) % n_sp
        kpos = kv_rank * Sl + jnp.arange(Sl)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kc,
                       preferred_element_type=jnp.float32) * scale
        mask = jnp.ones((B, 1, Sl, Sl), bool)
        if causal:
            mask = mask & (qpos[:, None] >= kpos[None, :])[None, None]
        if q_segment_ids is not None:
            seg = (q_segment_ids[:, :, None] == kseg[:, None, :])
            seg = seg & (kseg[:, None, :] >= 0)
            mask = mask & seg[:, None]
        s = jnp.where(mask, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), vc,
            preferred_element_type=jnp.float32)
        m = m_new
        if step < n_sp - 1:                              # rotate kv chunks
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            if kseg is not None:
                kseg = jax.lax.ppermute(kseg, axis, perm)

    safe_l = jnp.where(l > 0, l, 1.0)
    out = acc / safe_l * (l > 0)
    return out.astype(q.dtype)


def sp_decoder_forward(
    params: dict,                  # full LLM tree (stacked layers [L, ...])
    cfg: LLMConfig,
    input_embeds: jnp.ndarray,     # [B, S, D]; S % n_sp == 0
    positions: jnp.ndarray,        # [B, S] or [3, B, S]
    *,
    mesh: Mesh,
    segment_ids: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Sequence-parallel no-cache decoder stack: activations shard over
    'sp' on the sequence dim (each chip holds S/n tokens of every layer —
    the long-context memory win), attention runs as a ring, LN/MLP are
    position-local so they need no communication at all. Returns final
    hidden [B, S, D] (post final_norm), equal to `decoder_forward`
    (test-pinned). Params are replicated; grads psum over 'sp' through the
    shard_map transpose."""
    from ..models.llm import _rope_for
    from ..models.layers import rms_norm, dense, swiglu_mlp

    n_sp = mesh.shape["sp"]
    B, S, D = input_embeds.shape
    assert S % n_sp == 0, f"seq {S} % sp {n_sp} != 0"
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    g = Hq // Hkv
    cos, sin = _rope_for(cfg, positions)        # [B, S, hd] — shards with S

    def run(layers, x, cos, sin, seg):
        def block(x, lp):
            h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
            q = dense(h, lp["attn"]["wq"]["w"], lp["attn"]["wq"].get("b"))
            k = dense(h, lp["attn"]["wk"]["w"], lp["attn"]["wk"].get("b"))
            v = dense(h, lp["attn"]["wv"]["w"], lp["attn"]["wv"].get("b"))
            Sl = x.shape[1]
            q = q.reshape(B, Sl, Hq, hd).transpose(0, 2, 1, 3)
            k = k.reshape(B, Sl, Hkv, hd).transpose(0, 2, 1, 3)
            v = v.reshape(B, Sl, Hkv, hd).transpose(0, 2, 1, 3)
            from ..models.layers import apply_rope
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if g > 1:                     # expand GQA groups for the ring
                k = jnp.repeat(k, g, axis=1)
                v = jnp.repeat(v, g, axis=1)
            attn = ring_attention_local(
                q, k, v, axis="sp", n_sp=n_sp, causal=True,
                q_segment_ids=seg, kv_segment_ids=seg)
            attn = attn.transpose(0, 2, 1, 3).reshape(B, Sl, Hq * hd)
            x = x + dense(attn, lp["attn"]["wo"]["w"],
                          lp["attn"]["wo"].get("b"))
            h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
            return x + swiglu_mlp(lp["mlp"], h), None

        blk = jax.checkpoint(block) if remat else block
        x, _ = jax.lax.scan(blk, x, layers)
        return x

    seg_args = (segment_ids,) if segment_ids is not None else ()

    # XLA CPU's AllReducePromotion pass CHECK-fails while cloning a bf16
    # all-reduce ("Invalid binary instruction opcode copy"), and the grad of
    # the replicated param in_spec below is exactly such a psum when params
    # are bf16. On the CPU backend only, ship the params through f32 so the
    # transpose's psum is f32 (exact: fwd casts back to the original dtype
    # before any compute); TPU keeps bf16 collectives on ICI.
    layers_in = params["layers"]
    layer_dtypes = jax.tree.map(lambda a: a.dtype, layers_in)
    cpu_f32_detour = jax.default_backend() == "cpu" and any(
        d == jnp.bfloat16 for d in jax.tree.leaves(layer_dtypes))
    if cpu_f32_detour:
        layers_in = jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == jnp.bfloat16
            else a, layers_in)

    def wrapped(layers, x, cos, sin, *seg):
        if cpu_f32_detour:
            layers = jax.tree.map(lambda a, d: a.astype(d),
                                  layers, layer_dtypes)
        return run(layers, x, cos, sin, seg[0] if seg else None)

    # composition with other mesh axes (dp x sp training): only 'sp' is
    # manual; dp stays automatic so the outer pjit's batch/ZeRO shardings
    # pass through
    extra = ({"axis_names": {"sp"}} if set(mesh.axis_names) != {"sp"}
             else {})
    ys = jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), layers_in),
                  P(None, "sp"), P(None, "sp"), P(None, "sp"))
        + ((P(None, "sp"),) if segment_ids is not None else ()),
        out_specs=P(None, "sp"),
        check_vma=False,
        **extra,
    )(layers_in, input_embeds, cos, sin, *seg_args)

    return rms_norm(ys, params["final_norm"], cfg.rms_norm_eps)
