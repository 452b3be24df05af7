"""Sequential frame-compression ops (drop / merge / k-drop / k-merge).

Reference semantics: drop_feature, merge_feature, k_drop_feature,
k_merge_feature in Flash-VStream-LLaVA/flash_vstream/model/
compress_functions.py:20-260 (identical copies in the Qwen subproject).

These ops are inherently sequential — each incoming frame mutates a small
buffer of T0 kept frames — so the TPU-first design is a lax.scan over incoming
frames with fixed-shape state:

- state buffers are padded to T0 (+1 scratch row for the incoming frame);
- "delete element idx and shift left" becomes a gather with index map
  i -> i + (i >= idx), which XLA lowers to a single dynamic-gather;
- variable T is handled by scanning to a static Tmax with a per-step valid
  flag (invalid steps pass state through unchanged), so one compiled program
  serves every video length in a bucket.

The `drop` op's coin flip (compress_functions.py:40) uses jax.random with an
explicit key instead of python's global RNG.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .distances import cosine_similarity, l2_normalize

_NEG = -100.0


class SeqCompressResult(NamedTuple):
    features: jnp.ndarray   # [T0, D]
    valid: jnp.ndarray      # [T0] bool
    aux: jnp.ndarray        # neighbor sims [T0] or sim matrix [T0, T0]


def _delete_shift(buf: jnp.ndarray, idx: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Remove row `idx` from buf ([N, ...]) returning the first out_len rows."""
    i = jnp.arange(out_len)
    src = i + (i >= idx)
    return buf[src]


def _neighbor_sims(x: jnp.ndarray) -> jnp.ndarray:
    """sim[i] = cos(x[i], x[i+1]); last entry is padding."""
    s = cosine_similarity(x[:-1], x[1:])
    return jnp.concatenate([s, jnp.full((1,), _NEG, s.dtype)])


def merge_frames(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int) -> SeqCompressResult:
    """Streaming neighbor-merge compression to at most t0 frames.

    x: [Tmax, D] (frames flattened over patches), n_valid: actual frame count.
    Mirrors merge_feature: repeatedly average the most-similar adjacent pair.
    """
    Tmax, D = x.shape
    assert Tmax >= t0
    feat0 = x[:t0].astype(jnp.float32)
    sim0 = _neighbor_sims(feat0)                     # [t0]; sim0[t0-1] = pad
    # mask sims beyond valid prefix
    i = jnp.arange(t0)
    sim0 = jnp.where(i < jnp.minimum(n_valid, t0) - 1, sim0, _NEG)

    def step(carry, inp):
        feat, sim = carry
        new, t = inp                                  # frame [D], index t
        is_live = t < n_valid

        asim = sim.at[t0 - 1].set(cosine_similarity(feat[t0 - 1], new))  # [t0]
        af = jnp.concatenate([feat, new[None].astype(jnp.float32)], 0)   # [t0+1, D]
        idx = jnp.argmax(asim)
        merged = (af[idx] + af[idx + 1]) / 2.0
        af = af.at[idx + 1].set(merged)
        nfeat = _delete_shift(af, idx, t0)
        # shifted sims, then recompute at the two positions touching the merge
        j = jnp.arange(t0)
        nsim = asim[jnp.minimum(j + (j >= idx), t0 - 1)]
        nsim = nsim.at[t0 - 1].set(_NEG)
        def patch(s, k):
            kc = jnp.clip(k, 0, t0 - 2)
            val = cosine_similarity(nfeat[kc], nfeat[kc + 1])
            ok = (k >= 0) & (k < t0 - 1)
            return s.at[kc].set(jnp.where(ok, val, s[kc]))
        nsim = patch(nsim, idx - 1)   # reference: if idx > 0
        nsim = patch(nsim, idx)       # reference: if idx + 1 < T0

        feat = jnp.where(is_live, nfeat, feat)
        sim = jnp.where(is_live, nsim, sim)
        return (feat, sim), None

    (feat, sim), _ = jax.lax.scan(
        step, (feat0, sim0),
        (x[t0:].astype(jnp.float32), jnp.arange(t0, Tmax)))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    return SeqCompressResult(feat, valid, sim)


def drop_frames(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int,
                key: jax.Array) -> SeqCompressResult:
    """Streaming similarity-drop compression to at most t0 frames.

    Mirrors drop_feature: drop one of the most-similar adjacent pair, side
    chosen by a fair coin (jax.random replaces the reference's random.randint).
    """
    Tmax, D = x.shape
    feat0 = x[:t0].astype(jnp.float32)
    sim0 = _neighbor_sims(feat0)
    i = jnp.arange(t0)
    sim0 = jnp.where(i < jnp.minimum(n_valid, t0) - 1, sim0, _NEG)
    coins = jax.random.bernoulli(key, 0.5, (Tmax - t0,))

    def step(carry, inp):
        feat, sim = carry
        new, t, coin = inp
        is_live = t < n_valid

        asim = sim.at[t0 - 1].set(cosine_similarity(feat[t0 - 1], new))  # [t0]
        af = jnp.concatenate([feat, new[None].astype(jnp.float32)], 0)
        idx = jnp.argmax(asim) + coin.astype(jnp.int32)     # may equal t0
        nfeat = _delete_shift(af, idx, t0)
        j = jnp.arange(t0)
        nsim = asim[jnp.minimum(j + (j >= idx), t0 - 1)]
        nsim = nsim.at[t0 - 1].set(_NEG)
        # patch the joined neighbor pair when an interior frame was dropped
        k = idx - 1
        patch_needed = (idx > 0) & (idx < t0)
        val = cosine_similarity(nfeat[jnp.clip(k, 0, t0 - 2)],
                                nfeat[jnp.clip(k + 1, 0, t0 - 1)])
        nsim = nsim.at[jnp.clip(k, 0, t0 - 1)].set(
            jnp.where(patch_needed, val, nsim[jnp.clip(k, 0, t0 - 1)]))

        feat = jnp.where(is_live, nfeat, feat)
        sim = jnp.where(is_live, nsim, sim)
        return (feat, sim), None

    (feat, sim), _ = jax.lax.scan(
        step, (feat0, sim0),
        (x[t0:].astype(jnp.float32), jnp.arange(t0, Tmax), coins))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    return SeqCompressResult(feat, valid, sim)


def _full_sim_matrix(nf: jnp.ndarray) -> jnp.ndarray:
    s = jnp.dot(nf, nf.T, preferred_element_type=jnp.float32)
    return jnp.where(jnp.eye(nf.shape[0], dtype=bool), _NEG, s)


def _k_step_common(feat, nf, sim, new, t0):
    """Extend state buffers with the incoming frame; return argmax pair."""
    nnew = l2_normalize(new[None])                                  # [1, D]
    new_sim = jnp.dot(nf, nnew.T, preferred_element_type=jnp.float32)  # [t0,1]
    af = jnp.concatenate([feat, new[None].astype(jnp.float32)], 0)  # [t0+1,D]
    anf = jnp.concatenate([nf, nnew], 0)
    asim = jnp.full((t0 + 1, t0 + 1), _NEG, jnp.float32)
    asim = asim.at[:t0, :t0].set(sim)
    asim = asim.at[:t0, t0].set(new_sim[:, 0])
    asim = asim.at[t0, :t0].set(new_sim[:, 0])
    flat = jnp.argmax(asim)
    left, right = flat // (t0 + 1), flat % (t0 + 1)
    return af, anf, asim, left, right


def _delete_rowcol(mat: jnp.ndarray, idx: jnp.ndarray, out_len: int) -> jnp.ndarray:
    i = jnp.arange(out_len)
    src = i + (i >= idx)
    return mat[src][:, src]


def k_drop_frames(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int,
                  key: jax.Array) -> SeqCompressResult:
    """Global-pair drop compression (k_drop_feature): drop one member of the
    globally most-similar pair, side chosen by a fair coin."""
    Tmax, D = x.shape
    feat0 = x[:t0].astype(jnp.float32)
    nf0 = l2_normalize(feat0)
    sim0 = _full_sim_matrix(nf0)
    m = jnp.minimum(n_valid, t0)
    live = jnp.arange(t0) < m
    sim0 = jnp.where(live[:, None] & live[None, :], sim0, _NEG)
    coins = jax.random.bernoulli(key, 0.5, (Tmax - t0,))

    def step(carry, inp):
        feat, nf, sim = carry
        new, t, coin = inp
        is_live = t < n_valid
        af, anf, asim, left, right = _k_step_common(feat, nf, sim, new, t0)
        idx = jnp.where(coin, left, right)
        nfeat = _delete_shift(af, idx, t0)
        nnf = _delete_shift(anf, idx, t0)
        nsim = _delete_rowcol(asim, idx, t0)
        feat = jnp.where(is_live, nfeat, feat)
        nf = jnp.where(is_live, nnf, nf)
        sim = jnp.where(is_live, nsim, sim)
        return (feat, nf, sim), None

    (feat, _, sim), _ = jax.lax.scan(
        step, (feat0, nf0, sim0),
        (x[t0:].astype(jnp.float32), jnp.arange(t0, Tmax), coins))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    return SeqCompressResult(feat, valid, sim)


def k_merge_frames(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int) -> SeqCompressResult:
    """Global-pair merge compression (k_merge_feature): average the globally
    most-similar pair into the `right` slot, delete the `left` slot."""
    Tmax, D = x.shape
    feat0 = x[:t0].astype(jnp.float32)
    nf0 = l2_normalize(feat0)
    sim0 = _full_sim_matrix(nf0)
    m = jnp.minimum(n_valid, t0)
    live = jnp.arange(t0) < m
    sim0 = jnp.where(live[:, None] & live[None, :], sim0, _NEG)

    def step(carry, inp):
        feat, nf, sim = carry
        new, t = inp
        is_live = t < n_valid
        af, anf, asim, left, right = _k_step_common(feat, nf, sim, new, t0)
        merged = (af[left] + af[right]) / 2.0
        af = af.at[right].set(merged)
        anf = anf.at[right].set(l2_normalize(merged[None])[0])
        rs = jnp.dot(anf, anf[right][:, None],
                     preferred_element_type=jnp.float32)[:, 0]      # [t0+1]
        asim = asim.at[right, :].set(rs)
        asim = asim.at[:, right].set(rs)
        asim = asim.at[right, right].set(_NEG)
        nfeat = _delete_shift(af, left, t0)
        nnf = _delete_shift(anf, left, t0)
        nsim = _delete_rowcol(asim, left, t0)
        feat = jnp.where(is_live, nfeat, feat)
        nf = jnp.where(is_live, nnf, nf)
        sim = jnp.where(is_live, nsim, sim)
        return (feat, nf, sim), None

    (feat, _, sim), _ = jax.lax.scan(
        step, (feat0, nf0, sim0),
        (x[t0:].astype(jnp.float32), jnp.arange(t0, Tmax)))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    return SeqCompressResult(feat, valid, sim)


class TimedSeqResult(NamedTuple):
    """Sequential compression result that also tracks per-slot provenance:
    member weight (frame count folded into the slot) and the weighted mean of
    member timestamps. Needed by the Qwen temporal_compress registry, whose
    downstream (spatial_enhance retrieval + AM-RoPE) consumes (weights,
    timestamps) per CSM slot (vstream_qwen2vl_model.py:176-179). The
    reference's own 'merge'/'drop' registry entries return 3-tuples into a
    4-way unpack and crash (vstream_qwen2vl_model.py:164-176 vs
    compress_functions.py:64,98) — these semantics are this repo's defined
    behavior for those methods (documented deviation)."""
    features: jnp.ndarray   # [t0, D] f32
    valid: jnp.ndarray      # [t0] bool
    weights: jnp.ndarray    # [t0] f32 member weight per slot
    times: jnp.ndarray      # [t0] f32 weighted mean member timestamp


def merge_frames_timed(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int,
                       times: Optional[jnp.ndarray] = None,
                       weights: Optional[jnp.ndarray] = None
                       ) -> TimedSeqResult:
    """merge_frames + provenance: slot weight = sum of member weights, slot
    time = weighted mean of member times. Feature blending stays the
    reference's plain (a+b)/2 average (compress_functions.py:89) regardless
    of weights; weights/times only track membership. Initial per-frame
    weights default to 1 (streaming passes accumulated cluster weights)."""
    Tmax, D = x.shape
    assert Tmax >= t0
    if times is None:
        times = jnp.arange(Tmax, dtype=jnp.float32)
    if weights is None:
        weights = jnp.ones((Tmax,), jnp.float32)
    times = times.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    feat0 = x[:t0].astype(jnp.float32)
    sim0 = _neighbor_sims(feat0)
    i = jnp.arange(t0)
    sim0 = jnp.where(i < jnp.minimum(n_valid, t0) - 1, sim0, _NEG)
    cnt0 = weights[:t0]
    tsum0 = times[:t0] * cnt0

    def step(carry, inp):
        feat, sim, cnt, tsum = carry
        new, new_w, new_t, t = inp
        is_live = t < n_valid

        asim = sim.at[t0 - 1].set(cosine_similarity(feat[t0 - 1], new))
        af = jnp.concatenate([feat, new[None].astype(jnp.float32)], 0)
        acnt = jnp.concatenate([cnt, new_w[None]], 0)
        atsum = jnp.concatenate([tsum, (new_t * new_w)[None]], 0)
        idx = jnp.argmax(asim)
        merged = (af[idx] + af[idx + 1]) / 2.0
        af = af.at[idx + 1].set(merged)
        acnt = acnt.at[idx + 1].set(acnt[idx] + acnt[idx + 1])
        atsum = atsum.at[idx + 1].set(atsum[idx] + atsum[idx + 1])
        nfeat = _delete_shift(af, idx, t0)
        ncnt = _delete_shift(acnt, idx, t0)
        ntsum = _delete_shift(atsum, idx, t0)
        j = jnp.arange(t0)
        nsim = asim[jnp.minimum(j + (j >= idx), t0 - 1)]
        nsim = nsim.at[t0 - 1].set(_NEG)
        def patch(s, k):
            kc = jnp.clip(k, 0, t0 - 2)
            val = cosine_similarity(nfeat[kc], nfeat[kc + 1])
            ok = (k >= 0) & (k < t0 - 1)
            return s.at[kc].set(jnp.where(ok, val, s[kc]))
        nsim = patch(nsim, idx - 1)
        nsim = patch(nsim, idx)

        feat = jnp.where(is_live, nfeat, feat)
        sim = jnp.where(is_live, nsim, sim)
        cnt = jnp.where(is_live, ncnt, cnt)
        tsum = jnp.where(is_live, ntsum, tsum)
        return (feat, sim, cnt, tsum), None

    (feat, sim, cnt, tsum), _ = jax.lax.scan(
        step, (feat0, sim0, cnt0, tsum0),
        (x[t0:].astype(jnp.float32), weights[t0:], times[t0:],
         jnp.arange(t0, Tmax)))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    out_t = jnp.where(cnt > 0, tsum / jnp.maximum(cnt, 1e-30), 0.0)
    return TimedSeqResult(feat, valid, jnp.where(valid, cnt, 0.0),
                          jnp.where(valid, out_t, 0.0))


def drop_frames_timed(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int,
                      key: jax.Array,
                      times: Optional[jnp.ndarray] = None,
                      weights: Optional[jnp.ndarray] = None
                      ) -> TimedSeqResult:
    """drop_frames + provenance: each surviving slot keeps its own source
    weight/timestamp (dropping discards the dropped frame's provenance)."""
    Tmax, D = x.shape
    if times is None:
        times = jnp.arange(Tmax, dtype=jnp.float32)
    if weights is None:
        weights = jnp.ones((Tmax,), jnp.float32)
    times = times.astype(jnp.float32)
    weights = weights.astype(jnp.float32)
    feat0 = x[:t0].astype(jnp.float32)
    sim0 = _neighbor_sims(feat0)
    i = jnp.arange(t0)
    sim0 = jnp.where(i < jnp.minimum(n_valid, t0) - 1, sim0, _NEG)
    coins = jax.random.bernoulli(key, 0.5, (Tmax - t0,))
    w0 = weights[:t0]
    t0s = times[:t0]

    def step(carry, inp):
        feat, sim, wv, tv = carry
        new, new_w, new_t, t, coin = inp
        is_live = t < n_valid

        asim = sim.at[t0 - 1].set(cosine_similarity(feat[t0 - 1], new))
        af = jnp.concatenate([feat, new[None].astype(jnp.float32)], 0)
        aw = jnp.concatenate([wv, new_w[None]], 0)
        at = jnp.concatenate([tv, new_t[None]], 0)
        idx = jnp.argmax(asim) + coin.astype(jnp.int32)
        nfeat = _delete_shift(af, idx, t0)
        nw = _delete_shift(aw, idx, t0)
        nt = _delete_shift(at, idx, t0)
        j = jnp.arange(t0)
        nsim = asim[jnp.minimum(j + (j >= idx), t0 - 1)]
        nsim = nsim.at[t0 - 1].set(_NEG)
        k = idx - 1
        patch_needed = (idx > 0) & (idx < t0)
        val = cosine_similarity(nfeat[jnp.clip(k, 0, t0 - 2)],
                                nfeat[jnp.clip(k + 1, 0, t0 - 1)])
        nsim = nsim.at[jnp.clip(k, 0, t0 - 1)].set(
            jnp.where(patch_needed, val, nsim[jnp.clip(k, 0, t0 - 1)]))

        feat = jnp.where(is_live, nfeat, feat)
        sim = jnp.where(is_live, nsim, sim)
        wv = jnp.where(is_live, nw, wv)
        tv = jnp.where(is_live, nt, tv)
        return (feat, sim, wv, tv), None

    (feat, sim, wv, tv), _ = jax.lax.scan(
        step, (feat0, sim0, w0, t0s),
        (x[t0:].astype(jnp.float32), weights[t0:], times[t0:],
         jnp.arange(t0, Tmax), coins))
    valid = jnp.arange(t0) < jnp.minimum(n_valid, t0)
    return TimedSeqResult(feat, valid, jnp.where(valid, wv, 0.0),
                          jnp.where(valid, tv, 0.0))


def sample_frames(x: jnp.ndarray, n_valid: jnp.ndarray, t0: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform temporal sampling (Qwen 'sample' method,
    vstream_qwen2vl_model.py:161): linspace(0, t-1, t0) rounded down."""
    t = jnp.maximum(n_valid, 1)
    pos = jnp.linspace(0.0, 1.0, t0) * (t - 1).astype(jnp.float32)
    idx = pos.astype(jnp.int32)
    return x[idx], idx
