"""STAR memory: spatial / temporal(long) / abstract(Turing) / retrieved.

Reference semantics: compress_temporal_features
(Flash-VStream-LLaVA/flash_vstream/model/vstream_arch.py:214-277) and the
streaming writer embed_video_streaming (vstream_arch.py:611-697).

TPU-first redesign:
- one jitted, fixed-shape consolidation: every section (Turing / long /
  key+current) has a static token capacity plus a validity mask, so short
  videos (T-1 < long_length, where the reference passes features through
  uncompressed) and long videos compile to the same program;
- the streaming variant is the same function over a carried state pytree
  (STARState) with a ring-buffered frame bank, replacing the reference's
  unbounded CPU-side `img_feature_buffer` and Manager.list/Lock handoff
  (vstream_arch.py:650-695) with device-resident donated buffers;
- output token order matches the reference concat: [Turing, long, key+cur]
  (vstream_arch.py:275).

Deviation (documented): key-frame retrieval queries the *cluster centroids*
sorted by weight; the reference indexes the uncompressed frame list with
cluster ids (vstream_arch.py:262), which is an indexing quirk of the original
implementation. Intent per the paper: retrieve frames nearest the heaviest
cluster centroids.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import STARConfig
from ..ops.kmeans import weighted_kmeans
from ..ops.ntm import NTMParams, ntm_compress, ntm_update
from ..ops.pooling import spatial_pool
from ..ops.retrieval import star_retrieve
from ..ops.sequential import drop_frames, k_drop_frames, k_merge_frames, merge_frames


class STARMemory(NamedTuple):
    """Fixed-capacity memory tokens + per-token validity, ordered
    [Turing | long | key+current] like the reference concat."""
    tokens: jnp.ndarray   # [n_tokens, D]
    valid: jnp.ndarray    # [n_tokens] bool


def star_token_count(cfg: STARConfig) -> int:
    return (cfg.turing_length * cfg.turing_size ** 2
            + cfg.long_length * cfg.long_size ** 2
            + (cfg.key_length + cfg.current_length) * cfg.current_size ** 2)


def _compress_long(cfg: STARConfig, long_pooled, long_valid, n_long, key):
    """Temporal compression of the long memory via the configured op.

    Returns (clusters [L, P_l, D], cluster_valid [L], weights [L]).
    When n_long <= long_length the reference passes frames through with unit
    weights (compress_functions.py:160-161)."""
    L = cfg.long_length
    Tmax, Pl, D = long_pooled.shape
    flat = long_pooled.reshape(Tmax, Pl * D)

    if L == 0:
        # long memory disabled (video_long_memory_length=0 skips the whole
        # compress+retrieve block, vstream_arch.py:256-258)
        return (jnp.zeros((0, Pl, D), long_pooled.dtype),
                jnp.zeros((0,), bool), jnp.zeros((0,), jnp.float32))
    if cfg.compress_type in ("weighted_kmeans", "kmeans"):
        res = weighted_kmeans(flat, L, valid=long_valid, key=key)
        clusters = res.centroids.reshape(L, Pl, D)
        weights = res.cluster_weights
    elif cfg.compress_type == "merge":
        r = merge_frames(flat, n_long, L)
        clusters, weights = r.features.reshape(L, Pl, D), r.valid.astype(jnp.float32)
    elif cfg.compress_type == "drop":
        r = drop_frames(flat, n_long, L, key)
        clusters, weights = r.features.reshape(L, Pl, D), r.valid.astype(jnp.float32)
    elif cfg.compress_type in ("kmerge", "uni_kmerge", "both_kmerge",
                               "split_kmerge"):
        # the reference maps all kmerge aliases to k_merge_feature
        # (vstream_arch.py:633-635)
        r = k_merge_frames(flat, n_long, L)
        clusters, weights = r.features.reshape(L, Pl, D), r.valid.astype(jnp.float32)
    elif cfg.compress_type == "kdrop":
        r = k_drop_frames(flat, n_long, L, key)
        clusters, weights = r.features.reshape(L, Pl, D), r.valid.astype(jnp.float32)
    else:
        raise NotImplementedError(f"compress_type {cfg.compress_type}")

    # short-video passthrough: first n_long rows are the frames themselves
    slot = jnp.arange(L)
    is_short = n_long <= L
    passthrough = long_pooled[:L]
    clusters = jnp.where(is_short, jnp.where((slot < n_long)[:, None, None],
                                             passthrough, 0.0), clusters)
    weights = jnp.where(is_short, (slot < n_long).astype(jnp.float32), weights)
    cluster_valid = jnp.where(is_short, slot < n_long,
                              jnp.ones((L,), bool))
    return clusters, cluster_valid, weights


def star_consolidate(
    ntm_params: NTMParams,
    cfg: STARConfig,
    features: jnp.ndarray,      # [Tmax, P_cur, D] spatially pooled (cur size)
    n_valid: jnp.ndarray,       # [] int32 actual frame count (>= 1)
    key: jax.Array,
) -> STARMemory:
    """Offline STAR consolidation of one video's frame features.

    `features` are already pooled to current_size**2 tokens/frame (the
    reference pools with compress_spatial_features before consolidation,
    vstream_arch.py:319)."""
    Tmax, P, D = features.shape
    assert P == cfg.current_size ** 2

    # split cur (last frame(s)) vs history
    c = cfg.current_length
    n_hist = jnp.maximum(n_valid - c, 0)
    frame_idx = jnp.arange(Tmax)
    hist_valid = frame_idx < n_hist

    long_pooled = spatial_pool(features, cfg.long_size)        # [Tmax, P_l, D]
    turing_pooled = spatial_pool(features, cfg.turing_size)    # [Tmax, P_t, D]

    # --- long memory (clustered temporal) ---
    clusters, cluster_valid, weights = _compress_long(
        cfg, long_pooled, hist_valid, n_hist, key)

    # --- retrieved key frames ---
    has_hist = n_hist > 0
    if cfg.key_length == 0 or cfg.long_length == 0:
        # no retrieval without long-memory clusters to query (the reference
        # only retrieves inside the long-compression branch,
        # vstream_arch.py:260-270)
        key_frames = features[:0]
        key_valid = jnp.zeros((0,), bool)
    else:
        key_idx = star_retrieve(
            clusters.reshape(cfg.long_length, -1), weights,
            long_pooled.reshape(Tmax, -1), hist_valid, cfg.key_length)
        key_frames = features[key_idx]                          # [k, P, D]
        key_valid = jnp.full((cfg.key_length,), True) & has_hist

    # --- Turing (abstract/NTM) memory ---
    turing = ntm_compress(ntm_params, turing_pooled, n_hist,
                          cfg.turing_length, cfg.turing_size ** 2,
                          cfg.turing_update_ratio)              # [Lt, P_t, D]
    t_slot = jnp.arange(cfg.turing_length)
    turing_valid = t_slot < jnp.minimum(n_hist, cfg.turing_length)

    # --- current memory (last c frames) ---
    cur_start = jnp.maximum(n_valid - c, 0)
    cur = jax.lax.dynamic_slice(features, (cur_start, 0, 0), (c, P, D))
    cur_valid = jnp.arange(c) < jnp.minimum(n_valid, c)

    tokens = jnp.concatenate([
        turing.reshape(-1, D),
        clusters.reshape(-1, D),
        key_frames.reshape(-1, D),
        cur.reshape(-1, D),
    ])
    valid = jnp.concatenate([
        jnp.repeat(turing_valid, cfg.turing_size ** 2),
        jnp.repeat(cluster_valid, cfg.long_size ** 2),
        jnp.repeat(key_valid, P),
        jnp.repeat(cur_valid, P),
    ])
    return STARMemory(tokens, valid)


# ---------------------------------------------------------------------------
# Streaming
# ---------------------------------------------------------------------------

class STARState(NamedTuple):
    """Device-resident streaming memory state (one stream).

    Replaces the reference's Manager.list shared memory
    [cur, long_compressed, Turing_compressed, img_feature_buffer]
    (vstream_arch.py:694) plus its unbounded frame bank with a ring buffer.
    """
    cur: jnp.ndarray            # [c, P, D] current memory
    cur_valid: jnp.ndarray      # [c] bool
    key_frames: jnp.ndarray     # [k, P, D] retrieved memory
    key_valid: jnp.ndarray      # [k] bool
    long: jnp.ndarray           # [L, P_l, D] compressed long memory
    long_valid: jnp.ndarray     # [L] bool
    long_weights: jnp.ndarray   # [L]
    turing: jnp.ndarray         # [Lt, P_t, D] compressed Turing memory
    turing_valid: jnp.ndarray   # [Lt] bool
    bank: jnp.ndarray           # [B, P, D] full-res frame ring buffer
    bank_pos: jnp.ndarray       # [B] int32 global frame index (-1 empty)
    n_frames: jnp.ndarray       # [] int32 total frames seen


def init_star_state(cfg: STARConfig, feat_dim: int,
                    dtype=jnp.float32) -> STARState:
    P = cfg.current_size ** 2
    Pl = cfg.long_size ** 2
    Pt = cfg.turing_size ** 2
    B = cfg.max_frames_static
    return STARState(
        cur=jnp.zeros((cfg.current_length, P, feat_dim), dtype),
        cur_valid=jnp.zeros((cfg.current_length,), bool),
        key_frames=jnp.zeros((cfg.key_length, P, feat_dim), dtype),
        key_valid=jnp.zeros((cfg.key_length,), bool),
        long=jnp.zeros((cfg.long_length, Pl, feat_dim), dtype),
        long_valid=jnp.zeros((cfg.long_length,), bool),
        long_weights=jnp.zeros((cfg.long_length,), dtype),
        turing=jnp.zeros((cfg.turing_length, Pt, feat_dim), dtype),
        turing_valid=jnp.zeros((cfg.turing_length,), bool),
        bank=jnp.zeros((B, P, feat_dim), dtype),
        bank_pos=jnp.full((B,), -1, jnp.int32),
        n_frames=jnp.zeros((), jnp.int32),
    )


def star_stream_update(
    ntm_params: NTMParams,
    cfg: STARConfig,
    state: STARState,
    new_features: jnp.ndarray,   # [T_new, P, D] pooled new-frame features
    n_new: jnp.ndarray,          # [] int32
    key: jax.Array,
) -> STARState:
    """Fold a clip of new frames into the streaming memory.

    Mirrors embed_video_streaming (vstream_arch.py:611-697): concat the old
    compressed long/Turing memory with the new frames' pooled features,
    re-compress, re-retrieve, and refresh the current memory — all on device,
    no host round-trip. The frame bank is a ring buffer of the most recent
    max_frames_static frames (documented deviation from the reference's
    unbounded buffer, SURVEY.md §5.7)."""
    T_new, P, D = new_features.shape
    L, Lt = cfg.long_length, cfg.turing_length
    new_idx = jnp.arange(T_new)
    new_valid = new_idx < n_new

    # --- update ring-buffer bank ---
    B = state.bank.shape[0]
    write_pos = (state.n_frames + new_idx) % B
    bank = state.bank.at[write_pos].set(
        jnp.where(new_valid[:, None, None], new_features,
                  state.bank[write_pos]))
    bank_pos = state.bank_pos.at[write_pos].set(
        jnp.where(new_valid, state.n_frames + new_idx,
                  state.bank_pos[write_pos]))

    # --- long memory: concat(old compressed, new pooled) then re-compress
    # with the CONFIGURED op (reference streaming uses the same compress_fn
    # registry as offline, vstream_arch.py:626-670) ---
    new_long = spatial_pool(new_features, cfg.long_size)
    cat_long = jnp.concatenate([state.long, new_long])            # [L+T_new,...]
    cat_valid = jnp.concatenate([state.long_valid, new_valid])
    cat_weights = jnp.concatenate([
        jnp.where(state.long_valid, jnp.maximum(state.long_weights, 1e-6), 0.0),
        new_valid.astype(jnp.float32)])
    n_cat = state.long_valid.sum() + n_new
    if cfg.compress_type in ("weighted_kmeans", "kmeans"):
        flat = cat_long.reshape(L + T_new, -1)
        res = weighted_kmeans(flat, L, weights=cat_weights, valid=cat_valid,
                              key=key)
        comp = res.centroids.reshape(L, *cat_long.shape[1:])
        comp_w = res.cluster_weights
    else:
        # sequential ops consume a packed valid prefix (same registry as
        # _compress_long); weights are validity like the offline path
        order0 = jnp.argsort(~cat_valid)
        packed_seq = cat_long[order0].reshape(L + T_new, -1)
        comp, _, comp_w = _compress_long(
            cfg,
            packed_seq.reshape(L + T_new, *cat_long.shape[1:]),
            jnp.arange(L + T_new) < n_cat, n_cat, key)
    slot = jnp.arange(L)
    is_short = n_cat <= L
    # short phase: pack the valid rows of cat_long into the first n_cat slots
    order = jnp.argsort(~cat_valid)          # valid rows first, stable
    packed = cat_long[order][:L]
    packed_w = cat_weights[order][:L]
    long_mem = jnp.where(is_short, jnp.where((slot < n_cat)[:, None, None],
                                             packed, 0.0), comp)
    long_weights = jnp.where(is_short, jnp.where(slot < n_cat, packed_w, 0.0),
                             comp_w)
    long_valid = jnp.where(is_short, slot < n_cat, jnp.ones((L,), bool))

    # --- retrieval from the bank ---
    key_idx = star_retrieve(
        long_mem.reshape(L, -1), long_weights,
        spatial_pool(bank, cfg.long_size).reshape(B, -1),
        bank_pos >= 0, cfg.key_length)
    key_frames = bank[key_idx]
    key_valid = jnp.full((cfg.key_length,), True) & (n_cat > 0)

    # --- Turing memory: one NTM write of the new chunk ---
    new_turing = spatial_pool(new_features, cfg.turing_size)
    old_flat = state.turing.reshape(-1, D)
    tok_valid = jnp.repeat(new_valid, cfg.turing_size ** 2)
    updated = ntm_update(ntm_params, old_flat,
                         new_turing.reshape(-1, D), tok_valid,
                         cfg.turing_update_ratio).reshape(state.turing.shape)
    # growth phase: append new frames until Lt is filled; frames beyond the
    # capacity boundary NTM-blend into the packed memory (reference
    # attention_feature folds the overflow, compress_functions.py:263-277)
    n_tur = state.turing_valid.sum()
    growing = n_tur < Lt
    cat_tur = jnp.concatenate([state.turing, new_turing])
    cat_tvalid = jnp.concatenate([state.turing_valid, new_valid])
    torder = jnp.argsort(~cat_tvalid)
    packed_all = cat_tur[torder]
    packed_valid_all = cat_tvalid[torder]
    packed_tur = packed_all[:Lt]
    packed_tvalid = packed_valid_all[:Lt]
    overflow = packed_all[Lt:Lt + T_new]
    overflow_valid = packed_valid_all[Lt:Lt + T_new]
    has_overflow = jnp.any(overflow_valid)
    blended = ntm_update(
        ntm_params, packed_tur.reshape(-1, D), overflow.reshape(-1, D),
        jnp.repeat(overflow_valid, cfg.turing_size ** 2),
        cfg.turing_update_ratio).reshape(packed_tur.shape)
    grown = jnp.where(has_overflow, blended, packed_tur)
    turing = jnp.where(growing, grown,
                       jnp.where(state.turing_valid[:, None, None], updated,
                                 state.turing))
    turing_valid = jnp.where(growing, packed_tvalid, state.turing_valid)

    # --- current memory: last current_length frames of the stream ---
    c = cfg.current_length
    cat_cur = jnp.concatenate([state.cur, new_features])
    cat_cvalid = jnp.concatenate([state.cur_valid, new_valid])
    # take the last c valid rows: sort invalid first, take tail
    corder = jnp.argsort(cat_cvalid.astype(jnp.int32), stable=True)
    cur = cat_cur[corder][-c:]
    cur_valid = cat_cvalid[corder][-c:]

    return STARState(
        cur=cur, cur_valid=cur_valid,
        key_frames=key_frames, key_valid=key_valid,
        long=long_mem, long_valid=long_valid, long_weights=long_weights,
        turing=turing, turing_valid=turing_valid,
        bank=bank, bank_pos=bank_pos,
        n_frames=state.n_frames + n_new,
    )


def star_memory_tokens(cfg: STARConfig, state: STARState) -> STARMemory:
    """Snapshot the streaming state as LLM-ready memory tokens, ordered
    [Turing | long | key + cur] (vstream_arch.py:483)."""
    D = state.cur.shape[-1]
    tokens = jnp.concatenate([
        state.turing.reshape(-1, D),
        state.long.reshape(-1, D),
        state.key_frames.reshape(-1, D),
        state.cur.reshape(-1, D),
    ])
    valid = jnp.concatenate([
        jnp.repeat(state.turing_valid, cfg.turing_size ** 2),
        jnp.repeat(state.long_valid, cfg.long_size ** 2),
        jnp.repeat(state.key_valid, cfg.current_size ** 2),
        jnp.repeat(state.cur_valid, cfg.current_size ** 2),
    ])
    return STARMemory(tokens, valid)
