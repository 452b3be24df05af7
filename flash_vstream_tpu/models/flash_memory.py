"""Flash Memory (Qwen generation): CSM clustered temporal memory, DAM
retrieved spatial memory, and AM-RoPE position rewriting.

Reference semantics: FlashMemory
(Flash-VStream-Qwen/models/vstream_qwen2vl_model.py:79-323) and the streaming
incremental update embed_new_video_clip
(models/vstream_qwen2vl_realtime.py:548-630).

TPU-first redesign:
- Offline consolidation takes *static* grid sizes (they are concrete at
  input-preparation time — the processor computes post-compression grids via
  get_real_grid_thw, model.py:43-76), so every (t, h, w) bucket compiles to a
  fixed-shape program with no masks in the LLM splice.
- Streaming is the same math over a carried, device-resident state pytree
  (FlashState) with a ring-buffered frame bank replacing the reference's
  unbounded CPU-side x/small_x persistence and Manager.list/Lock handoff
  (realtime.py:585-627).
- Cluster timestamps are the weighted mean of member timestamps (the
  reference's intended semantics — its own weighted computation at
  compress_functions.py:265-275 — which the final line there overwrites with
  a local-index mean; offline the two coincide since times = arange(t);
  streaming keeps global frame indices, a documented improvement).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

import numpy as np

from ..core.config import FlashMemoryConfig
from ..ops.kmeans import weighted_kmeans
from ..ops.retrieval import dam_retrieve
from ..ops.sequential import (drop_frames_timed, merge_frames_timed,
                              sample_frames)

# LLaVA STAR's Turing-memory decay (compress_Turing_update_ratio,
# Flash-VStream-LLaVA/flash_vstream/train/train.py:88) — reused as the blend
# ratio for the Qwen 'attention' temporal method, whose reference registry
# entry is broken (partial(attention_feature, attention_fn=None) calls None,
# vstream_qwen2vl_model.py:176 + compress_functions.py:735).
ATTENTION_UPDATE_RATIO = 0.2


class FlashMemoryOutput(NamedTuple):
    spa_x: jnp.ndarray          # [t_dam, P_full, D] DAM frames (full res)
    spa_positions: jnp.ndarray  # [t_dam] temporal positions (frame indices)
    tem_x: jnp.ndarray          # [t_csm, P_small, D] CSM clusters (pooled res)
    tem_weights: jnp.ndarray    # [t_csm]
    tem_positions: jnp.ndarray  # [t_csm] rounded cluster timestamps


def _ordered_kmeans_with_times(flat, k, weights, times, valid, key, iters=10):
    """Weighted k-means + weighted-mean member timestamps, sorted by time."""
    res = weighted_kmeans(flat, k, weights=weights, valid=valid, key=key,
                          iters=iters)
    onehot = (res.labels[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    if valid is not None:
        onehot = onehot * valid[:, None].astype(jnp.float32)
    w = weights if weights is not None else jnp.ones(flat.shape[0], jnp.float32)
    if valid is not None:
        w = w * valid
    wsum = jnp.dot(onehot.T, w[:, None])[:, 0]
    tsum = jnp.dot(onehot.T, (w * times.astype(jnp.float32))[:, None])[:, 0]
    ts = jnp.where(wsum > 0, tsum / jnp.maximum(wsum, 1e-30),
                   jnp.float32(flat.shape[0]))
    order = jnp.argsort(ts)
    return (res.centroids[order], res.cluster_weights[order], ts[order])


def _attention_blend(memory: jnp.ndarray, chunk: jnp.ndarray,
                     key_valid: Optional[jnp.ndarray] = None,
                     ratio: float = ATTENTION_UPDATE_RATIO) -> jnp.ndarray:
    """Parameter-free Turing-memory blend: memory tokens attend to chunk
    tokens (scaled dot product, identity projections) and move toward the
    attended value by `ratio`. This is the LLaVA NTM update
    (vstream_arch.py:174-183) with W_q=W_k=W_v=I — the repo's DEFINED
    semantics for the Qwen 'attention' temporal method, whose reference
    entry crashes (attention_fn=None). memory [M, D], chunk [N, D]."""
    d = memory.shape[-1]
    scores = jnp.dot(memory.astype(jnp.float32), chunk.T.astype(jnp.float32),
                     preferred_element_type=jnp.float32) / jnp.sqrt(
                         jnp.float32(d))
    if key_valid is not None:
        scores = jnp.where(key_valid[None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    if key_valid is not None:
        attn = jnp.where(jnp.any(key_valid), attn, 0.0)
    read = jnp.dot(attn, chunk.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    out = (1.0 - ratio) * memory.astype(jnp.float32) + ratio * read
    if key_valid is not None:
        out = jnp.where(jnp.any(key_valid), out, memory.astype(jnp.float32))
    return out


def _attention_compress(small_x: jnp.ndarray, t_csm: int) -> jnp.ndarray:
    """Chunked Turing compression of [t, P, D] to [t_csm, P, D]: memory =
    first t_csm frames' tokens; each later t_csm-frame chunk is folded via
    _attention_blend. Mirrors the loop structure of the Qwen
    attention_feature (compress_functions.py:722-739: memory [T0*P, D],
    chunks of T0 frames)."""
    t, P, D = small_x.shape
    mem = small_x[:t_csm].reshape(t_csm * P, D).astype(jnp.float32)
    rest = small_x[t_csm:]
    n_rest = rest.shape[0]
    if n_rest == 0:
        return mem.reshape(t_csm, P, D)
    n_chunks = -(-n_rest // t_csm)
    pad = n_chunks * t_csm - n_rest
    rest = jnp.concatenate(
        [rest, jnp.zeros((pad, P, D), rest.dtype)]) if pad else rest
    chunks = rest.reshape(n_chunks, t_csm * P, D)
    frame_valid = jnp.arange(n_chunks * t_csm) < n_rest
    tok_valid = jnp.repeat(frame_valid, P).reshape(n_chunks, t_csm * P)

    def step(mem, inp):
        chunk, kv = inp
        return _attention_blend(mem, chunk, key_valid=kv), None

    mem, _ = jax.lax.scan(step, mem, (chunks.astype(jnp.float32), tok_valid))
    return mem.reshape(t_csm, P, D)


def flash_consolidate(
    cfg: FlashMemoryConfig,
    x: jnp.ndarray,             # [t, P_full, D] full-res per-frame features
    small_x: jnp.ndarray,       # [t, P_small, D] pooled per-frame features
    *,
    key: jax.Array,
    times: Optional[jnp.ndarray] = None,
) -> FlashMemoryOutput:
    """Offline consolidation of a whole video (static t). Mirrors
    FlashMemory.forward's per-sample pipeline (model.py:279-323)."""
    t, P_full, D = x.shape
    _, P_small, _ = small_x.shape
    t_csm = min(t, cfg.csm_grid_len)
    t_dam = min(t, cfg.dam_grid_len)
    if times is None:
        times = jnp.arange(t, dtype=jnp.float32)

    # --- CSM: temporal compression ---
    # Registry parity note (vstream_qwen2vl_model.py:161-176): the reference
    # method_dic lists sample/merge/drop/kmeans/kmeans_ordered/pca_*/fast_*/
    # dbscan/gmm/attention, but its own 'merge', 'drop', 'kmeans', 'dbscan'
    # and 'gmm' entries return 3-tuples into a 4-way unpack (ValueError) and
    # 'attention' calls attention_fn=None (TypeError) — only the *_ordered
    # family and 'sample' run. Every name dispatches here, with (weights,
    # timestamps) semantics defined in this repo and pinned by
    # tests/test_reference_oracle.py.
    if t <= cfg.csm_grid_len:
        tem_x = small_x
        tem_weights = jnp.ones((t,), jnp.float32)
        tem_ts = times
    elif cfg.temporal_method in ("kmeans_ordered", "fast_kmeans_ordered",
                                 "kmeans"):
        # plain 'kmeans' = the ordered variant (the reference's unordered
        # entry crashes; ordering is required downstream by AM-RoPE anyway)
        flat = small_x.reshape(t, P_small * D)
        cents, tem_weights, tem_ts = _ordered_kmeans_with_times(
            flat, t_csm, None, times, None, key)
        tem_x = cents.reshape(t_csm, P_small, D)
    elif cfg.temporal_method in ("pca_kmeans_ordered",
                                 "torchpca_kmeans_ordered"):
        from ..ops.kmeans import pca_weighted_kmeans_ordered
        flat = small_x.reshape(t, P_small * D)
        res = pca_weighted_kmeans_ordered(
            flat, t_csm, cfg.temporal_pca_dim, key=key,
            tokens_per_frame=P_small)
        onehot = (res.labels[:, None]
                  == jnp.arange(t_csm)[None, :]).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        tsum = jnp.dot(onehot.T, times.astype(jnp.float32)[:, None])[:, 0]
        tem_ts = jnp.where(counts > 0, tsum / jnp.maximum(counts, 1.0), 0.0)
        order = jnp.argsort(tem_ts)
        tem_x = res.centroids[order].reshape(t_csm, P_small, D)
        tem_weights = res.cluster_weights[order]
        tem_ts = tem_ts[order]
    elif cfg.temporal_method in ("merge", "drop"):
        flat = small_x.reshape(t, P_small * D)
        if cfg.temporal_method == "merge":
            res = merge_frames_timed(flat, jnp.int32(t), t_csm, times=times)
        else:
            res = drop_frames_timed(flat, jnp.int32(t), t_csm, key,
                                    times=times)
        tem_x = res.features.reshape(t_csm, P_small, D)
        tem_weights = res.weights
        tem_ts = res.times
    elif cfg.temporal_method == "attention":
        tem_x = _attention_compress(small_x, t_csm)
        tem_weights = jnp.ones((t_csm,), jnp.float32)
        # slots are Turing-memory cells seeded by the first t_csm frames;
        # they keep those frames' timestamps (the reference's broken entry
        # would have returned arange(T0), compress_functions.py:739)
        tem_ts = times[:t_csm]
    elif cfg.temporal_method == "sample":
        flat = small_x.reshape(t, P_small * D)
        sampled, idx = sample_frames(flat, jnp.int32(t), t_csm)
        tem_x = sampled.reshape(t_csm, P_small, D)
        tem_weights = jnp.ones((t_csm,), jnp.float32)
        tem_ts = times[idx]
    elif cfg.temporal_method in ("dbscan", "gmm"):
        from ..ops.clustering_extra import dbscan_compress, gmm_compress
        flat = small_x.reshape(t, P_small * D)
        if cfg.temporal_method == "dbscan":
            res = dbscan_compress(flat, t_csm)
        else:
            res = gmm_compress(flat, t_csm, pca_dim=cfg.temporal_pca_dim,
                               key=key)
        # empty slots fall back to the earliest frames (reference pads with
        # img_feature[:pad], compress_functions.py:697-699)
        slot = jnp.arange(t_csm)
        fallback = flat[jnp.minimum(slot, t - 1)]
        cents = jnp.where(res.valid[:, None], res.centroids, fallback)
        tem_x = cents.reshape(t_csm, P_small, D)
        onehot = (res.labels[:, None] == slot[None, :]).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        tsum = jnp.dot(onehot.T, times.astype(jnp.float32)[:, None])[:, 0]
        tem_ts = jnp.where(counts > 0, tsum / jnp.maximum(counts, 1.0),
                           slot.astype(jnp.float32))
        tem_weights = jnp.maximum(counts, 1.0)
    else:
        raise NotImplementedError(
            f"temporal_method {cfg.temporal_method}")

    tem_positions = jnp.round(tem_ts).astype(jnp.int32)

    # --- DAM: spatial retrieval ---
    if cfg.dam_grid_len == 0:
        spa_x = x[:0]
        spa_positions = jnp.zeros((0,), jnp.int32)
    elif t <= cfg.dam_grid_len:
        spa_x = x
        spa_positions = jnp.round(times).astype(jnp.int32)
    elif cfg.spatial_method in ("klarge_retrieve", "klarge_retrieve_cos"):
        metric = "cosine" if cfg.spatial_method.endswith("_cos") else "euclidean"
        idx, _ = dam_retrieve(tem_x, tem_weights, small_x,
                              jnp.ones((t,), bool), t_dam, metric)
        spa_x = x[idx]
        spa_positions = jnp.round(times[idx]).astype(jnp.int32)
    elif cfg.spatial_method == "sample":
        flat = x.reshape(t, P_full * D)
        sampled, idx = sample_frames(flat, jnp.int32(t), t_dam)
        spa_x = sampled.reshape(t_dam, P_full, D)
        spa_positions = jnp.round(times[idx]).astype(jnp.int32)
    elif cfg.spatial_method == "nearest":
        top = jnp.argsort(-tem_weights)[:t_dam]
        idx = tem_positions[top]
        spa_x = x[idx]
        spa_positions = idx
    else:
        raise NotImplementedError(f"spatial_method {cfg.spatial_method}")

    return FlashMemoryOutput(spa_x, spa_positions, tem_x, tem_weights,
                             tem_positions)


def cat_spa_tem(spa_x: jnp.ndarray, tem_x: jnp.ndarray) -> jnp.ndarray:
    """Concatenate DAM before CSM, preserving 2x2 window grouping
    (model.py:246-251). Inputs [t, P, D] token streams -> [N_tok, D]."""
    D = spa_x.shape[-1]
    return jnp.concatenate([spa_x.reshape(-1, D), tem_x.reshape(-1, D)])


# ---------------------------------------------------------------------------
# AM-RoPE
# ---------------------------------------------------------------------------

def am_rope_visual_positions(
    spa_positions: jnp.ndarray,  # [t_dam] temporal ids of DAM frames
    tem_positions: jnp.ndarray,  # [t_csm] temporal ids of CSM clusters
    spa_grid_hw: Tuple[int, int],  # (h, w) full-res grid (pre merge)
    tem_grid_hw: Tuple[int, int],  # (h, w) pooled grid
) -> jnp.ndarray:
    """3D rope positions for the [DAM | CSM] visual token block, relative to
    the visual start. Mirrors calc_am_rope (model.py:254-277): DAM tokens keep
    their source-frame index on the t axis; CSM tokens keep cluster timestamps
    offset by the DAM token count. Returns [3, n_visual] int32 (t, h, w)."""
    def mm_index(t_positions, h, w):
        gh, gw = h // 2, w // 2
        n = t_positions.shape[0]
        t_idx = jnp.repeat(t_positions, gh * gw)
        h_idx = jnp.tile(jnp.repeat(jnp.arange(gh), gw), n)
        w_idx = jnp.tile(jnp.arange(gw), n * gh)
        return jnp.stack([t_idx, h_idx, w_idx]).astype(jnp.int32)

    spa_ids = mm_index(spa_positions, *spa_grid_hw)
    tem_ids = mm_index(tem_positions, *tem_grid_hw)
    spa_size = spa_ids.shape[1]
    tem_ids = tem_ids + spa_size
    return jnp.concatenate([spa_ids, tem_ids], axis=1)


def qwen_rope_positions(
    input_ids: np.ndarray,          # [S] host-side token ids
    visual_span: Tuple[int, int],   # (start, n_visual) of video-pad tokens
    visual_positions: np.ndarray,   # [3, n_visual] AM-RoPE block positions
) -> Tuple[np.ndarray, int]:
    """Full-sequence 3D rope positions with the visual block spliced in.

    Host-side mirror of get_rope_index (model.py:778-939) specialized to one
    video (the reference raises NotImplementedError for images, model.py:864).
    Text before the video counts 0..st-1; visual tokens use AM-RoPE positions
    offset by st; text after resumes at max+1. Returns ([3, S], rope_delta).
    """
    start, n_vis = visual_span
    return mm_rope_positions(input_ids, [(start, visual_positions)])


def mm_rope_positions(
    input_ids: np.ndarray,                       # [S] host-side token ids
    spans: list,                                 # ordered [(start, pos[3,n])]
) -> Tuple[np.ndarray, int]:
    """Full-sequence 3D rope positions for ARBITRARY image/video
    interleavings.

    Host-side generalization of get_rope_index (model.py:778-939) to many
    visual spans: text between spans counts sequentially from the running
    index; each span splices its own 3D block (AM-RoPE positions for videos,
    the standard mm grid index for images — the reference raises
    NotImplementedError on the image branch, model.py:864-866); text after a
    span resumes at max(span)+1 plus the running offset. Returns
    ([3, S], rope_delta)."""
    S = len(input_ids)
    pos = np.zeros((3, S), np.int64)
    cur = 0       # next sequence slot to fill
    st_idx = 0    # next 1D position value for text
    for start, vp in spans:
        vp = np.asarray(vp)
        n = vp.shape[1]
        text_len = start - cur
        assert text_len >= 0, "spans must be ordered and non-overlapping"
        pos[:, cur:start] = st_idx + np.arange(text_len)
        st_idx += text_len
        pos[:, start:start + n] = vp + st_idx
        if n:
            st_idx += int(vp.max()) + 1
        cur = start + n
    tail = S - cur
    pos[:, cur:] = st_idx + np.arange(tail)
    rope_delta = int(pos.max()) + 1 - S if S else 0
    return pos, rope_delta


# ---------------------------------------------------------------------------
# Streaming state
# ---------------------------------------------------------------------------

class FlashState(NamedTuple):
    """Device-resident streaming Flash memory (one stream).

    Replaces the 13-element Manager.list handoff in embed_new_video_clip
    (realtime.py:623-627). The full/pooled feature banks are ring buffers of
    capacity bank_size (documented deviation from the reference's unbounded
    growth, SURVEY.md §5.7)."""
    tem_x: jnp.ndarray          # [K, P_small, D] CSM clusters
    tem_valid: jnp.ndarray      # [K] bool
    tem_weights: jnp.ndarray    # [K]
    tem_times: jnp.ndarray      # [K] float32 global timestamps
    bank: jnp.ndarray           # [B, P_full, D] full-res ring buffer
    bank_small: jnp.ndarray     # [B, P_small, D] pooled ring buffer
    bank_pos: jnp.ndarray       # [B] int32 global frame index, -1 = empty
    n_frames: jnp.ndarray       # [] int32


def init_flash_state(cfg: FlashMemoryConfig, p_full: int, p_small: int,
                     feat_dim: int, bank_size: int = 1024,
                     dtype=jnp.float32,
                     bank_dtype=jnp.bfloat16) -> FlashState:
    """CSM cluster centroids keep `dtype` (f32: k-means accumulates), but
    the frame BANKS store raw ViT features, which are bf16 in production —
    storing them f32 doubles HBM traffic for the ring-buffer writes, the
    DAM distance reads, and the spa_x gather for zero information."""
    K = cfg.csm_grid_len
    return FlashState(
        tem_x=jnp.zeros((K, p_small, feat_dim), dtype),
        tem_valid=jnp.zeros((K,), bool),
        tem_weights=jnp.zeros((K,), jnp.float32),
        tem_times=jnp.zeros((K,), jnp.float32),
        bank=jnp.zeros((bank_size, p_full, feat_dim), bank_dtype),
        bank_small=jnp.zeros((bank_size, p_small, feat_dim), bank_dtype),
        bank_pos=jnp.full((bank_size,), -1, jnp.int32),
        n_frames=jnp.zeros((), jnp.int32),
    )


def flash_stream_update(
    cfg: FlashMemoryConfig,
    state: FlashState,
    new_x: jnp.ndarray,          # [T_new, P_full, D]
    new_small: jnp.ndarray,      # [T_new, P_small, D]
    n_new: jnp.ndarray,          # [] int32
    key: jax.Array,
) -> Tuple[FlashState, FlashMemoryOutput]:
    """Fold a clip into the streaming memory and produce the current
    [DAM | CSM] snapshot. Mirrors embed_new_video_clip's
    read-merge-compress-retrieve-write (realtime.py:548-630) as one jitted,
    in-place (donatable) state transition."""
    T_new, P_full, D = new_x.shape
    P_small = new_small.shape[1]
    K = cfg.csm_grid_len
    new_idx = jnp.arange(T_new)
    new_valid = new_idx < n_new
    new_times = (state.n_frames + new_idx).astype(jnp.float32)

    # --- ring-buffer banks ---
    B = state.bank.shape[0]
    wp = (state.n_frames + new_idx) % B
    sel = new_valid[:, None, None]
    bank = state.bank.at[wp].set(jnp.where(
        sel, new_x.astype(state.bank.dtype), state.bank[wp]))
    bank_small = state.bank_small.at[wp].set(jnp.where(
        sel, new_small.astype(state.bank_small.dtype), state.bank_small[wp]))
    bank_pos = state.bank_pos.at[wp].set(
        jnp.where(new_valid, state.n_frames + new_idx, state.bank_pos[wp]))

    # --- CSM: concat old clusters + new frames, recluster ---
    cat_x = jnp.concatenate([state.tem_x, new_small])           # [K+T_new,...]
    cat_valid = jnp.concatenate([state.tem_valid, new_valid])
    cat_w = jnp.concatenate([
        jnp.where(state.tem_valid, jnp.maximum(state.tem_weights, 1e-6), 0.0),
        new_valid.astype(jnp.float32)])
    cat_t = jnp.concatenate([state.tem_times, new_times])
    n_cat = state.tem_valid.sum() + n_new
    flat = cat_x.reshape(K + T_new, P_small * D)
    if cfg.temporal_method == "sample":
        # uniform sample over the packed valid prefix (temporal order)
        order0 = jnp.argsort(jnp.where(cat_valid, cat_t, jnp.inf))
        srt_x, srt_w, srt_t = flat[order0], cat_w[order0], cat_t[order0]
        pos = (jnp.linspace(0.0, 1.0, K)
               * (jnp.maximum(n_cat, 1) - 1).astype(jnp.float32))
        idx = pos.astype(jnp.int32)
        cents, cw, cts = srt_x[idx], srt_w[idx], srt_t[idx]
    elif cfg.temporal_method in ("merge", "drop"):
        # sequential methods ARE streaming by nature: pack [old cells | new
        # frames] in temporal order and continue the same scan the offline
        # path runs (old cells carry their accumulated weights/time means)
        order0 = jnp.argsort(jnp.where(cat_valid, cat_t, jnp.inf))
        srt_x, srt_w, srt_t = flat[order0], cat_w[order0], cat_t[order0]
        if cfg.temporal_method == "merge":
            res = merge_frames_timed(srt_x, n_cat, K, times=srt_t,
                                     weights=srt_w)
        else:
            res = drop_frames_timed(srt_x, n_cat, K, key, times=srt_t,
                                    weights=srt_w)
        cents, cw, cts = res.features, res.weights, res.times
    elif cfg.temporal_method == "attention":
        # Turing memory: cells = packed first K entries, later entries fold
        # in as one parameter-free cross-attention blend (steady state this
        # is exactly "old cells attend to the new clip")
        order0 = jnp.argsort(jnp.where(cat_valid, cat_t, jnp.inf))
        srt_x, srt_w, srt_t = flat[order0], cat_w[order0], cat_t[order0]
        seed = srt_x[:K].reshape(K * P_small, D)
        rest = srt_x[K:].reshape((T_new) * P_small, D)
        rest_valid = jnp.repeat(jnp.arange(K, K + T_new) < n_cat, P_small)
        mem = _attention_blend(seed, rest, key_valid=rest_valid)
        cents = mem.reshape(K, P_small * D)
        cw, cts = srt_w[:K], srt_t[:K]
    else:
        # clustering registry (kmeans/kmeans_ordered/fast/pca variants;
        # dbscan/gmm are offline-only alternates — streaming re-clusters a
        # mixed bank where density/eps semantics don't transfer, so they
        # fall back to ordered k-means here, documented deviation)
        cents, cw, cts = _ordered_kmeans_with_times(flat, K, cat_w, cat_t,
                                                    cat_valid, key)
    slot = jnp.arange(K)
    is_short = n_cat <= K
    order = jnp.argsort(jnp.where(cat_valid, cat_t, jnp.inf))
    packed = cat_x[order][:K]
    packed_w = cat_w[order][:K]
    packed_t = cat_t[order][:K]
    tem_x = jnp.where(is_short,
                      jnp.where((slot < n_cat)[:, None, None], packed, 0.0),
                      cents.reshape(K, P_small, D))
    tem_weights = jnp.where(is_short, jnp.where(slot < n_cat, packed_w, 0.0), cw)
    tem_times = jnp.where(is_short, jnp.where(slot < n_cat, packed_t, 0.0), cts)
    tem_valid = jnp.where(is_short, slot < n_cat, jnp.ones((K,), bool))

    new_state = FlashState(tem_x=tem_x, tem_valid=tem_valid,
                           tem_weights=tem_weights, tem_times=tem_times,
                           bank=bank, bank_small=bank_small,
                           bank_pos=bank_pos,
                           n_frames=state.n_frames + n_new)

    # --- DAM retrieval from the pooled bank (configured spatial method) ---
    t_dam = cfg.dam_grid_len
    n_total_now = state.n_frames + n_new
    if cfg.spatial_method == "sample":
        order_b = jnp.argsort(
            jnp.where(bank_pos >= 0, bank_pos, jnp.iinfo(jnp.int32).max))
        pos_f = (jnp.linspace(0.0, 1.0, t_dam)
                 * (jnp.maximum(n_total_now, 1) - 1).astype(jnp.float32))
        idx = order_b[jnp.minimum(pos_f.astype(jnp.int32),
                                  state.bank.shape[0] - 1)]
    elif cfg.spatial_method == "nearest":
        # frames at the heaviest clusters' timestamps (model.py:222-227)
        top = jnp.argsort(-jnp.where(tem_valid, tem_weights, -jnp.inf))[:t_dam]
        want_pos = jnp.round(tem_times[top]).astype(jnp.int32)
        # map global frame index -> bank slot
        hits = (bank_pos[None, :] == want_pos[:, None])
        idx = jnp.argmax(hits, axis=1)
        idx = jnp.where(jnp.any(hits, axis=1), idx, 0)
    else:
        metric = ("cosine" if cfg.spatial_method.endswith("_cos")
                  else "euclidean")
        idx, _ = dam_retrieve(tem_x,
                              jnp.where(tem_valid, tem_weights, -jnp.inf),
                              bank_small, bank_pos >= 0, t_dam, metric)
    # short stream (t <= spatial_length): pass all frames through in temporal
    # order (spatial_enhance, model.py:214-216); slots beyond n_frames carry
    # duplicates of the earliest frame and are sliced off host-side.
    n_total = state.n_frames + n_new
    rank = jnp.minimum(jnp.arange(t_dam), jnp.maximum(n_total, 1) - 1)
    is_short_dam = n_total <= t_dam
    if t_dam <= B:
        # short stream implies the ring buffer has not wrapped (n_total <=
        # t_dam <= bank size), so slot s holds global frame s and the
        # temporal order is the identity — the [B]-wide argsort this used
        # to run every clip is latency-bound dead weight on TPU.
        idx_short = rank
    else:
        temporal_order = jnp.argsort(
            jnp.where(bank_pos >= 0, bank_pos, jnp.iinfo(jnp.int32).max))
        idx_short = temporal_order[rank]
    idx = jnp.where(is_short_dam, idx_short, idx)
    from ..kernels.gather_rows import gather_rows
    spa_x = gather_rows(bank, idx)
    spa_positions = bank_pos[idx]

    out = FlashMemoryOutput(
        spa_x=spa_x,
        spa_positions=spa_positions,
        tem_x=tem_x,
        tem_weights=tem_weights,
        tem_positions=jnp.round(tem_times).astype(jnp.int32),
    )
    return new_state, out
