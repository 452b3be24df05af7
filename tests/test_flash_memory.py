import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import FlashMemoryConfig
from flash_vstream_tpu.models.flash_memory import (
    am_rope_visual_positions,
    cat_spa_tem,
    flash_consolidate,
    flash_stream_update,
    init_flash_state,
    qwen_rope_positions,
)

CFG = FlashMemoryConfig(temporal_length=8, spatial_length=4)  # csm 4, dam 2
D = 8
P_FULL = 16   # 2x2 grid of 2x2 windows -> h=w=4
P_SMALL = 4   # pooled grid h=w=2


def test_consolidate_long(rng):
    t = 10
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    out = flash_consolidate(CFG, x, sx, key=jax.random.PRNGKey(0))
    assert out.tem_x.shape == (4, P_SMALL, D)
    assert out.spa_x.shape == (2, P_FULL, D)
    # timestamps sorted, positions within range
    ts = np.asarray(out.tem_positions)
    assert np.all(np.diff(ts) >= 0)
    assert np.all((ts >= 0) & (ts < t))
    sp = np.asarray(out.spa_positions)
    assert np.all((sp >= 0) & (sp < t))
    # DAM frames are actual bank frames
    xs = np.asarray(x)
    for i, p in enumerate(sp):
        np.testing.assert_allclose(np.asarray(out.spa_x)[i], xs[p], rtol=1e-5)


def test_consolidate_short_passthrough(rng):
    t = 2
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    out = flash_consolidate(CFG, x, sx, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out.tem_x), np.asarray(sx), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.spa_x), np.asarray(x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.tem_positions), [0, 1])


def test_am_rope_positions():
    spa_pos = jnp.asarray([5, 9])        # 2 DAM frames
    tem_pos = jnp.asarray([1, 3, 6, 8])  # 4 CSM clusters
    pos = am_rope_visual_positions(spa_pos, tem_pos, (4, 4), (2, 2))
    pos = np.asarray(pos)
    # DAM: 2 frames x (2x2 merged grid) = 8 tokens; CSM: 4 x 1 = 4 tokens
    assert pos.shape == (3, 12)
    # first DAM frame tokens: t=5, h in {0,1}, w in {0,1}
    np.testing.assert_array_equal(pos[0, :4], [5, 5, 5, 5])
    np.testing.assert_array_equal(pos[1, :4], [0, 0, 1, 1])
    np.testing.assert_array_equal(pos[2, :4], [0, 1, 0, 1])
    # CSM tokens offset by spa_size=8 on every axis
    np.testing.assert_array_equal(pos[0, 8:], np.array([1, 3, 6, 8]) + 8)
    # size conservation (reference assert, model.py:275)
    assert pos.shape[1] == 2 * 4 + 4 * 1


def test_qwen_rope_positions():
    ids = np.arange(20)
    vis = np.asarray(am_rope_visual_positions(
        jnp.asarray([5, 9]), jnp.asarray([1, 3, 6, 8]), (4, 4), (2, 2)))
    pos, delta = qwen_rope_positions(ids, (4, 12), vis)
    assert pos.shape == (3, 20)
    np.testing.assert_array_equal(pos[0, :4], [0, 1, 2, 3])
    # text after the video resumes at max visual position + 1
    assert pos[0, 16] == vis.max() + 4 + 1
    assert np.all(np.diff(pos[0, 16:]) == 1)


def test_cat_spa_tem(rng):
    spa = jnp.asarray(rng.normal(size=(2, P_FULL, D)).astype(np.float32))
    tem = jnp.asarray(rng.normal(size=(4, P_SMALL, D)).astype(np.float32))
    cat = cat_spa_tem(spa, tem)
    assert cat.shape == (2 * P_FULL + 4 * P_SMALL, D)
    np.testing.assert_allclose(np.asarray(cat)[:P_FULL], np.asarray(spa)[0])


def test_stream_update(rng):
    state = init_flash_state(CFG, P_FULL, P_SMALL, D, bank_size=16)
    step = jax.jit(lambda s, x, sx, n, k: flash_stream_update(CFG, s, x, sx, n, k))
    for i in range(5):
        x = jnp.asarray(rng.normal(size=(2, P_FULL, D)).astype(np.float32))
        sx = jnp.asarray(rng.normal(size=(2, P_SMALL, D)).astype(np.float32))
        state, out = step(state, x, sx, jnp.int32(2), jax.random.PRNGKey(i))
    assert int(state.n_frames) == 10
    assert bool(state.tem_valid.all())
    # cluster timestamps are global frame indices within the stream
    ts = np.asarray(state.tem_times)
    assert np.all((ts >= 0) & (ts < 10))
    assert np.all(np.diff(ts) >= 0)
    # DAM snapshot points at real bank frames
    sp = np.asarray(out.spa_positions)
    assert np.all((sp >= 0) & (sp < 10))
    assert np.isfinite(np.asarray(out.spa_x)).all()


def test_stream_short_phase(rng):
    state = init_flash_state(CFG, P_FULL, P_SMALL, D, bank_size=16)
    x = jnp.asarray(rng.normal(size=(4, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(4, P_SMALL, D)).astype(np.float32))
    state, out = flash_stream_update(CFG, state, x, sx, jnp.int32(1),
                                     jax.random.PRNGKey(0))
    assert int(state.tem_valid.sum()) == 1
    np.testing.assert_allclose(np.asarray(state.tem_x)[0], np.asarray(sx)[0],
                               rtol=1e-6)
    # short DAM: temporal passthrough of the single frame (dup padded)
    np.testing.assert_array_equal(np.asarray(out.spa_positions), [0, 0])


def test_consolidate_dbscan_gmm_methods(rng):
    import dataclasses
    t = 10
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    for method in ("dbscan", "gmm", "sample"):
        cfg = dataclasses.replace(CFG, temporal_method=method)
        out = flash_consolidate(cfg, x, sx, key=jax.random.PRNGKey(0))
        assert out.tem_x.shape == (4, P_SMALL, D)
        assert np.isfinite(np.asarray(out.tem_x)).all()
        ts = np.asarray(out.tem_positions)
        assert np.all((ts >= 0) & (ts < t))


def test_vit_chunked_encode_matches_monolithic():
    """Frame-chunked ViT encode (training memory path) is exact up to f32
    reassociation: Qwen attention is block-diagonal per frame, so chunking
    over frames reproduces the monolithic encoder. (Comparison happens at
    the ENCODER boundary — downstream k-means makes discrete choices that a
    1e-6 reassociation can flip on random features.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.qwen2_vit import (
        qwen_vit_blocks_frames, qwen_vit_encode_frames_chunked)
    from flash_vstream_tpu.models.vstream_qwen import (encode_video,
                                                       init_qwen_params)
    from flash_vstream_tpu.ops.pooling import qwen_temporal_pool
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    t, h, w = 6, 8, 8
    pd = (cfg.vit.in_channels * cfg.vit.temporal_patch_size
          * cfg.vit.patch_size ** 2)
    rng = np.random.default_rng(0)
    patches = jnp.asarray(rng.normal(size=(t * h * w, pd)), jnp.float32)
    small, sg = qwen_temporal_pool(
        patches, (t, h, w), cfg.vit.patch_size, cfg.vit.temporal_patch_size,
        cfg.vit.in_channels)
    D = cfg.vit.hidden_size
    hid = qwen_vit_blocks_frames(
        params["vit"], cfg.vit, jnp.concatenate([patches, small], 0),
        t_full=t, hw_full=(h, w), t_small=sg[0], hw_small=(sg[1], sg[2]))
    x_m = hid[:t * h * w].reshape(t, h * w, D)
    sx_m = hid[t * h * w:].reshape(t, sg[1] * sg[2], D)
    for chunk, remat in ((2, False), (2, True), (3, True)):
        x_c, sx_c = qwen_vit_encode_frames_chunked(
            params["vit"], cfg.vit, patches.reshape(t, h * w, pd),
            small.reshape(t, sg[1] * sg[2], pd),
            hw_full=(h, w), hw_small=(sg[1], sg[2]),
            chunk=chunk, remat=remat)
        np.testing.assert_allclose(np.asarray(x_c), np.asarray(x_m),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sx_c), np.asarray(sx_m),
                                   rtol=1e-4, atol=1e-4)
    # full encode_video path runs with chunking + an odd chunk request
    # (4 does not divide 6 -> falls back to divisor 3) and keeps shapes
    key = jax.random.PRNGKey(1)
    mono = encode_video(params, cfg, patches, (t, h, w), key=key)
    for kw in (dict(vit_chunk=2, vit_remat=True), dict(vit_chunk=4)):
        out = encode_video(params, cfg, patches, (t, h, w), key=key, **kw)
        assert out.video_embeds.shape == mono.video_embeds.shape
        assert np.isfinite(np.asarray(out.video_embeds)).all()


def test_encode_video_uint8_patches_match_host_normalized():
    """uint8 patches + per-chunk device normalization (patch_norm) ==
    host-normalized float patches, chunked AND monolithic: qwen_patchify_u8
    is a pure index permutation and the temporal pool is affine-preserving,
    so normalize-late is the same transform (training halves its biggest
    input argument this way)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.vstream_qwen import (encode_video,
                                                       init_qwen_params)
    from flash_vstream_tpu.preprocess.image import (OPENAI_CLIP_MEAN,
                                                    OPENAI_CLIP_STD,
                                                    qwen_patch_norm,
                                                    qwen_patchify,
                                                    qwen_patchify_u8)
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    T, H, W = 4, 4 * 14, 8 * 14
    frames_u8 = rng.integers(0, 256, (T, H, W, 3), dtype=np.uint8)

    # host-normalized reference patches (the qwen_preprocess pipeline)
    fl = frames_u8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    fl = ((fl - OPENAI_CLIP_MEAN[:, None, None])
          / OPENAI_CLIP_STD[:, None, None])
    ref_patches, grid = qwen_patchify(fl)

    u8_patches, grid_u8 = qwen_patchify_u8(frames_u8)
    assert grid_u8 == grid
    # the permutation itself is bit-exact: normalizing the u8 rows on the
    # feature dim reproduces the host-normalized rows
    sc, sh = qwen_patch_norm()
    np.testing.assert_allclose(u8_patches.astype(np.float32) * sc + sh,
                               ref_patches, rtol=1e-5, atol=1e-5)

    key = jax.random.PRNGKey(1)
    # patch_norm rounds normalized patches to bf16 before the ViT (the
    # production dtype); round the reference input the same way so the
    # comparison isolates WHERE the affine runs, not bf16 quantization
    ref_bf16 = jnp.asarray(ref_patches, jnp.bfloat16).astype(jnp.float32)
    want = encode_video(params, cfg, ref_bf16, grid, key=key)
    for kw in (dict(), dict(vit_chunk=1, vit_remat=True)):
        got = encode_video(params, cfg, jnp.asarray(u8_patches), grid,
                           key=key, patch_norm=(sc, sh), **kw)
        diff = np.abs(np.asarray(got.video_embeds, np.float32)
                      - np.asarray(want.video_embeds, np.float32))
        # the affine identity is exact (asserted at 1e-5 on the patch rows
        # above); the encode comparison only sanity-checks integration.
        # Residual diff is bf16 rounding LOCATION (the u8 path rounds after
        # the pool, the host path before) carried through k-means
        # consolidation — observed mean ~4e-3, max ~2.4e-2
        assert np.mean(diff) < 1e-2, np.mean(diff)
        assert np.max(diff) < 8e-2, np.max(diff)
        np.testing.assert_array_equal(np.asarray(got.visual_positions),
                                      np.asarray(want.visual_positions))


def test_gather_rows_matches_take(rng):
    """Pallas row gather (TPU) == jnp.take; on CPU the fallback path runs,
    and the vmap rule (multi-stream engine) matches per-stream gathers."""
    import jax
    import jax.numpy as jnp
    from flash_vstream_tpu.kernels.gather_rows import gather_rows
    bank = jnp.asarray(rng.normal(size=(16, 8, 128)).astype(np.float32))
    idx = jnp.asarray([3, 0, 15, 3, 7])
    got = jax.jit(gather_rows)(bank, idx)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(bank)[np.asarray(idx)])
    banks = jnp.stack([bank, bank * 2])
    idxs = jnp.asarray([[1, 2, 3, 4, 5], [0, 0, 1, 1, 2]])
    vout = jax.jit(jax.vmap(gather_rows))(banks, idxs)
    for s in range(2):
        np.testing.assert_array_equal(
            np.asarray(vout[s]), np.asarray(banks[s])[np.asarray(idxs[s])])


def test_stream_merge_single_clip_matches_offline(rng):
    """temporal_method='merge': feeding a whole video as one clip through
    flash_stream_update equals flash_consolidate — the streaming path is the
    same sequential scan continued from an empty state."""
    import dataclasses
    cfg = dataclasses.replace(CFG, temporal_method="merge")
    t = 10
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    off = flash_consolidate(cfg, x, sx, key=jax.random.PRNGKey(0))
    state = init_flash_state(cfg, P_FULL, P_SMALL, D, bank_size=16)
    state, out = flash_stream_update(cfg, state, x, sx, jnp.int32(t),
                                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out.tem_x), np.asarray(off.tem_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.tem_weights),
                               np.asarray(off.tem_weights), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.tem_positions),
                                  np.asarray(off.tem_positions))


def test_stream_attention_single_clip_matches_offline(rng):
    """temporal_method='attention' with rest <= one chunk: streaming fold of
    the tail equals the offline chunked compression."""
    import dataclasses
    cfg = dataclasses.replace(CFG, temporal_method="attention")
    t = 7                      # rest = 3 <= K=4 -> exactly one fold chunk
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    off = flash_consolidate(cfg, x, sx, key=jax.random.PRNGKey(0))
    state = init_flash_state(cfg, P_FULL, P_SMALL, D, bank_size=16)
    state, out = flash_stream_update(cfg, state, x, sx, jnp.int32(t),
                                     jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out.tem_x), np.asarray(off.tem_x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.tem_positions),
                                  np.asarray(off.tem_positions))


def test_stream_update_all_registry_methods(rng):
    """Every reference method_dic name streams: multi-clip updates stay
    finite, keep sorted-enough timestamps, and saturate the CSM bank."""
    import dataclasses
    for method in ("sample", "merge", "drop", "kmeans", "kmeans_ordered",
                   "fast_kmeans_ordered", "pca_kmeans_ordered",
                   "torchpca_kmeans_ordered", "dbscan", "gmm", "attention"):
        cfg = dataclasses.replace(CFG, temporal_method=method,
                                  temporal_pca_dim=4)
        state = init_flash_state(cfg, P_FULL, P_SMALL, D, bank_size=16)
        step = jax.jit(lambda s, x, sx, n, k, _cfg=cfg:
                       flash_stream_update(_cfg, s, x, sx, n, k))
        for i in range(4):
            x = jnp.asarray(rng.normal(size=(3, P_FULL, D)).astype(np.float32))
            sx = jnp.asarray(
                rng.normal(size=(3, P_SMALL, D)).astype(np.float32))
            state, out = step(state, x, sx, jnp.int32(3),
                              jax.random.PRNGKey(i))
        assert int(state.n_frames) == 12, method
        assert bool(state.tem_valid.all()), method
        assert np.isfinite(np.asarray(state.tem_x)).all(), method
        ts = np.asarray(state.tem_times)
        assert np.all((ts >= 0) & (ts < 12)), (method, ts)


def test_consolidate_all_registry_methods(rng):
    """Every reference method_dic name consolidates offline (the reference
    itself crashes on merge/drop/kmeans/dbscan/gmm/attention — see
    tests/test_reference_oracle.py::test_reference_registry_entries_are_broken)."""
    import dataclasses
    t = 10
    x = jnp.asarray(rng.normal(size=(t, P_FULL, D)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(t, P_SMALL, D)).astype(np.float32))
    for method in ("sample", "merge", "drop", "kmeans", "kmeans_ordered",
                   "fast_kmeans_ordered", "pca_kmeans_ordered",
                   "torchpca_kmeans_ordered", "dbscan", "gmm", "attention"):
        cfg = dataclasses.replace(CFG, temporal_method=method,
                                  temporal_pca_dim=4)
        out = flash_consolidate(cfg, x, sx, key=jax.random.PRNGKey(0))
        assert out.tem_x.shape == (4, P_SMALL, D), method
        assert np.isfinite(np.asarray(out.tem_x)).all(), method
        ts = np.asarray(out.tem_positions)
        assert np.all((ts >= 0) & (ts < t)), (method, ts)
