"""Golden tests for NTM memory update and pooling ops."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.ops import (
    init_ntm_params,
    merge_2x2_tokens,
    ntm_compress,
    ntm_update,
    qwen_temporal_pool,
    spatial_pool,
    star_retrieve,
)


def np_ntm_update(p, mem, new, ratio):
    q = mem @ np.asarray(p.wq) + np.asarray(p.bq)
    k = new @ np.asarray(p.wk) + np.asarray(p.bk)
    scores = q @ k.T / np.sqrt(q.shape[1])
    e = np.exp(scores - scores.max(-1, keepdims=True))
    w = e / e.sum(-1, keepdims=True) * ratio
    decay = w.sum(-1, keepdims=True)
    return mem * (1 - decay) + w @ new


def test_ntm_update_matches_mirror(rng):
    D, H = 16, 8
    p = init_ntm_params(jax.random.PRNGKey(0), D, H)
    mem = rng.normal(size=(6, D)).astype(np.float32)
    new = rng.normal(size=(9, D)).astype(np.float32)
    got = np.asarray(ntm_update(p, jnp.asarray(mem), jnp.asarray(new)))
    want = np_ntm_update(p, mem, new, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ntm_update_mask_matches_slice(rng):
    D, H = 12, 4
    p = init_ntm_params(jax.random.PRNGKey(1), D, H)
    mem = rng.normal(size=(5, D)).astype(np.float32)
    new = rng.normal(size=(8, D)).astype(np.float32)
    valid = np.array([True] * 5 + [False] * 3)
    got = np.asarray(ntm_update(p, jnp.asarray(mem), jnp.asarray(new),
                                jnp.asarray(valid)))
    want = np_ntm_update(p, mem, new[:5], 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ntm_compress_matches_chunked_mirror(rng):
    T, P, D, t0 = 11, 2, 10, 3
    p = init_ntm_params(jax.random.PRNGKey(2), D, 4)
    x = rng.normal(size=(T, P, D)).astype(np.float32)
    got = np.asarray(ntm_compress(p, jnp.asarray(x), jnp.int32(T), t0, P))
    mem = x[:t0].reshape(t0 * P, D).astype(np.float64)
    for i in range(t0, T, t0):
        j = min(i + t0, T)
        mem = np_ntm_update(p, mem, x[i:j].reshape(-1, D), 0.2)
    np.testing.assert_allclose(got.reshape(t0 * P, D), mem, rtol=1e-3, atol=1e-3)


def test_ntm_compress_short_passthrough(rng):
    T, P, D, t0 = 2, 2, 6, 4
    p = init_ntm_params(jax.random.PRNGKey(3), D, 4)
    x = np.zeros((8, P, D), np.float32)
    x[:T] = rng.normal(size=(T, P, D))
    got = np.asarray(ntm_compress(p, jnp.asarray(x), jnp.int32(T), t0, P))
    np.testing.assert_allclose(got[:T], x[:T], rtol=1e-5)


def test_spatial_pool(rng):
    x = rng.normal(size=(3, 16, 5)).astype(np.float32)  # 4x4 grid
    got = np.asarray(spatial_pool(jnp.asarray(x), 2))
    grid = x.reshape(3, 4, 4, 5)
    want = grid.reshape(3, 2, 2, 2, 2, 5).mean(axis=(2, 4)).reshape(3, 4, 5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    got1 = np.asarray(spatial_pool(jnp.asarray(x), 1))
    np.testing.assert_allclose(got1, x.mean(1, keepdims=True), rtol=1e-5, atol=1e-6)


def test_merge_2x2_tokens(rng):
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    got = np.asarray(merge_2x2_tokens(jnp.asarray(x)))
    assert got.shape == (2, 4, 12)
    grid = x.reshape(2, 4, 4, 3)
    # first output token = patches (0,0),(0,1),(1,0),(1,1) concatenated
    want0 = np.concatenate([grid[:, 0, 0], grid[:, 0, 1], grid[:, 1, 0], grid[:, 1, 1]], -1)
    np.testing.assert_allclose(got[:, 0], want0, rtol=1e-6)


def test_qwen_temporal_pool_shapes_and_mean(rng):
    t, h, w = 2, 4, 8   # grid (already /14 patch units); h, w multiples of 4
    xdim = 3 * 2 * 14 * 14
    x = rng.normal(size=(t * h * w, xdim)).astype(np.float32)
    out, new_thw = qwen_temporal_pool(jnp.asarray(x), (t, h, w))
    assert new_thw == (t, h // 2, w // 2)
    assert out.shape == (t * (h // 2) * (w // 2), xdim)
    # total pixel mass preserved by averaging (mean over all entries equal)
    np.testing.assert_allclose(float(jnp.mean(out)), float(np.mean(x)),
                               rtol=1e-3, atol=1e-5)


def test_qwen_temporal_pool_constant_block(rng):
    """A frame with constant pixel values pools to the same constant."""
    t, h, w = 2, 4, 4
    xdim = 3 * 2 * 14 * 14
    x = np.full((t * h * w, xdim), 2.5, np.float32)
    out, _ = qwen_temporal_pool(jnp.asarray(x), (t, h, w))
    np.testing.assert_allclose(np.asarray(out), 2.5, rtol=1e-6)


def test_star_retrieve(rng):
    # 3 well-separated clusters; heaviest cluster's nearest frame is itself
    L, Dp, T = 4, 6, 10
    centroids = rng.normal(size=(L, Dp)).astype(np.float32) * 5
    weights = np.array([1.0, 9.0, 3.0, 2.0], np.float32)
    bank = np.concatenate([centroids + 0.01, rng.normal(size=(T - L, Dp)).astype(np.float32) * 20])
    valid = np.ones(T, bool)
    idx = np.asarray(star_retrieve(jnp.asarray(centroids), jnp.asarray(weights),
                                   jnp.asarray(bank), jnp.asarray(valid), 2))
    # top-2 weights are clusters 1 and 2 -> nearest bank rows 1 and 2
    np.testing.assert_array_equal(idx, [1, 2])
