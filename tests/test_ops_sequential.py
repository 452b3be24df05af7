"""Golden tests for sequential compression ops vs list-based numpy mirrors of
the reference algorithms (compress_functions.py:20-260 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.ops import (
    drop_frames,
    k_drop_frames,
    k_merge_frames,
    merge_frames,
    sample_frames,
)

NEG = -100.0


def cos(a, b):
    return float(np.dot(a, b) / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-8))


def np_merge(x, t0):
    """Mirror of merge_feature: average the most-similar adjacent pair."""
    feats = [x[i].astype(np.float64) for i in range(t0)]
    sims = [cos(feats[i], feats[i + 1]) for i in range(t0 - 1)]
    for i in range(t0, len(x)):
        new = x[i].astype(np.float64)
        sims.append(cos(feats[-1], new))
        feats.append(new)
        idx = int(np.argmax(sims))
        feats[idx + 1] = (feats[idx] + feats[idx + 1]) / 2.0
        del feats[idx]
        del sims[idx]
        if idx > 0:
            sims[idx - 1] = cos(feats[idx - 1], feats[idx])
        if idx + 1 < t0:
            sims[idx] = cos(feats[idx], feats[idx + 1])
    return np.stack(feats)


def np_drop(x, t0, coins):
    """Mirror of drop_feature with an explicit coin sequence."""
    feats = [x[i].astype(np.float64) for i in range(t0)]
    sims = [cos(feats[i], feats[i + 1]) for i in range(t0 - 1)]
    for step, i in enumerate(range(t0, len(x))):
        new = x[i].astype(np.float64)
        sims.append(cos(feats[-1], new))
        feats.append(new)
        idx = int(np.argmax(sims))
        if coins[step]:
            idx += 1
        del feats[idx]
        if idx == t0:
            del sims[t0 - 1]
        elif idx == 0:
            del sims[0]
        else:
            del sims[idx]
            sims[idx - 1] = cos(feats[idx - 1], feats[idx])
    return np.stack(feats)


def np_k_merge(x, t0):
    """Mirror of k_merge_feature: merge the globally most-similar pair."""
    feats = [x[i].astype(np.float64) for i in range(t0)]

    def normed(v):
        return v / max(np.linalg.norm(v), 1e-12)

    nf = [normed(f) for f in feats]
    S = np.array([[np.dot(a, b) for b in nf] for a in nf])
    np.fill_diagonal(S, NEG)
    for i in range(t0, len(x)):
        new = x[i].astype(np.float64)
        nnew = normed(new)
        col = np.array([np.dot(a, nnew) for a in nf])
        A = np.full((t0 + 1, t0 + 1), NEG)
        A[:t0, :t0] = S
        A[:t0, t0] = col
        A[t0, :t0] = col
        feats.append(new)
        nf.append(nnew)
        flat = int(np.argmax(A))
        left, right = flat // (t0 + 1), flat % (t0 + 1)
        feats[right] = (feats[left] + feats[right]) / 2.0
        nf[right] = normed(feats[right])
        rs = np.array([np.dot(a, nf[right]) for a in nf])
        A[right, :] = rs
        A[:, right] = rs
        A[right, right] = NEG
        del feats[left]
        del nf[left]
        A = np.delete(np.delete(A, left, axis=0), left, axis=1)
        S = A
    return np.stack(feats)


def np_k_drop(x, t0, coins):
    feats = [x[i].astype(np.float64) for i in range(t0)]

    def normed(v):
        return v / max(np.linalg.norm(v), 1e-12)

    nf = [normed(f) for f in feats]
    S = np.array([[np.dot(a, b) for b in nf] for a in nf])
    np.fill_diagonal(S, NEG)
    for step, i in enumerate(range(t0, len(x))):
        new = x[i].astype(np.float64)
        nnew = normed(new)
        col = np.array([np.dot(a, nnew) for a in nf])
        A = np.full((t0 + 1, t0 + 1), NEG)
        A[:t0, :t0] = S
        A[:t0, t0] = col
        A[t0, :t0] = col
        feats.append(new)
        nf.append(nnew)
        flat = int(np.argmax(A))
        left, right = flat // (t0 + 1), flat % (t0 + 1)
        idx = left if coins[step] else right
        del feats[idx]
        del nf[idx]
        A = np.delete(np.delete(A, idx, axis=0), idx, axis=1)
        S = A
    return np.stack(feats)


def test_merge_matches_mirror(rng):
    T, t0, D = 17, 6, 12
    x = rng.normal(size=(T, D)).astype(np.float32)
    res = merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    want = np_merge(x, t0)
    assert np.asarray(res.valid).all()
    np.testing.assert_allclose(np.asarray(res.features), want, rtol=1e-3, atol=1e-3)


def test_merge_short_passthrough(rng):
    T, t0, D = 4, 6, 8
    x = np.zeros((10, D), np.float32)
    x[:T] = rng.normal(size=(T, D))
    res = merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    valid = np.asarray(res.valid)
    assert valid.sum() == T
    np.testing.assert_allclose(np.asarray(res.features)[:T], x[:T], rtol=1e-5)


def test_merge_padding_invariance(rng):
    T, t0, D = 15, 5, 8
    x = rng.normal(size=(T, D)).astype(np.float32)
    xp = np.concatenate([x, np.full((9, D), 3.3, np.float32)])
    a = merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    b = merge_frames(jnp.asarray(xp), jnp.int32(T), t0)
    np.testing.assert_allclose(np.asarray(a.features), np.asarray(b.features),
                               rtol=1e-5, atol=1e-5)


def test_drop_matches_mirror(rng):
    T, t0, D = 14, 5, 10
    x = rng.normal(size=(T, D)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    res = drop_frames(jnp.asarray(x), jnp.int32(T), t0, key)
    # same coin layout the op uses internally
    coins = np.asarray(jax.random.bernoulli(key, 0.5, (T - t0,)))
    want = np_drop(x, t0, coins)
    np.testing.assert_allclose(np.asarray(res.features), want, rtol=1e-3, atol=1e-3)


def test_k_merge_matches_mirror(rng):
    T, t0, D = 13, 5, 9
    x = rng.normal(size=(T, D)).astype(np.float32)
    res = k_merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    want = np_k_merge(x, t0)
    np.testing.assert_allclose(np.asarray(res.features), want, rtol=1e-3, atol=1e-3)


def test_k_drop_matches_mirror(rng):
    T, t0, D = 12, 4, 7
    x = rng.normal(size=(T, D)).astype(np.float32)
    key = jax.random.PRNGKey(5)
    res = k_drop_frames(jnp.asarray(x), jnp.int32(T), t0, key)
    coins = np.asarray(jax.random.bernoulli(key, 0.5, (T - t0,)))
    want = np_k_drop(x, t0, coins)
    np.testing.assert_allclose(np.asarray(res.features), want, rtol=1e-3, atol=1e-3)


def test_sequential_ops_jit(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    f = jax.jit(lambda x, n: merge_frames(x, n, 6))
    res = f(jnp.asarray(x), jnp.int32(20))
    assert res.features.shape == (6, 8)


def test_sample_frames(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    out, idx = sample_frames(jnp.asarray(x), jnp.int32(20), 5)
    want_idx = np.linspace(0, 19, 5).astype(np.int64)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(out), x[want_idx])
