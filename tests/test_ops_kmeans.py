"""Golden tests for masked weighted k-means vs a numpy mirror of the
reference algorithm (weighted_kmeans_torch semantics, fixed init, no early
tol-break, final re-assignment)."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.ops import (
    pca_project,
    pca_weighted_kmeans_ordered,
    weighted_kmeans,
    weighted_kmeans_ordered,
)


def np_weighted_kmeans(x, k, weights, init, iters=10):
    """Numpy mirror: Lloyd iterations with weighted centroid updates."""
    c = init.copy().astype(np.float64)
    xf = x.astype(np.float64)
    for _ in range(iters):
        d = ((xf[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        labels = d.argmin(1)
        for j in range(k):
            m = labels == j
            wsum = weights[m].sum()
            if wsum > 0:
                c[j] = (weights[m, None] * xf[m]).sum(0) / wsum
            # empty clusters: the jax op reseeds at the worst-fit point; with
            # well-separated test data this path never triggers.
    d = ((xf[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    labels = d.argmin(1)
    cw = np.array([weights[labels == j].sum() for j in range(k)])
    ts = np.array([
        np.arange(len(x))[labels == j].mean() if (labels == j).any() else len(x)
        for j in range(k)
    ])
    return c, labels, cw, ts


def make_clustered(rng, T, k, D, spread=0.05):
    centers = rng.normal(size=(k, D)) * 3.0
    assign = rng.integers(0, k, size=T)
    # ensure all clusters used
    assign[:k] = np.arange(k)
    x = centers[assign] + rng.normal(size=(T, D)) * spread
    return x.astype(np.float32)


def test_weighted_kmeans_matches_mirror(rng):
    T, k, D = 40, 5, 16
    x = make_clustered(rng, T, k, D)
    w = rng.uniform(0.5, 2.0, size=T).astype(np.float32)
    init = x[:k].copy()
    res = weighted_kmeans(jnp.asarray(x), k, weights=jnp.asarray(w),
                          init=jnp.asarray(init), iters=10)
    c, labels, cw, ts = np_weighted_kmeans(x, k, w, init)
    np.testing.assert_allclose(np.asarray(res.centroids), c, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(res.labels), labels)
    np.testing.assert_allclose(np.asarray(res.cluster_weights), cw, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(res.timestamps), ts, rtol=1e-4, atol=1e-4)


def test_weighted_kmeans_padding_invariance(rng):
    """Padded rows with valid=False must not change the result."""
    T, k, D, pad = 24, 4, 8, 12
    x = make_clustered(rng, T, k, D)
    init = x[:k].copy()
    res_a = weighted_kmeans(jnp.asarray(x), k, init=jnp.asarray(init))
    xp = np.concatenate([x, np.full((pad, D), 7.7, np.float32)])
    valid = np.arange(T + pad) < T
    res_b = weighted_kmeans(jnp.asarray(xp), k, valid=jnp.asarray(valid),
                            init=jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(res_a.centroids),
                               np.asarray(res_b.centroids), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_a.cluster_weights),
                               np.asarray(res_b.cluster_weights), rtol=1e-4, atol=1e-4)


def test_ordered_kmeans_sorted_by_time(rng):
    T, k, D = 60, 6, 12
    # temporally ordered clusters: cluster i occupies frames [10i, 10i+10)
    centers = rng.normal(size=(k, D)) * 3.0
    x = np.repeat(centers, 10, axis=0) + rng.normal(size=(T, D)).astype(np.float32) * 0.01
    x = x.astype(np.float32)
    res = weighted_kmeans_ordered(jnp.asarray(x), k, init=jnp.asarray(x[::10].copy()))
    ts = np.asarray(res.timestamps)
    assert np.all(np.diff(ts) >= 0), ts
    # each cluster's mean time should be near the center of its 10-frame block
    np.testing.assert_allclose(ts, np.arange(k) * 10 + 4.5, atol=1.0)
    # labels remapped: frame 0 -> cluster 0, last frame -> cluster k-1
    labels = np.asarray(res.labels)
    assert labels[0] == 0 and labels[-1] == k - 1


def test_kmeans_jit_compiles(rng):
    T, k, D = 32, 4, 8
    x = make_clustered(rng, T, k, D)
    f = jax.jit(lambda x, key: weighted_kmeans(x, 4, key=key))
    res = f(jnp.asarray(x), jax.random.PRNGKey(1))
    assert res.centroids.shape == (4, D)
    assert np.isfinite(np.asarray(res.centroids)).all()


def test_pca_project_reconstruction(rng):
    # data in a 3-dim subspace of 10-dim space: top-3 PCA captures everything
    basis = rng.normal(size=(3, 10)).astype(np.float32)
    coef = rng.normal(size=(50, 3)).astype(np.float32)
    x = coef @ basis
    proj = np.asarray(pca_project(jnp.asarray(x), 3))
    # projection preserves pairwise distances of the subspace data
    d_orig = ((x[:, None] - x[None, :]) ** 2).sum(-1)
    d_proj = ((proj[:, None] - proj[None, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d_proj, d_orig, rtol=1e-2, atol=1e-2)


def test_pca_kmeans_ordered_runs(rng):
    T, k = 30, 4
    x = make_clustered(rng, T, k, 24)
    res = pca_weighted_kmeans_ordered(jnp.asarray(x), k, pca_dim=4,
                                      key=jax.random.PRNGKey(0),
                                      tokens_per_frame=2)
    assert res.centroids.shape == (k, 24)
    assert np.isfinite(np.asarray(res.centroids)).all()
    ts = np.asarray(res.timestamps)
    assert np.all(np.diff(ts) >= 0)
