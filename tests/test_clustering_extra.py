"""DBSCAN / GMM compression alternates vs sklearn ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_vstream_tpu.ops.clustering_extra import dbscan_compress, gmm_compress


def make_blobs(rng, k=3, per=8, d=6, spread=0.05):
    centers = rng.normal(size=(k, d)) * 4.0
    pts = np.concatenate([centers[i] + rng.normal(size=(per, d)) * spread
                          for i in range(k)])
    return pts.astype(np.float32), np.repeat(np.arange(k), per)


def test_dbscan_finds_blobs(rng):
    x, gt = make_blobs(rng)
    res = dbscan_compress(jnp.asarray(x), k=6, eps=1.0)
    labels = np.asarray(res.labels)
    # same-blob points share a slot; different blobs differ
    for b in range(3):
        blob = labels[gt == b]
        assert (blob == blob[0]).all(), blob
    assert len({labels[gt == b][0] for b in range(3)}) == 3
    assert int(res.valid.sum()) == 3


def test_dbscan_matches_sklearn_grouping(rng):
    sklearn = pytest.importorskip("sklearn.cluster")
    x, _ = make_blobs(rng, k=4, per=5, d=4, spread=0.1)
    eps = 1.2
    sk = sklearn.DBSCAN(eps=eps, min_samples=2).fit(x)
    res = dbscan_compress(jnp.asarray(x), k=10, eps=eps)
    ours = np.asarray(res.labels)
    # same partition (up to label permutation) on clustered points
    for i in range(len(x)):
        for j in range(len(x)):
            if sk.labels_[i] >= 0 and sk.labels_[j] >= 0:
                assert ((sk.labels_[i] == sk.labels_[j])
                        == (ours[i] == ours[j])), (i, j)


def test_dbscan_noise_becomes_singletons(rng):
    x, _ = make_blobs(rng, k=2, per=4, d=4, spread=0.05)
    outlier = rng.normal(size=(1, 4)).astype(np.float32) * 50
    x = np.concatenate([x, outlier])
    res = dbscan_compress(jnp.asarray(x), k=8, eps=1.0)
    labels = np.asarray(res.labels)
    # outlier got its own singleton slot (reference noise reassignment)
    assert labels[-1] >= 0
    assert (labels[:-1] != labels[-1]).all()


def test_dbscan_jit_and_padding(rng):
    x, _ = make_blobs(rng)
    xp = np.concatenate([x, np.full((6, x.shape[1]), 9.9, np.float32)])
    valid = np.arange(len(xp)) < len(x)
    f = jax.jit(lambda x, v: dbscan_compress(x, k=6, eps=1.0, valid=v))
    res = f(jnp.asarray(xp), jnp.asarray(valid))
    base = dbscan_compress(jnp.asarray(x), k=6, eps=1.0)
    np.testing.assert_allclose(np.asarray(res.centroids),
                               np.asarray(base.centroids), rtol=1e-5)


def test_gmm_separates_blobs(rng):
    x, gt = make_blobs(rng, k=3, per=10, d=8)
    res = gmm_compress(jnp.asarray(x), k=3, pca_dim=4,
                       key=jax.random.PRNGKey(0))
    labels = np.asarray(res.labels)
    for b in range(3):
        blob = labels[gt == b]
        assert (blob == blob[0]).all()
    assert len(set(labels.tolist())) == 3
    # cluster means close to blob means
    for b in range(3):
        slot = labels[gt == b][0]
        np.testing.assert_allclose(np.asarray(res.centroids)[slot],
                                   x[gt == b].mean(0), atol=0.1)
