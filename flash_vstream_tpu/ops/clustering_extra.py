"""DBSCAN and GMM temporal-compression alternates, fixed-shape in JAX.

Reference: dbscan_feature / gmm_feature
(Flash-VStream-Qwen/models/compress_functions.py:671-719), which call
sklearn's DBSCAN(eps=0.62, min_samples=2) and GaussianMixture on host.
TPU-first rebuilds:

- DBSCAN: one [T, T] distance matmul; core points by neighbor count;
  connected components via min-label propagation over the core-reachability
  graph (lax.while_loop, converges in <= T iterations, usually ~log T);
  noise points become singleton clusters up to the budget, matching the
  reference's reassignment (compress_functions.py:680-691).
- GMM: PCA projection then diagonal-covariance EM with fixed iterations
  (the reference's sklearn GaussianMixture on PCA-32 features).

Both return a fixed number of clusters with validity masks.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .distances import sq_euclidean_distance
from .kmeans import greedy_init_centroids, pca_project, weighted_kmeans


class ClusterResult(NamedTuple):
    centroids: jnp.ndarray   # [k, D] cluster means of ORIGINAL features
    valid: jnp.ndarray       # [k] bool
    labels: jnp.ndarray      # [T] final cluster slot per point (-1 = dropped)


def dbscan_compress(x: jnp.ndarray, k: int, *, eps: float = 0.62,
                    min_samples: int = 2,
                    valid: Optional[jnp.ndarray] = None) -> ClusterResult:
    """Fixed-shape DBSCAN to at most k clusters. x: [T, D]."""
    T = x.shape[0]
    if valid is None:
        valid = jnp.ones((T,), bool)
    d2 = sq_euclidean_distance(x, x)
    adj = (d2 <= eps * eps) & valid[None, :] & valid[:, None]   # [T, T]
    n_nbrs = jnp.sum(adj, axis=1)                                # incl. self
    core = (n_nbrs >= min_samples) & valid

    # density-reachability: points connect through CORE points only
    # propagate min point-index labels over edges where either end is core
    edges = adj & (core[:, None] | core[None, :])
    init = jnp.where(valid, jnp.arange(T), T)

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        nbr_min = jnp.min(jnp.where(edges, labels[None, :], T), axis=1)
        new = jnp.minimum(labels, nbr_min)
        # border/noise points keep their own label unless adjacent to a core
        return (new, jnp.any(new != labels))

    labels, _ = jax.lax.while_loop(cond, body, (init, jnp.bool_(True)))
    # a cluster is real only if its root is a core point's component of >= 2
    is_clustered = core | (jnp.sum(edges, axis=1) > 1) & valid
    root = jnp.where(is_clustered & valid, labels, T + jnp.arange(T))

    # compact roots into slots [0, k): order by first appearance (min index)
    # cluster roots first (reference assigns noise new ids after clusters)
    is_root = (root == jnp.arange(T)) & valid & is_clustered
    noise = valid & ~is_clustered
    # slot ids: clustered roots by index order, then noise points
    root_rank = jnp.cumsum(is_root) - 1                 # rank among roots
    n_clusters = jnp.sum(is_root)
    noise_rank = jnp.cumsum(noise) - 1 + n_clusters
    slot_of_point = jnp.where(is_root, root_rank,
                              jnp.where(noise, noise_rank, -1))
    # each point's slot = slot of its root (noise points are their own root)
    slot = jnp.where(noise, slot_of_point,
                     slot_of_point[jnp.clip(root, 0, T - 1)])
    slot = jnp.where(valid & (slot < k) & (slot >= 0), slot, -1)

    onehot = (slot[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.dot(onehot.T, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return ClusterResult(centroids, counts > 0, slot.astype(jnp.int32))


def gmm_compress(x: jnp.ndarray, k: int, *, pca_dim: int = 32,
                 iters: int = 20, key: Optional[jax.Array] = None,
                 valid: Optional[jnp.ndarray] = None) -> ClusterResult:
    """Diagonal-covariance EM GMM on PCA-projected rows; cluster means over
    the ORIGINAL features (gmm_feature semantics). x: [T, D]."""
    T, D = x.shape
    if valid is None:
        valid = jnp.ones((T,), bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    pd = min(pca_dim, D, T)
    z = pca_project(x, pd)                                   # [T, pd]
    # init from k-means with greedy farthest-point seeding (k-means++-like,
    # sklearn's default init family) for stability
    init = greedy_init_centroids(z, k, valid)
    km = weighted_kmeans(z, k, valid=valid, init=init, iters=15)
    mu = km.centroids                                        # [k, pd]
    var = jnp.ones((k, pd), jnp.float32)
    pi = jnp.full((k,), 1.0 / k, jnp.float32)
    vmask = valid.astype(jnp.float32)

    def em(_, state):
        mu, var, pi = state
        # E-step: log N(z | mu, diag var)
        lognorm = -0.5 * jnp.sum(jnp.log(2 * jnp.pi * var), axis=1)   # [k]
        diff2 = (z[:, None, :] - mu[None, :, :]) ** 2 / var[None, :, :]
        loglik = lognorm[None, :] - 0.5 * jnp.sum(diff2, axis=2)      # [T, k]
        logp = loglik + jnp.log(jnp.maximum(pi, 1e-12))[None, :]
        r = jax.nn.softmax(logp, axis=1) * vmask[:, None]             # [T, k]
        # M-step
        nk = jnp.sum(r, axis=0) + 1e-6
        mu = jnp.dot(r.T, z) / nk[:, None]
        var = jnp.dot(r.T, z * z) / nk[:, None] - mu ** 2 + 1e-6
        pi = nk / jnp.sum(nk)
        return mu, var, pi

    mu, var, pi = jax.lax.fori_loop(0, iters, em, (mu, var, pi))
    # hard assignment for the output means (reference: gmm.predict)
    diff2 = (z[:, None, :] - mu[None, :, :]) ** 2 / var[None, :, :]
    loglik = -0.5 * jnp.sum(diff2, axis=2) - 0.5 * jnp.sum(
        jnp.log(2 * jnp.pi * var), axis=1)[None, :]
    labels = jnp.argmax(loglik + jnp.log(jnp.maximum(pi, 1e-12))[None, :],
                        axis=1)
    labels = jnp.where(valid, labels, -1)
    onehot = (labels[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.dot(onehot.T, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    return ClusterResult(centroids, counts > 0, labels.astype(jnp.int32))
