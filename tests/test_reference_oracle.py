"""Oracle tests: run the ACTUAL reference PyTorch code (read-only under
/root/reference) on shared random inputs and assert the JAX ops match.

This is the test layer VERDICT r3 asked for: golden tests elsewhere verify
against numpy mirrors, which could encode the same misreading as the op under
test; here the oracle is the reference itself (torch CPU), with the three
documented deviations shimmed:

1. random centroid init (torch.randperm, compress_functions.py:134,216) ->
   patched to the identity permutation; the JAX op receives the equivalent
   init explicitly.
2. coin flips (random.randint in drop/k_drop, compress_functions.py:49,607)
   -> replayed from the jax.random.bernoulli coins the JAX op derives from
   its PRNG key.
3. early tol-break in Lloyd iterations -> avoided by well-separated cluster
   data, where break/no-break reach the same fixed point.

The STAR retrieval-indexing deviation and the PCA eigenvector-order deviation
are DEMONSTRATED (the reference's quirk and the repo's intent are both
asserted), proving the documented-deviations list is exhaustive for these ops.
"""
import functools
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# reference module loading
# ---------------------------------------------------------------------------

def _load_by_path(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def qcf():
    """Qwen-generation compress_functions.py (standalone torch module)."""
    return _load_by_path(
        f"{REF}/Flash-VStream-Qwen/models/compress_functions.py",
        "ref_qwen_compress")


@pytest.fixture(scope="module")
def lcf():
    """LLaVA-generation compress_functions.py."""
    return _load_by_path(
        f"{REF}/Flash-VStream-LLaVA/flash_vstream/model/compress_functions.py",
        "ref_llava_compress")


@pytest.fixture(scope="module")
def varch():
    """LLaVA vstream_arch (NTM + STAR assembly)."""
    if f"{REF}/Flash-VStream-LLaVA" not in sys.path:
        sys.path.insert(0, f"{REF}/Flash-VStream-LLaVA")
    from flash_vstream.model import vstream_arch
    return vstream_arch


@pytest.fixture(scope="module")
def qmodel():
    """Qwen vstream_qwen2vl_model (FlashMemory + get_rope_index).

    The file imports one symbol removed from modern transformers; stub it
    (nothing under test touches it)."""
    import transformers.models.qwen2_vl.modeling_qwen2_vl as q
    if not hasattr(q, "_prepare_4d_causal_attention_mask_with_cache_position"):
        q._prepare_4d_causal_attention_mask_with_cache_position = None
    pkg_dir = f"{REF}/Flash-VStream-Qwen/models"
    # synthetic package WITHOUT executing the reference __init__ (it imports
    # the processor, which needs another removed transformers symbol)
    pkg = types.ModuleType("ref_qwen_models")
    pkg.__path__ = [pkg_dir]
    sys.modules["ref_qwen_models"] = pkg
    spec = importlib.util.spec_from_file_location(
        "ref_qwen_models.vstream_qwen2vl_model",
        f"{pkg_dir}/vstream_qwen2vl_model.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# shims + data helpers
# ---------------------------------------------------------------------------

@pytest.fixture
def fixed_randperm(monkeypatch):
    """Shim deviation #1: identity init permutation."""
    monkeypatch.setattr(torch, "randperm",
                        lambda n, **kw: torch.arange(n))


def _replay_coins(monkeypatch, coins):
    """Shim deviation #2: random.randint replays the jax bernoulli coins."""
    import random
    it = iter(np.asarray(coins).astype(int).tolist())
    monkeypatch.setattr(random, "randint", lambda a, b: next(it))


def blobs(rng, T, k, PD, spread=0.02, assign=None):
    """Well-separated clusters (shim #3: exact Lloyd convergence), first k
    rows covering each cluster once, all rows distinct."""
    centers = rng.normal(size=(k, PD)) * 5.0
    if assign is None:
        assign = rng.integers(0, k, size=T)
        assign[:k] = np.arange(k)
    x = centers[np.asarray(assign)] + rng.normal(size=(T, PD)) * spread
    return x.astype(np.float32)


def distinct_size_assign(T, k):
    """Cluster assignment with strictly distinct cluster sizes (so
    weight-descending argsort order is unambiguous across frameworks)."""
    sizes = np.arange(1, k + 1)
    sizes[-1] += T - sizes.sum()
    assert sizes[-1] > sizes[-2], (T, k)
    head = np.arange(k)                         # first k rows cover clusters
    rest = np.concatenate([np.full(s - 1, i) for i, s in enumerate(sizes)])
    return np.concatenate([head, rest])


def _labels_from_step_indices(step_indices, T):
    lab = np.zeros(T, int)
    for ci, members in enumerate(step_indices):
        for j in members:
            lab[j] = ci
    return lab


# ---------------------------------------------------------------------------
# k-means family (Qwen compress_functions.py:101-385 / LLaVA :92-178)
# ---------------------------------------------------------------------------

def test_oracle_weighted_kmeans(lcf, fixed_randperm, rng):
    """weighted_kmeans_feature (LLaVA compress_functions.py:139-178;
    identical in the Qwen subproject)."""
    from flash_vstream_tpu.ops import weighted_kmeans
    T, k, P, D = 24, 5, 2, 6
    x = blobs(rng, T, k, P * D)
    w = rng.uniform(0.5, 2.0, size=T).astype(np.float32)
    ref_feat, ref_w, ref_idx = lcf.weighted_kmeans_feature(
        torch.tensor(x.reshape(T, P, D)), k, torch.tensor(w))
    res = weighted_kmeans(jnp.asarray(x), k, weights=jnp.asarray(w),
                          init=jnp.asarray(x[:k]))
    np.testing.assert_allclose(np.asarray(res.centroids),
                               ref_feat.numpy().reshape(k, P * D),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.cluster_weights),
                               ref_w.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(res.labels), _labels_from_step_indices(ref_idx[0], T))


def test_oracle_kmeans_unweighted(lcf, fixed_randperm, rng):
    """kmeans_feature (LLaVA compress_functions.py:101-136): plain Lloyd with
    cdist; equals weighted k-means at unit weights."""
    from flash_vstream_tpu.ops import weighted_kmeans
    T, k, P, D = 20, 4, 2, 5
    x = blobs(rng, T, k, P * D)
    ref_feat, _, ref_idx = lcf.kmeans_feature(
        torch.tensor(x.reshape(T, P, D)), k)
    res = weighted_kmeans(jnp.asarray(x), k, init=jnp.asarray(x[:k]))
    np.testing.assert_allclose(np.asarray(res.centroids),
                               ref_feat.numpy().reshape(k, P * D),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(res.labels), _labels_from_step_indices(ref_idx[0], T))


@pytest.mark.parametrize("fn_name", ["weighted_kmeans_ordered_feature",
                                     "fast_weighted_kmeans_ordered_feature"])
def test_oracle_weighted_kmeans_ordered(qcf, fixed_randperm, rng, fn_name):
    """(fast_)weighted_kmeans_ordered_feature (Qwen
    compress_functions.py:181-385): unique-init k-means, unweighted-mean
    cluster timestamps, temporal re-sort. The `fast_` variant differs only in
    distance formulation, so one JAX op covers both."""
    from flash_vstream_tpu.ops import weighted_kmeans_ordered
    T, k, P, D = 30, 5, 2, 6
    x = blobs(rng, T, k, P * D)
    ref_feat, ref_w, ref_ts, ref_idx = getattr(qcf, fn_name)(
        torch.tensor(x.reshape(T, P, D)), k)
    # the reference inits at unique_X[randperm[:k]]; with the identity perm
    # that is the first k rows of the lexicographically sorted distinct rows
    init = np.unique(x, axis=0)[:k]
    res = weighted_kmeans_ordered(jnp.asarray(x), k, init=jnp.asarray(init))
    np.testing.assert_allclose(np.asarray(res.centroids),
                               ref_feat.float().numpy().reshape(k, P * D),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.cluster_weights),
                               ref_w.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.timestamps),
                               ref_ts.numpy(), rtol=1e-5, atol=1e-5)
    ref_labels = _labels_from_step_indices(ref_idx, T)
    np.testing.assert_array_equal(np.asarray(res.labels), ref_labels)


def test_oracle_torchpca_kmeans_ordered(qcf, fixed_randperm, rng):
    """torchpca_weighted_kmeans_ordered_feature (Qwen
    compress_functions.py:479-577) at pca_dim == D, where projecting onto ALL
    eigh eigenvectors makes the reference's smallest-k column choice and the
    repo's largest-k choice coincide (same full orthogonal basis) — the
    clustering-space rotation is then identical and the oracle is exact."""
    from flash_vstream_tpu.ops import pca_weighted_kmeans_ordered
    T, k, P, D = 30, 4, 2, 5
    x = blobs(rng, T, k, P * D)
    ref_feat, ref_w, ref_ts, ref_idx = qcf.torchpca_weighted_kmeans_ordered_feature(
        torch.tensor(x.reshape(T, P, D)), k, pca_dim=D)
    # At pca_dim == D both projections are full orthogonal rotations, so the
    # clustering geometry is identical; but torch.linalg.eigh and
    # jnp.linalg.eigh may differ in per-column SIGN, which permutes the
    # lexicographic unique order. Replicate the reference's pca_torch to
    # recover WHICH data rows its identity-perm init picked, then seed the
    # JAX op with the same rows in ITS projection space.
    xt = torch.tensor(x.reshape(T * P, D))
    xc = xt - xt.mean(0)
    cov = xc.T @ xc / (xc.shape[0] - 1)
    _, evecs = torch.linalg.eigh(cov)
    ref_proj = (xc @ evecs[:, :D]).numpy().reshape(T, P * D)
    uniq = np.unique(ref_proj, axis=0)[:k]
    init_rows = [int(np.where((ref_proj == u).all(1))[0][0]) for u in uniq]

    from flash_vstream_tpu.ops import pca_project
    proj = np.asarray(pca_project(jnp.asarray(x.reshape(T * P, D)), D))
    proj = proj.reshape(T, P * D)
    from flash_vstream_tpu.ops.kmeans import weighted_kmeans_ordered
    res = weighted_kmeans_ordered(jnp.asarray(proj), k,
                                  init=jnp.asarray(proj[init_rows]))
    # centroid aggregation over the ORIGINAL features per cluster
    onehot = (np.asarray(res.labels)[:, None] == np.arange(k)[None]).astype(
        np.float32)
    agg = (onehot.T @ x) / np.maximum(onehot.sum(0)[:, None], 1.0)
    np.testing.assert_allclose(agg, ref_feat.float().numpy().reshape(k, P * D),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.timestamps), ref_ts.numpy(),
                               rtol=1e-5, atol=1e-5)
    # and the packaged op agrees on the same data
    res2 = pca_weighted_kmeans_ordered(jnp.asarray(x), k, pca_dim=D,
                                       tokens_per_frame=P,
                                       key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(res2.centroids)).all()


def test_pca_eigvec_order_deviation(qcf, rng):
    """Documented deviation: the reference's pca_torch projects onto the
    SMALLEST-eigenvalue eigenvectors (eigh is ascending; it takes [:, :k],
    compress_functions.py:494); the repo takes the largest (correct PCA).
    Demonstrate both facts on shared data."""
    from flash_vstream_tpu.ops import pca_project
    N, D, kdim = 40, 6, 2
    x = rng.normal(size=(N, D)).astype(np.float32)
    x[:, 0] *= 10.0          # dominant variance along axis 0
    xt = torch.tensor(x)
    xc = xt - xt.mean(0)
    cov = xc.T @ xc / (N - 1)
    evals, evecs = torch.linalg.eigh(cov)
    ref_proj = (xc @ evecs[:, :kdim]).numpy()          # reference: smallest
    repo_proj = np.asarray(pca_project(jnp.asarray(x), kdim))
    # reference projection captures the LEAST variance, repo the MOST
    assert repo_proj.var() > 10 * ref_proj.var()
    # repo's projection equals the torch top-k eigenvector projection
    top = (xc @ evecs[:, -kdim:]).numpy()
    np.testing.assert_allclose(np.abs(repo_proj), np.abs(top),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# sequential ops (LLaVA compress_functions.py:20-98, 580-668)
# ---------------------------------------------------------------------------

def test_oracle_merge(lcf, rng):
    from flash_vstream_tpu.ops import merge_frames
    T, t0, P, D = 18, 6, 2, 5
    x = rng.normal(size=(T, P * D)).astype(np.float32)
    ref_feat, ref_sim, _ = lcf.merge_feature(
        torch.tensor(x.reshape(T, P, D)), t0)
    r = merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    np.testing.assert_allclose(np.asarray(r.features),
                               ref_feat.numpy().reshape(t0, P * D),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r.aux)[:t0 - 1], ref_sim.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_oracle_drop(lcf, monkeypatch, rng):
    from flash_vstream_tpu.ops import drop_frames
    T, t0, P, D = 20, 6, 2, 5
    key = jax.random.PRNGKey(3)
    coins = np.asarray(jax.random.bernoulli(key, 0.5, (T - t0,)))
    _replay_coins(monkeypatch, coins)
    x = rng.normal(size=(T, P * D)).astype(np.float32)
    ref_feat, ref_sim, _ = lcf.drop_feature(
        torch.tensor(x.reshape(T, P, D)), t0)
    r = drop_frames(jnp.asarray(x), jnp.int32(T), t0, key)
    np.testing.assert_allclose(np.asarray(r.features),
                               ref_feat.numpy().reshape(t0, P * D),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r.aux)[:t0 - 1], ref_sim.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_oracle_k_drop(lcf, monkeypatch, rng):
    from flash_vstream_tpu.ops import k_drop_frames
    T, t0, P, D = 20, 6, 2, 5
    key = jax.random.PRNGKey(5)
    coins = np.asarray(jax.random.bernoulli(key, 0.5, (T - t0,)))
    _replay_coins(monkeypatch, coins)
    x = rng.normal(size=(T, P * D)).astype(np.float32)
    ref_feat, _, _ = lcf.k_drop_feature(torch.tensor(x.reshape(T, P, D)), t0)
    r = k_drop_frames(jnp.asarray(x), jnp.int32(T), t0, key)
    np.testing.assert_allclose(np.asarray(r.features),
                               ref_feat.numpy().reshape(t0, P * D),
                               rtol=1e-4, atol=1e-4)


def test_oracle_k_merge(lcf, rng):
    from flash_vstream_tpu.ops import k_merge_frames
    T, t0, P, D = 20, 6, 2, 5
    x = rng.normal(size=(T, P * D)).astype(np.float32)
    ref_feat, ref_sim, _ = lcf.k_merge_feature(
        torch.tensor(x.reshape(T, P, D)), t0)
    r = k_merge_frames(jnp.asarray(x), jnp.int32(T), t0)
    np.testing.assert_allclose(np.asarray(r.features),
                               ref_feat.numpy().reshape(t0, P * D),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r.aux), ref_sim.numpy(),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DBSCAN / GMM (Qwen compress_functions.py:671-719)
# ---------------------------------------------------------------------------

def test_oracle_dbscan(qcf, rng):
    """dbscan_feature with sklearn injected (the reference ships the import
    commented out; the function references the global).

    Note the reference's own FlashMemory cannot actually run this method —
    temporal_compress unpacks 4 values but dbscan_feature returns 3
    (model.py:174 vs compress_functions.py:701) — so the oracle is at the
    compress-function level. Cluster slots: sklearn labels clusters in
    first-core-point index order; the repo ranks components by min member
    index — identical on clean blobs. Noise points become singleton clusters
    after the real ones in index order on both sides."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    qcf.DBSCAN = sklearn_cluster.DBSCAN
    D, T0 = 8, 6
    centers = rng.normal(size=(3, D)) * 5.0
    pts = [centers[i] + rng.normal(size=(3, D)) * 0.05 for i in range(3)]
    noise = rng.normal(size=(3, D)) * 50.0
    x = np.concatenate(pts + [noise]).astype(np.float32)     # [12, D]
    T = len(x)
    ref_feat, _, _ = qcf.dbscan_feature(torch.tensor(x[:, None, :]), T0)
    from flash_vstream_tpu.ops.clustering_extra import dbscan_compress
    res = dbscan_compress(jnp.asarray(x), T0)
    assert np.asarray(res.valid).all()
    np.testing.assert_allclose(np.asarray(res.centroids),
                               ref_feat.numpy()[:, 0, :],
                               rtol=1e-5, atol=1e-5)


def test_oracle_gmm_outcome(qcf, rng):
    """gmm_feature with sklearn injected: the EM internals differ (sklearn's
    full-covariance GMM vs the repo's diagonal EM with k-means init), so the
    oracle is at the OUTCOME level — on well-separated blobs both must
    recover the per-blob means."""
    sklearn_decomp = pytest.importorskip("sklearn.decomposition")
    sklearn_mix = pytest.importorskip("sklearn.mixture")
    qcf.PCA = sklearn_decomp.PCA
    qcf.GaussianMixture = sklearn_mix.GaussianMixture
    # T > 32: the reference hardcodes PCA(n_components=32)
    T, k, D = 40, 3, 40
    x = blobs(rng, T, k, D, spread=0.05)
    ref_feat, _, _ = qcf.gmm_feature(torch.tensor(x[:, None, :]), k)
    from flash_vstream_tpu.ops.clustering_extra import gmm_compress
    res = gmm_compress(jnp.asarray(x), k, pca_dim=8)
    ref_sorted = ref_feat.numpy()[:, 0, :]
    repo_sorted = np.asarray(res.centroids)
    ref_sorted = ref_sorted[np.argsort(ref_sorted[:, 0])]
    repo_sorted = repo_sorted[np.argsort(repo_sorted[:, 0])]
    np.testing.assert_allclose(repo_sorted, ref_sorted, rtol=5e-2, atol=5e-2)


# ---------------------------------------------------------------------------
# NTM (vstream_arch.py:34-65, 174-183; attention_feature :263-277)
# ---------------------------------------------------------------------------

def _ntm_params_from_torch(m):
    from flash_vstream_tpu.ops.ntm import NTMParams
    t2j = lambda t: jnp.asarray(t.detach().numpy())
    return NTMParams(
        wq=t2j(m.q_proj.weight.T), bq=t2j(m.q_proj.bias),
        wk=t2j(m.k_proj.weight.T), bk=t2j(m.k_proj.bias),
        wv=t2j(m.v_proj.weight.T), bv=t2j(m.v_proj.bias),
        wo=t2j(m.out_proj.weight.T), bo=t2j(m.out_proj.bias),
        ln_scale=t2j(m.out_ln.weight), ln_bias=t2j(m.out_ln.bias))


def _ntm_stub(varch, m):
    return types.SimpleNamespace(
        get_model=lambda: types.SimpleNamespace(attention_model=m))


def test_oracle_ntm_update(varch, rng):
    """The NTM write rule (vstream_arch.py:174-183) with real module weights."""
    from flash_vstream_tpu.ops.ntm import ntm_update
    D, H = 16, 8
    torch.manual_seed(0)
    m = varch.NeuralTuringMachine(D, H).eval()
    stub = _ntm_stub(varch, m)
    mem = rng.normal(size=(12, D)).astype(np.float32)
    new = rng.normal(size=(8, D)).astype(np.float32)
    with torch.no_grad():
        ref = varch.VStreamMetaForCausalLM.attention(
            stub, torch.tensor(mem), torch.tensor(new), update_ratio=0.3)
    out = ntm_update(_ntm_params_from_torch(m), jnp.asarray(mem),
                     jnp.asarray(new), update_ratio=0.3)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_oracle_ntm_compress_chunked(varch, lcf, rng):
    """attention_feature's chunked fold (compress_functions.py:263-277),
    including a ragged final chunk."""
    from flash_vstream_tpu.ops.ntm import ntm_compress
    D, H, P, t0, T = 12, 8, 2, 4, 15        # chunks: 4, 4, 3 (ragged)
    torch.manual_seed(1)
    m = varch.NeuralTuringMachine(D, H).eval()
    stub = _ntm_stub(varch, m)
    attention_fn = functools.partial(varch.VStreamMetaForCausalLM.attention,
                                     stub)
    x = rng.normal(size=(T, P, D)).astype(np.float32)
    with torch.no_grad():
        ref_feat, _ = lcf.attention_feature(torch.tensor(x), t0,
                                            attention_fn, update_ratio=0.2)
    out = ntm_compress(_ntm_params_from_torch(m), jnp.asarray(x),
                       jnp.int32(T), t0, P, 0.2)
    np.testing.assert_allclose(np.asarray(out), ref_feat.numpy(),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# spatial pooling (vstream_arch.py:193-212)
# ---------------------------------------------------------------------------

def test_oracle_spatial_pool(varch, rng):
    from flash_vstream_tpu.ops.pooling import spatial_pool
    stub = types.SimpleNamespace(
        config=types.SimpleNamespace(compress_type="mean"))
    x = rng.normal(size=(5, 64, 12)).astype(np.float32)    # 8x8 patch grid
    for size in (1, 2, 4, 8):
        ref = varch.VStreamMetaForCausalLM.compress_spatial_features(
            stub, torch.tensor(x), size)
        out = spatial_pool(jnp.asarray(x), size)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"compress_size={size}")


# ---------------------------------------------------------------------------
# STAR assembly (vstream_arch.py:214-277)
# ---------------------------------------------------------------------------

def _star_stub_class(varch):
    class _StarStub:
        attention = varch.VStreamMetaForCausalLM.attention
        compress_spatial_features = (
            varch.VStreamMetaForCausalLM.compress_spatial_features)
        compress_temporal_features = (
            varch.VStreamMetaForCausalLM.compress_temporal_features)

        def __init__(self, config, model):
            self.config = config
            self._model = model

        def get_model(self):
            return self._model
    return _StarStub


def test_oracle_star_assembly(varch, fixed_randperm, monkeypatch, rng):
    """compress_temporal_features end-to-end: Turing(NTM) + long(kmeans) +
    key(retrieved) + cur sections, asserted section by section against
    star_consolidate. The key section asserts BOTH sides of the documented
    retrieval-indexing deviation (vstream_arch.py:262)."""
    from flash_vstream_tpu.core.config import STARConfig
    from flash_vstream_tpu.models.star_memory import star_consolidate
    import flash_vstream_tpu.ops.kmeans as kmeans_mod

    L, Lt, c, keyl = 4, 3, 1, 3
    cur_size, long_size, tur_size = 4, 2, 1
    T, D, H = 12, 6, 8
    P = cur_size ** 2

    torch.manual_seed(2)
    m = varch.NeuralTuringMachine(D, H).eval()
    cfgns = types.SimpleNamespace(
        compress_type="mean", video_sample_type="weighted_kmeans",
        video_long_memory_length=L, video_Turing_memory_length=Lt,
        video_short_memory_length=L, video_current_memory_length=c,
        compress_long_memory_size=long_size,
        compress_Turing_memory_size=tur_size,
        compress_Turing_update_ratio=0.2, video_max_frames=T)
    stub = _star_stub_class(varch)(
        cfgns, types.SimpleNamespace(attention_model=m))

    # frame features: well-separated in the LONG-POOLED space so the k-means
    # oracle is exact (blobs at pooled granularity, lifted to full res);
    # distinct HISTORY cluster sizes so the weight argsort is unambiguous
    assign = np.concatenate([distinct_size_assign(T - c, L), [0] * c])
    # spread 0.1: within-blob frame distances (~1e-2 in dist^2) must dominate
    # the f32 cancellation noise of the matmul-form distance (~4e-5), or the
    # nearest-frame argmin ties flip between numpy and the JAX op
    pooled_blobs = blobs(rng, T, L, long_size ** 2 * D, spread=0.1,
                         assign=assign)
    x = np.repeat(pooled_blobs.reshape(T, long_size ** 2, D),
                  P // long_size ** 2, axis=1).astype(np.float32)
    x += rng.normal(size=x.shape).astype(np.float32) * 1e-3

    with torch.no_grad():
        ref_list = stub.compress_temporal_features(
            [torch.tensor(x)])
    ref_tokens = ref_list[0].numpy()      # [Turing*1 + L*4 + (key+cur)*16, D]

    # repo side: same init (first L rows of the pooled history)
    hist_pooled = np.asarray(
        spatial_pool_np(x[:T - c], long_size)).reshape(T - c, -1)
    monkeypatch.setattr(
        kmeans_mod, "init_centroids",
        lambda xx, k, valid, key: jnp.asarray(hist_pooled[:k]))
    cfg = STARConfig(current_length=c, current_size=cur_size,
                     long_length=L, long_size=long_size,
                     turing_length=Lt, turing_size=tur_size,
                     key_length=keyl, compress_type="weighted_kmeans",
                     video_max_frames=T, max_frames_static=T)
    mem = star_consolidate(_ntm_params_from_torch(m), cfg, jnp.asarray(x),
                           jnp.int32(T), jax.random.PRNGKey(0))
    repo_tokens = np.asarray(mem.tokens)
    assert np.asarray(mem.valid).all()

    n_tur = Lt * tur_size ** 2
    n_long = L * long_size ** 2
    n_key = keyl * P
    # --- Turing and long sections match exactly ---
    np.testing.assert_allclose(repo_tokens[:n_tur], ref_tokens[:n_tur],
                               rtol=5e-5, atol=5e-5, err_msg="Turing section")
    np.testing.assert_allclose(repo_tokens[n_tur:n_tur + n_long],
                               ref_tokens[n_tur:n_tur + n_long],
                               rtol=2e-4, atol=2e-4, err_msg="long section")
    # --- current section (last c frames) ---
    np.testing.assert_allclose(repo_tokens[n_tur + n_long + n_key:],
                               ref_tokens[n_tur + n_long + n_key:],
                               rtol=1e-5, atol=1e-6, err_msg="cur section")

    # --- key section: demonstrate the documented deviation ---
    # recompute the shared clustering facts
    from flash_vstream_tpu.ops.kmeans import weighted_kmeans
    hist = x[:T - c]
    res = weighted_kmeans(jnp.asarray(hist_pooled), L,
                          init=jnp.asarray(hist_pooled[:L]))
    weights = np.asarray(res.cluster_weights)
    centroids = np.asarray(res.centroids)
    sorted_ids = np.argsort(-weights, kind="stable")
    # reference QUIRK: queries are FRAMES indexed by weight-sorted cluster ids
    quirk_q = hist_pooled[sorted_ids[:keyl]]
    d = ((hist_pooled[:, None] - quirk_q[None]) ** 2).sum(-1) ** 0.5
    quirk_idx = d.argmin(0)
    np.testing.assert_allclose(
        ref_tokens[n_tur + n_long:n_tur + n_long + n_key],
        x[quirk_idx].reshape(-1, D), rtol=1e-5, atol=1e-6,
        err_msg="reference key section != documented quirk")
    # repo INTENT: queries are the heaviest cluster CENTROIDS
    intent_q = centroids[sorted_ids[:keyl]]
    d2 = ((hist_pooled[:, None] - intent_q[None]) ** 2).sum(-1)
    intent_idx = d2.argmin(0)
    np.testing.assert_allclose(
        repo_tokens[n_tur + n_long:n_tur + n_long + n_key],
        x[intent_idx].reshape(-1, D), rtol=1e-5, atol=1e-6,
        err_msg="repo key section != documented intent")


def spatial_pool_np(x, out_size):
    """Host mirror of spatial_pool for building test inits."""
    from flash_vstream_tpu.ops.pooling import spatial_pool
    return np.asarray(spatial_pool(jnp.asarray(x), out_size))


# ---------------------------------------------------------------------------
# FlashMemory (Qwen vstream_qwen2vl_model.py:79-323)
# ---------------------------------------------------------------------------

def _fm(qmodel, temporal_length, spatial_length, **kw):
    return qmodel.FlashMemory(
        flash_memory_temporal_length=temporal_length,
        flash_memory_spatial_length=spatial_length, **kw)


def test_oracle_temporal_pool(qmodel, rng):
    from flash_vstream_tpu.ops.pooling import qwen_temporal_pool
    t, h, w = 3, 8, 12
    xdim = 3 * 2 * 14 * 14
    x = rng.normal(size=(t * h * w, xdim)).astype(np.float32)
    fm = _fm(qmodel, 120, 60)
    with torch.no_grad():
        ref, ref_thw = fm.temporal_pool(torch.tensor(x),
                                        torch.tensor([t, h, w]))
    out, out_grid = qwen_temporal_pool(jnp.asarray(x), (t, h, w))
    assert out_grid == tuple(ref_thw.numpy().tolist())
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_oracle_flash_consolidate(qmodel, fixed_randperm, monkeypatch, rng):
    """temporal_compress + spatial_enhance + cat_spa_tem against
    flash_consolidate + cat_spa_tem on one video (t > both budgets)."""
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import (cat_spa_tem,
                                                       flash_consolidate)
    import flash_vstream_tpu.ops.kmeans as kmeans_mod

    K, S = 4, 2                       # csm_grid_len, dam_grid_len
    t, h, w = 10, 4, 4                # small grid (t, h, w): P_small = h*w
    sh, sw = 8, 8                     # full grid: P_full = sh*sw
    D = 6
    P_small, P_full = h * w, sh * sw

    # cluster structure in the SMALL stream (clustering space); distinct
    # cluster sizes make the weight argsort unambiguous; spread 0.1 keeps
    # within-blob nearest-frame margins above f32 matmul-distance noise
    small = blobs(rng, t, K, P_small * D, spread=0.1,
                  assign=distinct_size_assign(t, K)).reshape(t, P_small, D)
    full = rng.normal(size=(t, P_full, D)).astype(np.float32)

    fm = _fm(qmodel, 2 * K, 2 * S)
    with torch.no_grad():
        tem_x, tem_thw, tem_w, tem_ts, tem_idx = fm.temporal_compress(
            torch.tensor(small.reshape(t * P_small, D)),
            torch.tensor([t, h, w]), K)
        tem_pos = tem_ts.round().long()
        spa_x, spa_thw, spa_pos = fm.spatial_enhance(
            x=torch.tensor(full.reshape(t * P_full, D)),
            small_x=torch.tensor(small.reshape(t * P_small, D)),
            thw=torch.tensor([t, sh, sw]),
            tem_x=tem_x, tem_thw=tem_thw, tem_weights=tem_w,
            tem_positions=tem_pos, tem_indices=tem_idx)
        ref_cat = fm.cat_spa_tem(spa_x=spa_x, tem_x=tem_x)

    # repo: same init via the unique shim
    flat = small.reshape(t, P_small * D)
    init = np.unique(flat.astype(np.float32), axis=0)[:K]
    monkeypatch.setattr(kmeans_mod, "init_centroids",
                        lambda xx, k, valid, key: jnp.asarray(init))
    cfg = FlashMemoryConfig(temporal_length=2 * K, spatial_length=2 * S)
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(out.tem_x).reshape(-1, D), tem_x.numpy(),
        rtol=2e-4, atol=2e-4, err_msg="CSM memory")
    np.testing.assert_allclose(np.asarray(out.tem_weights), tem_w.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out.tem_positions),
                                  tem_pos.numpy())
    np.testing.assert_array_equal(np.asarray(out.spa_positions),
                                  spa_pos.numpy())
    np.testing.assert_allclose(
        np.asarray(out.spa_x).reshape(-1, D), spa_x.numpy().reshape(-1, D),
        rtol=1e-5, atol=1e-6, err_msg="DAM memory")
    repo_cat = cat_spa_tem(out.spa_x, out.tem_x)
    np.testing.assert_allclose(np.asarray(repo_cat), ref_cat.numpy(),
                               rtol=2e-4, atol=2e-4, err_msg="cat_spa_tem")


def test_oracle_flash_short_video_passthrough(qmodel, rng):
    """t <= budgets: both sides pass frames through with unit weights
    (model.py:149-150, 214-216)."""
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import flash_consolidate
    t, h, w, D = 3, 4, 4, 5
    sh, sw = 8, 8
    P_small, P_full = h * w, sh * sw
    small = rng.normal(size=(t, P_small, D)).astype(np.float32)
    full = rng.normal(size=(t, P_full, D)).astype(np.float32)
    fm = _fm(qmodel, 120, 60)
    with torch.no_grad():
        tem_x, _, tem_w, tem_ts, _ = fm.temporal_compress(
            torch.tensor(small.reshape(t * P_small, D)),
            torch.tensor([t, h, w]), fm.temporal_length)
        spa_x, _, spa_pos = fm.spatial_enhance(
            x=torch.tensor(full.reshape(t * P_full, D)),
            small_x=torch.tensor(small.reshape(t * P_small, D)),
            thw=torch.tensor([t, sh, sw]),
            tem_x=tem_x, tem_thw=torch.tensor([t, h, w]),
            tem_weights=tem_w, tem_positions=tem_ts.round().long(),
            tem_indices=None)
    cfg = FlashMemoryConfig()
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out.tem_x).reshape(-1, D),
                               tem_x.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.tem_weights), tem_w.numpy())
    np.testing.assert_allclose(np.asarray(out.spa_x).reshape(-1, D),
                               spa_x.numpy().reshape(-1, D),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(out.spa_positions),
                                  spa_pos.numpy())


# ---------------------------------------------------------------------------
# AM-RoPE + get_rope_index (vstream_qwen2vl_model.py:254-277, 778-939)
# ---------------------------------------------------------------------------

def test_oracle_calc_am_rope(qmodel, rng):
    """calc_am_rope's position rewrite vs am_rope_visual_positions +
    qwen_rope_positions."""
    from flash_vstream_tpu.models.flash_memory import (
        am_rope_visual_positions, qwen_rope_positions)
    # spa grid (2 frames, 8x8 pre-merge), tem grid (3 clusters, 4x4 pre-merge)
    spa_t, sh, sw = 2, 8, 8
    tem_t, th, tw = 3, 4, 4
    spa_positions = np.array([1, 5], np.int64)
    tem_positions = np.array([0, 4, 7], np.int64)
    n_vis = spa_t * (sh // 2) * (sw // 2) + tem_t * (th // 2) * (tw // 2)
    start, tail = 7, 5
    S = start + n_vis + tail

    pos0 = np.broadcast_to(np.arange(S), (3, S)).copy()
    vis_pos_id = np.full((S,), -1, np.int64)
    vis_pos_id[start:start + n_vis] = np.arange(n_vis)
    fm = _fm(qmodel, 120, 60)
    with torch.no_grad():
        ref = fm.calc_am_rope(
            torch.tensor(pos0.copy()), torch.tensor(vis_pos_id),
            tem_thw=torch.tensor([tem_t, th, tw]),
            tem_positions=torch.tensor(tem_positions),
            spa_thw=torch.tensor([spa_t, sh, sw]),
            spa_positions=torch.tensor(spa_positions))
    vis = am_rope_visual_positions(jnp.asarray(spa_positions),
                                   jnp.asarray(tem_positions),
                                   (sh, sw), (th, tw))
    # calc_am_rope only rewrites the visual block (the tail keeps its original
    # 1D ids there; get_rope_index sets the tail, tested below)
    ref_np = ref.numpy()
    np.testing.assert_array_equal(np.asarray(vis) + start,
                                  ref_np[:, start:start + n_vis])
    # qwen_rope_positions agrees on pre-video text and the visual block
    ids = np.zeros(S, np.int64)
    pos, _ = qwen_rope_positions(ids, (start, n_vis), np.asarray(vis))
    np.testing.assert_array_equal(pos[:, :start + n_vis],
                                  ref_np[:, :start + n_vis])


def test_oracle_get_rope_index_single_video(qmodel):
    """get_rope_index (vstream_qwen2vl_model.py:778-939) for text|video|text
    vs the host mirror qwen_rope_positions.

    Note: grid-compression semantics — the visual span in LLM space is
    DAM + CSM sized via get_(spatial_)real_grid_thw; AM-RoPE then rewrites
    the block ids at FlashMemory time. get_rope_index itself assigns the
    pre-rewrite arange block; the mirrors must agree on text positions and
    rope_delta (visual ids are rewritten later on both sides)."""
    from flash_vstream_tpu.core.config import FlashMemoryConfig, VStreamQwenConfig
    from flash_vstream_tpu.core.config import LLMConfig, QWEN2_VL_VIT
    from flash_vstream_tpu.models.flash_memory import qwen_rope_positions
    from flash_vstream_tpu.models.vstream_qwen import (csm_grid, dam_grid,
                                                       visual_token_count)

    fmc = dict(flash_memory_temporal_length=8, flash_memory_temporal_method="kmeans_ordered",
               flash_memory_temporal_poolsize=2, flash_memory_temporal_pca_dim=32,
               flash_memory_spatial_length=4, flash_memory_spatial_method="klarge_retrieve")
    VID, IMG, VSTART = 263, 258, 261
    stub = types.SimpleNamespace(config=types.SimpleNamespace(
        vision_config=types.SimpleNamespace(spatial_merge_size=2,
                                            flash_memory_config=fmc),
        image_token_id=IMG, video_token_id=VID, vision_start_token_id=VSTART))

    cfg = VStreamQwenConfig(
        vit=QWEN2_VL_VIT,
        llm=LLMConfig(vocab_size=512, hidden_size=32, intermediate_size=64,
                      num_layers=1, num_heads=4, num_kv_heads=2,
                      mrope_sections=(2, 3, 3)),
        flash_memory=FlashMemoryConfig(temporal_length=8, spatial_length=4),
        image_token_id=IMG, video_token_id=VID, vision_start_token_id=VSTART)

    t, h, w = 6, 8, 8
    n_dam, n_csm = visual_token_count(cfg, t, h, w)
    n_vis = n_dam + n_csm
    pre, tail = 5, 7
    ids = np.concatenate([
        np.full(pre - 1, 10), [VSTART], np.full(n_vis, VID),
        np.full(tail, 11)]).astype(np.int64)
    with torch.no_grad():
        ref_pos, ref_delta = qmodel.FlashVStreamQwen2VLModel.get_rope_index(
            stub, torch.tensor(ids[None]),
            video_grid_thw=torch.tensor([[t, h, w]]),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.long))
    ref_pos = ref_pos.numpy()[:, 0]

    # host mirror with the same pre-rewrite arange visual block
    dt, dh, dw = dam_grid(cfg, t, h, w)
    ct, ch, cw = csm_grid(cfg, t, h, w)

    def mm_index(tt, hh, ww):
        gh, gw = hh // 2, ww // 2
        ti = np.repeat(np.arange(tt), gh * gw)
        hi = np.tile(np.repeat(np.arange(gh), gw), tt)
        wi = np.tile(np.arange(gw), tt * gh)
        return np.stack([ti, hi, wi])

    spa = mm_index(dt, dh, dw)
    tem = mm_index(ct, ch, cw) + spa.shape[1]
    vis = np.concatenate([spa, tem], axis=1)
    pos, delta = qwen_rope_positions(ids, (pre, n_vis), vis)
    np.testing.assert_array_equal(pos, ref_pos)
    assert delta == int(ref_delta[0, 0])


# ---------------------------------------------------------------------------
# Qwen temporal-method registry completeness
# (vstream_qwen2vl_model.py:161-176; VERDICT r4 Missing #2)
# ---------------------------------------------------------------------------

def test_reference_registry_entries_are_broken(qmodel, rng):
    """DOCUMENTED DEVIATION: the reference's own method_dic entries for
    'merge', 'drop', 'kmeans', 'dbscan' and 'gmm' return 3-tuples into the
    4-way unpack at vstream_qwen2vl_model.py:177 (ValueError), and
    'attention' is partial(attention_feature, attention_fn=None), which
    calls None (TypeError). The repo DEFINES working semantics for all of
    them (flash_memory.py); this test pins the reference-side breakage so
    the deviation list stays honest."""
    t, h, w, D = 10, 4, 4, 1280 // 16  # P_small tokens of width D
    # temporal_compress expects [t*h/2*w/2*4, xdim]; use the real call shape
    x = torch.tensor(rng.normal(size=(t * (h // 2) * (w // 2) * 4,
                                      80)).astype(np.float32))
    for method, exc in [("merge", ValueError), ("drop", ValueError),
                        ("kmeans", ValueError), ("attention", TypeError)]:
        fm = _fm(qmodel, 8, 4, flash_memory_temporal_method=method)
        with pytest.raises(exc):
            with torch.no_grad():
                fm.temporal_compress(x, torch.tensor([t, h, w]), 4)


def test_oracle_registry_merge_consolidate(qcf, rng):
    """flash_consolidate(temporal_method='merge'): features match the
    reference merge_feature called directly (the working core the broken
    registry entry wraps), and the repo-defined (weights, timestamps) equal
    member counts / member-time means derived from the reference's own
    step_indices provenance."""
    import dataclasses
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import flash_consolidate
    t, K, S, P_small, P_full, D = 12, 4, 2, 3, 6, 5
    small = rng.normal(size=(t, P_small, D)).astype(np.float32)
    full = rng.normal(size=(t, P_full, D)).astype(np.float32)
    with torch.no_grad():
        ref_feat, _, ref_idx = qcf.merge_feature(torch.tensor(small), K)
    members = ref_idx[-1]                       # final membership lists
    exp_w = np.array([len(m) for m in members], np.float32)
    exp_t = np.array([np.mean(m) for m in members], np.float32)

    cfg = FlashMemoryConfig(temporal_length=2 * K, spatial_length=2 * S,
                            temporal_method="merge")
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out.tem_x), ref_feat.numpy().reshape(K, P_small, D),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tem_weights), exp_w,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.tem_positions), np.round(exp_t), atol=0)


def test_oracle_registry_drop_consolidate(qcf, monkeypatch, rng):
    """flash_consolidate(temporal_method='drop'): features match the
    reference drop_feature (coins replayed); repo-defined weights are 1 and
    timestamps are the surviving frames' own indices."""
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import flash_consolidate
    t, K, S, P_small, P_full, D = 14, 4, 2, 3, 6, 5
    key = jax.random.PRNGKey(0)
    coins = np.asarray(jax.random.bernoulli(key, 0.5, (t - K,)))
    _replay_coins(monkeypatch, coins)
    small = rng.normal(size=(t, P_small, D)).astype(np.float32)
    full = rng.normal(size=(t, P_full, D)).astype(np.float32)
    with torch.no_grad():
        ref_feat, _, ref_idx = qcf.drop_feature(torch.tensor(small), K)
    survivors = np.array([m[0] for m in ref_idx[-1]], np.int64)

    cfg = FlashMemoryConfig(temporal_length=2 * K, spatial_length=2 * S,
                            temporal_method="drop")
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=key)
    np.testing.assert_allclose(
        np.asarray(out.tem_x), ref_feat.numpy().reshape(K, P_small, D),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tem_weights), np.ones(K),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out.tem_positions), survivors)


def test_oracle_registry_pca_consolidate(qcf, qmodel, fixed_randperm,
                                         monkeypatch, rng):
    """flash_consolidate(temporal_method='pca_kmeans_ordered') now routes
    through actual PCA-space clustering (r5 fix: it previously collapsed to
    plain ordered k-means). Oracle: the reference registry's WORKING
    pca entry via temporal_compress, with matched init."""
    import flash_vstream_tpu.ops.kmeans as kmeans_mod
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import flash_consolidate
    t, h, w = 12, 4, 4               # small grid -> P_small = (h/2)(w/2)*4
    K, S, D = 4, 2, 32               # D = the reference's HARDCODED pca_dim
    P_small = (h // 2) * (w // 2) * 4
    small = blobs(rng, t, K, P_small * D, spread=0.05,
                  assign=distinct_size_assign(t, K)).reshape(t, P_small, D)
    full = rng.normal(size=(t, 4 * P_small, D)).astype(np.float32)
    # the reference hardcodes pca_dim=32 (compress_functions.py:440) and
    # ships the sklearn import commented out — inject it, and pick D=32 so
    # the projection is full-rank (a rotation; sign-flips between sklearn's
    # SVD and our eigh preserve every distance the k-means sees)
    pca_dim = D
    sk_decomp = pytest.importorskip("sklearn.decomposition")

    class CPCA(sk_decomp.PCA):
        # at FULL rank sklearn's fit_transform returns an F-ordered array,
        # which torch.tensor keeps non-contiguous and the reference's
        # .view(T, -1) rejects (compress_functions.py:446) — an artifact of
        # this test's full-rank shape only (real-scale 32-of-1280 output is
        # C-ordered); marshal to C order so the oracle's math can run
        def fit_transform(self, X, y=None):
            return np.ascontiguousarray(super().fit_transform(X, y))

    qcf.PCA = CPCA
    # the FlashMemory under qmodel binds its OWN compress_functions module
    # instance — inject there too
    sys.modules["ref_qwen_models.compress_functions"].PCA = CPCA
    fm = _fm(qmodel, 2 * K, 2 * S,
             flash_memory_temporal_method="pca_kmeans_ordered",
             flash_memory_temporal_pca_dim=pca_dim)
    with torch.no_grad():
        tem_x, tem_thw, tem_w, tem_ts, _ = fm.temporal_compress(
            torch.tensor(small.reshape(t * P_small, D)),
            torch.tensor([t, h, w]), K)

    # seed the repo op with the same data rows the identity-perm init picked
    # (recover WHICH frames the reference's unique-init chose in ITS space)
    ref_proj = sk_decomp.PCA(n_components=pca_dim).fit_transform(
        small.reshape(t * P_small, D)).reshape(t, P_small * pca_dim)
    uniq = np.unique(ref_proj.astype(np.float32), axis=0)[:K]
    init_rows = [int(np.where((ref_proj.astype(np.float32) == u).all(1))[0][0])
                 for u in uniq]

    from flash_vstream_tpu.ops import pca_project
    proj = np.asarray(pca_project(
        jnp.asarray(small.reshape(t * P_small, D)), pca_dim))
    proj = proj.reshape(t, P_small * pca_dim)
    real_init = jnp.asarray(proj[init_rows])
    orig_wko = kmeans_mod.weighted_kmeans_ordered

    def seeded(xx, k, **kw):
        kw["init"] = real_init
        kw.pop("key", None)
        return orig_wko(xx, k, **kw)

    monkeypatch.setattr(kmeans_mod, "weighted_kmeans_ordered", seeded)
    cfg = FlashMemoryConfig(temporal_length=2 * K, spatial_length=2 * S,
                            temporal_method="pca_kmeans_ordered",
                            temporal_pca_dim=pca_dim)
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out.tem_x).reshape(K, P_small * D),
        tem_x.float().numpy().reshape(K, P_small * D), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.tem_weights), tem_w.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.tem_positions),
                               tem_ts.round().numpy(), atol=0)


def test_registry_attention_defined_behavior(qcf, rng):
    """(a) the reference attention entry crashes with attention_fn=None;
    (b) the repo's defined semantics — parameter-free NTM blend with
    update_ratio 0.2 — match an independent numpy mirror."""
    from flash_vstream_tpu.core.config import FlashMemoryConfig
    from flash_vstream_tpu.models.flash_memory import flash_consolidate
    t, K, S, P_small, P_full, D = 11, 4, 2, 3, 6, 5
    small = rng.normal(size=(t, P_small, D)).astype(np.float32)
    full = rng.normal(size=(t, P_full, D)).astype(np.float32)
    with pytest.raises(TypeError):
        qcf.attention_feature(torch.tensor(small), K, attention_fn=None)

    # numpy mirror: memory = first K frames' tokens; fold chunks of K frames
    mem = small[:K].reshape(K * P_small, D).astype(np.float64)
    r = 0.2
    for i in range(K, t, K):
        chunk = small[i:i + K].reshape(-1, D).astype(np.float64)
        s = mem @ chunk.T / np.sqrt(D)
        a = np.exp(s - s.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        mem = (1 - r) * mem + r * (a @ chunk)

    cfg = FlashMemoryConfig(temporal_length=2 * K, spatial_length=2 * S,
                            temporal_method="attention")
    out = flash_consolidate(cfg, jnp.asarray(full), jnp.asarray(small),
                            key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(out.tem_x).reshape(K * P_small, D), mem,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.tem_positions),
                                  np.arange(K))
