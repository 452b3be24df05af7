import numpy as np

from flash_vstream_tpu.ops import (
    cosine_similarity,
    cosine_similarity_matrix,
    euclidean_distance,
    sq_euclidean_distance,
)


def test_sq_euclidean(rng):
    a = rng.normal(size=(7, 13)).astype(np.float32)
    b = rng.normal(size=(5, 13)).astype(np.float32)
    want = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    got = np.asarray(sq_euclidean_distance(a, b))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    got_d = np.asarray(euclidean_distance(a, b))
    np.testing.assert_allclose(got_d, np.sqrt(want), rtol=1e-3, atol=1e-3)


def test_cosine_matrix(rng):
    a = rng.normal(size=(4, 9)).astype(np.float32)
    b = rng.normal(size=(6, 9)).astype(np.float32)
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(cosine_similarity_matrix(a, b)), an @ bn.T, rtol=1e-5, atol=1e-5)


def test_cosine_rowwise(rng):
    a = rng.normal(size=(8, 5)).astype(np.float32)
    b = rng.normal(size=(8, 5)).astype(np.float32)
    want = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
    np.testing.assert_allclose(np.asarray(cosine_similarity(a, b)), want,
                               rtol=1e-5, atol=1e-5)
