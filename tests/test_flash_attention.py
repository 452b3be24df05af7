"""Tests for the fused attention wrapper (XLA reference path on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.kernels.flash_attention import (
    flash_attention,
    segment_ids_from_lengths,
    xla_attention,
)


def naive_attention(q, k, v, causal=False, q_seg=None, kv_seg=None, q_offset=0):
    B, H, Sq, D = q.shape
    Hkv = k.shape[1]
    g = H // Hkv
    out = np.zeros_like(q, dtype=np.float64)
    for b in range(B):
        for h in range(H):
            kk, vv = k[b, h // g].astype(np.float64), v[b, h // g].astype(np.float64)
            s = q[b, h].astype(np.float64) @ kk.T / np.sqrt(D)
            mask = np.ones((Sq, kk.shape[0]), bool)
            if causal:
                qi = np.arange(Sq)[:, None] + q_offset
                mask &= qi >= np.arange(kk.shape[0])[None, :]
            if q_seg is not None:
                mask &= q_seg[b][:, None] == kv_seg[b][None, :]
                mask &= kv_seg[b][None, :] >= 0
            s = np.where(mask, s, -1e30)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            p = np.where(mask.any(-1, keepdims=True), p, 0.0)
            out[b, h] = p @ vv
    return out


def test_xla_attention_causal(rng):
    B, H, S, D = 2, 4, 10, 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    got = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    want = naive_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_xla_attention_gqa(rng):
    B, Hq, Hkv, S, D = 1, 8, 2, 12, 16
    q = rng.normal(size=(B, Hq, S, D)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, S, D)).astype(np.float32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    want = naive_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_xla_attention_segments(rng):
    """Varlen via segment ids: tokens only attend within their sequence."""
    B, H, S, D = 1, 2, 12, 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    seg = np.array([[0, 0, 0, 0, 1, 1, 1, 2, 2, -1, -1, -1]], np.int32)
    got = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     q_segment_ids=jnp.asarray(seg),
                                     kv_segment_ids=jnp.asarray(seg)))
    want = naive_attention(q, k, v, q_seg=seg, kv_seg=seg)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # block-diagonality: output for segment 0 must not depend on segment 1
    v2 = v.copy()
    v2[:, :, 4:9] = 99.0
    got2 = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v2),
                                      q_segment_ids=jnp.asarray(seg),
                                      kv_segment_ids=jnp.asarray(seg)))
    np.testing.assert_allclose(got2[:, :, :4], got[:, :, :4], rtol=1e-5)


def test_q_offset_matches_full_causal(rng):
    """Decode-style attention (1 query vs KV prefix) == slice of full causal."""
    B, H, S, D = 1, 2, 9, 8
    q = rng.normal(size=(B, H, S, D)).astype(np.float32)
    k = rng.normal(size=(B, H, S, D)).astype(np.float32)
    v = rng.normal(size=(B, H, S, D)).astype(np.float32)
    full = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
    last = np.asarray(flash_attention(jnp.asarray(q[:, :, -1:]), jnp.asarray(k),
                                      jnp.asarray(v), causal=True, q_offset=S - 1))
    np.testing.assert_allclose(last[:, :, 0], full[:, :, -1], rtol=1e-5, atol=1e-5)


def test_segment_ids_from_lengths():
    seg = np.asarray(segment_ids_from_lengths(jnp.asarray([3, 2, 4]), 12))
    np.testing.assert_array_equal(seg, [0, 0, 0, 1, 1, 2, 2, 2, 2, -1, -1, -1])


def test_grad_flows(rng):
    B, H, S, D = 1, 2, 6, 4
    q = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, S, D)).astype(np.float32))
    f = lambda q, k, v: jnp.sum(flash_attention(q, k, v, causal=True) ** 2)
    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert float(jnp.abs(gi).max()) > 0


def test_pallas_backward_interpret_matches_xla_grads(rng):
    """The fused bwd kernels (incl. in-kernel GQA group accumulation) vs
    jax.grad of the XLA reference, run in Pallas interpret mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    from flash_vstream_tpu.kernels.flash_attention import (
        _pallas_flash, _pallas_flash_bwd)

    B, Hq, Hkv, S, D = 1, 4, 2, 256, 128
    q = jnp.asarray(rng.normal(size=(B, Hq, S, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    def ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v, causal=True, scale=scale) ** 2)

    want = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)

    with pltpu.force_tpu_interpret_mode():
        out, lse = _pallas_flash(q, k, v, None, None, causal=True,
                                 scale=scale, block_q=128, block_kv=128,
                                 save_stats=True)
        g = 2.0 * out
        got = _pallas_flash_bwd(q, k, v, out, g, lse, None, None,
                                causal=True, scale=scale,
                                block_q=128, block_kv=128)
    for name, a, b in zip("dq dk dv".split(), got, want):
        ref_max = float(jnp.abs(b).max())
        err = float(jnp.abs(a - b).max()) / ref_max
        assert err < 5e-2, (name, err)
