"""Ring attention / sequence parallelism (parallel/sequence.py) on the
virtual CPU mesh: exactness vs full attention and grad equality (the
transpose of the kv rotation is the reverse ring — autodiff backward)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.kernels.flash_attention import xla_attention
from flash_vstream_tpu.models.llm import (
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.parallel.sequence import (
    create_sp_mesh,
    ring_attention_local,
    sp_decoder_forward,
)

CFG = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2)


def _ring_full(q, k, v, mesh, seg=None, causal=True):
    n = mesh.shape["sp"]
    seg_args = (seg,) if seg is not None else ()

    def run(q, k, v, *s):
        return ring_attention_local(
            q, k, v, axis="sp", n_sp=n, causal=causal,
            q_segment_ids=s[0] if s else None,
            kv_segment_ids=s[0] if s else None)

    return jax.shard_map(
        run, mesh=mesh,
        in_specs=(P(None, None, "sp"),) * 3 + ((P(None, "sp"),) if seg
                                               is not None else ()),
        out_specs=P(None, None, "sp"), check_vma=False)(q, k, v, *seg_args)


def test_ring_attention_matches_full():
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 4, 64, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    mesh = create_sp_mesh(sp=4)
    want = xla_attention(q, k, v, causal=True)
    got = _ring_full(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_segments_and_padding():
    rng = np.random.default_rng(1)
    B, H, S, D = 1, 2, 32, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
               for _ in range(3))
    # two docs then padding
    seg = jnp.asarray([[0] * 12 + [1] * 12 + [-1] * 8], jnp.int32)
    mesh = create_sp_mesh(sp=4)
    want = xla_attention(q, k, v, causal=True, q_segment_ids=seg,
                         kv_segment_ids=seg)
    got = _ring_full(q, k, v, mesh, seg=seg)
    np.testing.assert_allclose(np.asarray(got)[:, :, :24],
                               np.asarray(want)[:, :, :24],
                               rtol=2e-5, atol=2e-5)


def test_sp_decoder_matches_plain_and_grads():
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    B, S = 2, 32
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(B, S)))
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    mesh = create_sp_mesh(sp=4)

    def loss_plain(p):
        h, _ = decoder_forward(p, CFG, embed_tokens(p, ids), pos)
        return cross_entropy_loss(lm_head(p, CFG, h), ids)

    def loss_sp(p):
        h = sp_decoder_forward(p, CFG, embed_tokens(p, ids), pos, mesh=mesh)
        return cross_entropy_loss(lm_head(p, CFG, h), ids)

    h_plain, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
    h_sp = sp_decoder_forward(params, CFG, embed_tokens(params, ids), pos,
                              mesh=mesh)
    np.testing.assert_allclose(np.asarray(h_sp, np.float32),
                               np.asarray(h_plain, np.float32),
                               rtol=2e-5, atol=2e-5)

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_sp)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for (p0, v0), (_, v1) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(v1, np.float32),
                                   np.asarray(v0, np.float32),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(p0))


def test_sp_decoder_mrope():
    """M-RoPE positions (Qwen2-VL family) shard with the sequence too."""
    cfg = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    mrope_sections=(1, 1, 2))
    params = init_llm_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(2)
    B, S = 1, 32
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, S)))
    pos = jnp.asarray(rng.integers(0, S, size=(3, B, S)))
    mesh = create_sp_mesh(sp=4)
    want, _ = decoder_forward(params, cfg, embed_tokens(params, ids), pos)
    got = sp_decoder_forward(params, cfg, embed_tokens(params, ids), pos,
                             mesh=mesh)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-5, atol=2e-5)
