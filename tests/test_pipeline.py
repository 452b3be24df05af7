"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh:
forward equality with the scanned decoder and gradient equality through the
GPipe schedule (autodiff through ppermute = the backward pipeline)."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import (
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.parallel.pipeline import (
    create_pp_mesh,
    pipeline_decoder_forward,
)

CFG = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                num_layers=4, num_heads=4, num_kv_heads=2)


def _setup(seed=0, B=4, S=16):
    params = init_llm_params(jax.random.PRNGKey(seed), CFG)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, size=(B, S)))
    embeds = embed_tokens(params, ids)
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    return params, ids, embeds, pos


def _plain_hidden(params, embeds, pos):
    h, _ = decoder_forward(params, CFG, embeds, pos)
    return h


def test_pipeline_forward_matches_decoder():
    params, _, embeds, pos = _setup()
    mesh = create_pp_mesh(pp=4)
    want = np.asarray(_plain_hidden(params, embeds, pos), np.float32)
    for n_micro in (1, 2, 4):
        got = pipeline_decoder_forward(params, CFG, embeds, pos,
                                       mesh=mesh, n_micro=n_micro)
        np.testing.assert_allclose(np.asarray(got, np.float32), want,
                                   rtol=2e-5, atol=2e-5)


def test_pipeline_forward_segments():
    params, _, embeds, pos = _setup()
    seg = jnp.concatenate([jnp.zeros((4, 12), jnp.int32),
                           jnp.full((4, 4), -1, jnp.int32)], axis=1)
    mesh = create_pp_mesh(pp=2)
    want, _ = decoder_forward(params, CFG, embeds, pos, segment_ids=seg)
    got = pipeline_decoder_forward(params, CFG, embeds, pos, mesh=mesh,
                                   n_micro=2, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(got, np.float32)[:, :12],
                               np.asarray(want, np.float32)[:, :12],
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_plain():
    """jax.grad through the pipeline (GPipe backward via ppermute transpose)
    equals the plain scanned decoder's grads."""
    params, ids, _, pos = _setup()
    mesh = create_pp_mesh(pp=4)
    labels = ids

    def loss_plain(params):
        h = _plain_hidden(params, embed_tokens(params, ids), pos)
        return cross_entropy_loss(lm_head(params, CFG, h), labels)

    def loss_pp(params):
        h = pipeline_decoder_forward(params, CFG, embed_tokens(params, ids),
                                     pos, mesh=mesh, n_micro=2)
        return cross_entropy_loss(lm_head(params, CFG, h), labels)

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_pp)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_leaves_with_path(g1)}
    for p, v0 in flat0:
        v1 = flat1[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(np.asarray(v1, np.float32),
                                   np.asarray(v0, np.float32),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(p))


def test_pipeline_jit_train_step():
    """One jitted pp train step (grad + sgd update) runs and is finite."""
    params, ids, _, pos = _setup()
    mesh = create_pp_mesh(pp=4)

    @jax.jit
    def step(params):
        def loss(p):
            h = pipeline_decoder_forward(p, CFG, embed_tokens(p, ids), pos,
                                         mesh=mesh, n_micro=4)
            return cross_entropy_loss(lm_head(p, CFG, h), ids)
        l, g = jax.value_and_grad(loss)(params)
        return jax.tree.map(lambda p, g: p - 1e-3 * g, params, g), l

    params2, loss = step(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(params2)
    assert all(bool(jnp.isfinite(x.astype(jnp.float32)).all())
               for x in leaves)
