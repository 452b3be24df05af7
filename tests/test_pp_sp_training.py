"""PP/SP as USER-FACING training capabilities (VERDICT r3 weak #4/#5):

1. loss equality at PRODUCTION layer count — 28 scanned decoder layers split
   over pp=4 stages (and a 28-layer ring over sp=4) on the virtual CPU mesh,
   COMPOSED with a dp axis (manual-subset shard_map under an outer jit whose
   batch rides dp),
2. the finetune entry trains end-to-end with --pp / --sp.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import (
    cross_entropy_loss,
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.parallel.pipeline import pipeline_decoder_forward
from flash_vstream_tpu.parallel.sequence import sp_decoder_forward
from flash_vstream_tpu.parallel.sharding import create_train_mesh

# PRODUCTION layer count (Qwen2-VL 2B/7B: 28), test-scale widths
CFG28 = LLMConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                  num_layers=28, num_heads=4, num_kv_heads=2,
                  attention_bias=True, mrope_sections=(2, 1, 1))


def _setup(mesh):
    rng = np.random.default_rng(0)
    params = init_llm_params(jax.random.PRNGKey(0), CFG28)
    B, S = 4, 32
    ids = jnp.asarray(rng.integers(0, 128, size=(B, S)))
    labels = jnp.asarray(rng.integers(0, 128, size=(B, S)))
    pos = jnp.broadcast_to(jnp.arange(S)[None, None], (3, B, S))
    embeds = embed_tokens(params, ids)
    embeds = jax.device_put(embeds, NamedSharding(mesh, P("dp")))
    labels = jax.device_put(labels, NamedSharding(mesh, P("dp")))
    return params, embeds, pos, labels


def test_pp4_28layers_loss_and_grads_match_plain():
    """GPipe over pp=4 x dp=2: 28 scanned layers split 7-per-stage; loss and
    grads equal the plain stack under the composed mesh."""
    mesh = create_train_mesh(dp=2, pp=4)
    params, embeds, pos, labels = _setup(mesh)

    def plain_loss(params, embeds):
        h, _ = decoder_forward(params, CFG28, embeds, pos)
        return cross_entropy_loss(lm_head(params, CFG28, h), labels)

    def pp_loss(params, embeds):
        h = pipeline_decoder_forward(params, CFG28, embeds, pos,
                                     mesh=mesh, n_micro=4)
        return cross_entropy_loss(lm_head(params, CFG28, h), labels)

    with mesh:
        ref, ref_g = jax.jit(jax.value_and_grad(plain_loss))(params, embeds)
        got, got_g = jax.jit(jax.value_and_grad(pp_loss))(params, embeds)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_sp4_28layers_loss_matches_plain():
    """Ring attention over sp=4 x dp=2 at 28 layers: sequence shards across
    the ring, loss equals the plain stack."""
    mesh = create_train_mesh(dp=2, sp=4)
    params, embeds, pos, labels = _setup(mesh)

    def plain_loss(params, embeds):
        h, _ = decoder_forward(params, CFG28, embeds, pos)
        return cross_entropy_loss(lm_head(params, CFG28, h), labels)

    def sp_loss(params, embeds):
        h = sp_decoder_forward(params, CFG28, embeds, pos, mesh=mesh)
        return cross_entropy_loss(lm_head(params, CFG28, h), labels)

    with mesh:
        ref = jax.jit(plain_loss)(params, embeds)
        got = jax.jit(sp_loss)(params, embeds)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


@pytest.mark.parametrize("flag", ["--pp", "--sp"])
def test_finetune_entry_pp_sp(tmp_path, flag):
    """--pp 2 / --sp 2 train end-to-end through the finetune entry on the
    8-device mesh (dp=4 x pp/sp=2), loss finite and decreasing."""
    from flash_vstream_tpu.train.finetune_flash import (make_parser,
                                                        run_training)
    out = str(tmp_path / "run")
    args = make_parser().parse_args([
        "--dry-run", "--output-dir", out,
        "--max-steps", "4", "--grad-accum", "1",
        "--max-frames", "4", "--frame-bucket", "4",
        "--max-len", "128", "--max-pixels", str(56 * 56),
        "--learning-rate", "5e-3", "--save-steps", "100",
        "--lora-rank", "2", "--lora-alpha", "4",
        flag, "2",
    ])
    res = run_training(args)
    assert all(np.isfinite(l) for l in res["losses"])
    assert res["losses"][-1] < res["losses"][0]
