"""Tensor-parallel inference on the virtual CPU mesh: sharded == unsharded."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import (
    decoder_forward,
    embed_tokens,
    init_llm_params,
    lm_head,
)
from flash_vstream_tpu.parallel.inference import shard_params_for_inference
from flash_vstream_tpu.runtime.generation import GenerationConfig, Generator

CFG = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=8, num_kv_heads=4)


def test_tp_forward_matches(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 10)))
    pos = jnp.arange(10)[None]
    h, _ = decoder_forward(params, CFG, embed_tokens(params, ids), pos)
    want = np.asarray(lm_head(params, CFG, h))

    sharded, mesh = shard_params_for_inference(params, tp=4)
    # weights actually sharded over tp
    spec = sharded["layers"]["mlp"]["gate"]["w"].sharding.spec
    assert "tp" in spec
    with mesh:
        h2, _ = jax.jit(
            lambda p, e, pos: decoder_forward(p, CFG, e, pos))(
            sharded, embed_tokens(sharded, ids), pos)
        got = np.asarray(lm_head(sharded, CFG, h2))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_tp_generation_matches(rng):
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    embeds = jnp.asarray(rng.normal(size=(1, 6, 64)).astype(np.float32))
    pos = jnp.arange(6)[None]
    gen = GenerationConfig(max_new_tokens=8, eos_token_ids=())
    base = Generator(params, CFG, max_len=64, cache_dtype=jnp.float32)
    want = base.generate(embeds, pos, gen)

    sharded, mesh = shard_params_for_inference(params, tp=8)
    with mesh:
        g = Generator(sharded, CFG, max_len=64, cache_dtype=jnp.float32)
        got = g.generate(embeds, pos, gen)
    assert got == want
