"""Generation paths: compiled while-loop decode == stepwise decode; EOS stop."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import LLMConfig
from flash_vstream_tpu.models.llm import init_llm_params
from flash_vstream_tpu.runtime.generation import GenerationConfig, Generator

CFG = LLMConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, num_kv_heads=2)


def make_gen():
    params = init_llm_params(jax.random.PRNGKey(0), CFG)
    return Generator(params, CFG, max_len=64, cache_dtype=jnp.float32)


def test_compiled_matches_stepwise(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 6, 32)).astype(np.float32))
    pos = jnp.arange(6)[None]
    cfg = GenerationConfig(max_new_tokens=10, eos_token_ids=())
    compiled = g.generate(embeds, pos, cfg)
    stepwise = g.generate(embeds, pos, cfg, stream=True)
    assert compiled == stepwise


def test_eos_stops_decode(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    # find which token greedy produces first, then use it as EOS
    first = g.generate(embeds, pos, GenerationConfig(max_new_tokens=1))[0]
    out = g.generate(embeds, pos, GenerationConfig(max_new_tokens=10,
                                                   eos_token_ids=(first,)))
    assert out == [first]


def test_max_new_tokens_bound(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    out = g.generate(embeds, pos, GenerationConfig(max_new_tokens=3,
                                                   eos_token_ids=()))
    assert len(out) == 3


def test_topk_one_is_greedy(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    greedy = g.generate(embeds, pos, GenerationConfig(max_new_tokens=5))
    topk1 = g.generate(embeds, pos, GenerationConfig(max_new_tokens=5,
                                                     temperature=1.0, top_k=1))
    assert greedy == topk1


def test_sampling_respects_topk(rng):
    g = make_gen()
    embeds = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    pos = jnp.arange(4)[None]
    # high temperature but top_k=2: tokens restricted to the 2 best per step
    out = g.generate(embeds, pos, GenerationConfig(
        max_new_tokens=6, temperature=5.0, top_k=2, seed=1))
    assert len(out) == 6
