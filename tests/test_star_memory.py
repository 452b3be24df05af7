import jax
import jax.numpy as jnp
import numpy as np

from flash_vstream_tpu.core.config import STARConfig
from flash_vstream_tpu.models.star_memory import (
    init_star_state,
    star_consolidate,
    star_memory_tokens,
    star_stream_update,
    star_token_count,
)
from flash_vstream_tpu.ops import init_ntm_params

CFG = STARConfig(long_length=4, long_size=2, turing_length=3, turing_size=1,
                 current_size=4, key_length=2, turing_hidden_dim=8,
                 video_max_frames=16, max_frames_static=16)
D = 16
P = CFG.current_size ** 2


def make_inputs(rng, T, Tmax=16):
    x = np.zeros((Tmax, P, D), np.float32)
    x[:T] = rng.normal(size=(T, P, D))
    return jnp.asarray(x)


def test_consolidate_long_video(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    feats = make_inputs(rng, 12)
    mem = star_consolidate(ntm, CFG, feats, jnp.int32(12), jax.random.PRNGKey(1))
    assert mem.tokens.shape == (star_token_count(CFG), D)
    # long video: all sections fully valid
    assert bool(mem.valid.all())
    assert np.isfinite(np.asarray(mem.tokens)).all()


def test_consolidate_short_video(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    T = 3  # history = 2 < long_length
    feats = make_inputs(rng, T)
    mem = star_consolidate(ntm, CFG, feats, jnp.int32(T), jax.random.PRNGKey(1))
    v = np.asarray(mem.valid)
    # turing: 2 frames * 1 token; long: 2 * 4 tokens; key: 2*16; cur: 1*16
    t_sz, l_sz, c_sz = CFG.turing_size**2, CFG.long_size**2, P
    turing_v = v[:CFG.turing_length * t_sz]
    long_v = v[CFG.turing_length * t_sz:CFG.turing_length * t_sz + CFG.long_length * l_sz]
    assert turing_v.sum() == 2 * t_sz
    assert long_v.sum() == 2 * l_sz
    # short-phase long memory = passthrough frames, in temporal order
    tokens = np.asarray(mem.tokens)
    feats_np = np.asarray(feats)
    long_tokens = tokens[CFG.turing_length * t_sz:][:CFG.long_length * l_sz]
    pooled = feats_np[:2].reshape(2, CFG.long_size, 2, CFG.long_size, 2, D).mean(axis=(2, 4))
    np.testing.assert_allclose(long_tokens[:2 * l_sz],
                               pooled.reshape(2 * l_sz, D), rtol=1e-4, atol=1e-5)


def test_consolidate_single_frame(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    feats = make_inputs(rng, 1)
    mem = star_consolidate(ntm, CFG, feats, jnp.int32(1), jax.random.PRNGKey(1))
    v = np.asarray(mem.valid)
    # no history: only the current frame's tokens are valid
    assert v.sum() == P
    np.testing.assert_allclose(np.asarray(mem.tokens)[v], np.asarray(feats)[0],
                               rtol=1e-5)


def test_consolidate_jit(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    f = jax.jit(lambda feats, n, key: star_consolidate(ntm, CFG, feats, n, key))
    for T in (2, 8, 16):
        mem = f(make_inputs(rng, T), jnp.int32(T), jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(mem.tokens)).all()


def test_stream_update_grows_then_saturates(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    state = init_star_state(CFG, D)
    step = jax.jit(lambda s, x, n, k: star_stream_update(ntm, CFG, s, x, n, k))
    clip = 2
    for i in range(6):
        x = jnp.asarray(rng.normal(size=(clip, P, D)).astype(np.float32))
        state = step(state, x, jnp.int32(clip), jax.random.PRNGKey(i))
    assert int(state.n_frames) == 12
    assert bool(state.long_valid.all())     # 12 > long_length=4
    assert bool(state.turing_valid.all())
    assert bool(state.cur_valid.all())
    mem = star_memory_tokens(CFG, state)
    assert bool(mem.valid.all())
    assert np.isfinite(np.asarray(mem.tokens)).all()
    # bank holds the last 16 frames with correct global positions
    pos = np.sort(np.asarray(state.bank_pos))
    np.testing.assert_array_equal(pos[-12:], np.arange(12))


def test_stream_update_short_phase(rng):
    ntm = init_ntm_params(jax.random.PRNGKey(0), D, CFG.turing_hidden_dim)
    state = init_star_state(CFG, D)
    x = jnp.asarray(rng.normal(size=(2, P, D)).astype(np.float32))
    state = star_stream_update(ntm, CFG, state, x, jnp.int32(2), jax.random.PRNGKey(0))
    assert int(state.long_valid.sum()) == 2
    assert int(state.turing_valid.sum()) == 2
    assert int(state.cur_valid.sum()) == 1
    # long memory short phase: pooled new frames in order
    pooled = np.asarray(x).reshape(2, CFG.long_size, 2, CFG.long_size, 2, D).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(state.long)[:2],
                               pooled.reshape(2, CFG.long_size**2, D),
                               rtol=1e-4, atol=1e-5)
