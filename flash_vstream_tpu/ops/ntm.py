"""Neural-Turing-Machine abstract memory update.

Reference: NeuralTuringMachine (vstream_arch.py:34-65) and the update rule
VStreamMetaForCausalLM.attention (vstream_arch.py:174-183):

    weight = softmax(q(mem) @ k(new)^T / sqrt(h)) * update_ratio
    decay  = weight.sum(-1, keepdims=True)
    mem    = mem * (1 - decay) + weight @ new

and the chunked driver attention_feature (compress_functions.py:263-277),
which folds incoming frames into a fixed [T0*P, D] memory T0 frames at a time.

TPU-first: the chunk loop is a lax.scan with a per-token key validity mask
(masked softmax), so any frame count compiles to one program. The projections
are small matmuls (D x h with h=32 by default) that XLA fuses into the scan
body.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class NTMParams(NamedTuple):
    """Parameters of the NTM cross-attention. Only q/k are used by the update
    rule; v/out/ln are kept for checkpoint-format parity with the reference
    module (vstream_arch.py:39-45)."""
    wq: jnp.ndarray   # [D, H]
    bq: jnp.ndarray   # [H]
    wk: jnp.ndarray   # [D, H]
    bk: jnp.ndarray   # [H]
    wv: jnp.ndarray   # [D, H]
    bv: jnp.ndarray   # [H]
    wo: jnp.ndarray   # [H, D]
    bo: jnp.ndarray   # [D]
    ln_scale: jnp.ndarray  # [D]
    ln_bias: jnp.ndarray   # [D]


def init_ntm_params(key: jax.Array, input_dim: int, hidden_dim: int,
                    dtype=jnp.float32) -> NTMParams:
    ks = jax.random.split(key, 4)
    def lin(k, din, dout):
        bound = 1.0 / jnp.sqrt(din)
        w = jax.random.uniform(k, (din, dout), dtype, -bound, bound)
        b = jnp.zeros((dout,), dtype)
        return w, b
    wq, bq = lin(ks[0], input_dim, hidden_dim)
    wk, bk = lin(ks[1], input_dim, hidden_dim)
    wv, bv = lin(ks[2], input_dim, hidden_dim)
    wo, bo = lin(ks[3], hidden_dim, input_dim)
    return NTMParams(wq, bq, wk, bk, wv, bv, wo, bo,
                     jnp.ones((input_dim,), dtype), jnp.zeros((input_dim,), dtype))


def ntm_update(params: NTMParams, memory: jnp.ndarray, new: jnp.ndarray,
               new_valid: Optional[jnp.ndarray] = None,
               update_ratio: float = 0.2) -> jnp.ndarray:
    """One NTM write: blend `new` ([N, D], masked by new_valid) into `memory`
    ([M, D]). Matches vstream_arch.py:174-183 with masked softmax over keys."""
    h = params.wq.shape[1]
    q = memory.astype(jnp.float32) @ params.wq.astype(jnp.float32) + params.bq
    k = new.astype(jnp.float32) @ params.wk.astype(jnp.float32) + params.bk
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) / jnp.sqrt(
        jnp.float32(h))
    if new_valid is not None:
        scores = jnp.where(new_valid[None, :], scores, -jnp.inf)
    weight = jax.nn.softmax(scores, axis=-1)
    if new_valid is not None:
        # fully-masked rows produce NaN from softmax(-inf); zero them
        any_valid = jnp.any(new_valid)
        weight = jnp.where(any_valid, weight, 0.0)
    weight = weight * update_ratio
    decay = jnp.sum(weight, axis=-1, keepdims=True)
    out = memory.astype(jnp.float32) * (1.0 - decay) + jnp.dot(
        weight, new.astype(jnp.float32), preferred_element_type=jnp.float32)
    return out


def ntm_compress(params: NTMParams, x: jnp.ndarray, n_valid: jnp.ndarray,
                 t0: int, tokens_per_frame: int,
                 update_ratio: float = 0.2) -> jnp.ndarray:
    """Chunked NTM compression of x: [Tmax, P, D] down to [t0, P, D].

    Mirrors attention_feature (compress_functions.py:263-277): memory is the
    first t0 frames; subsequent frames arrive in chunks of t0 frames.
    Frames at index >= n_valid are masked. If n_valid <= t0, the (masked)
    input passes through untouched.
    """
    Tmax, P, D = x.shape
    assert P == tokens_per_frame
    mem0 = x[:t0].reshape(t0 * P, D).astype(jnp.float32)
    n_chunks = -(-(Tmax - t0) // t0) if Tmax > t0 else 0
    if n_chunks == 0:
        return mem0.reshape(t0, P, D)
    pad = n_chunks * t0 - (Tmax - t0)
    rest = jnp.pad(x[t0:].astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
    rest = rest.reshape(n_chunks, t0 * P, D)
    frame_idx = jnp.pad(jnp.arange(t0, Tmax), (0, pad), constant_values=Tmax)
    frame_idx = frame_idx.reshape(n_chunks, t0)

    def step(mem, inp):
        chunk, fidx = inp
        tok_valid = jnp.repeat(fidx < n_valid, P)
        new_mem = ntm_update(params, mem, chunk, tok_valid, update_ratio)
        has_any = jnp.any(tok_valid)
        return jnp.where(has_any, new_mem, mem), None

    mem, _ = jax.lax.scan(step, mem0, (rest, frame_idx))
    return mem.reshape(t0, P, D)
