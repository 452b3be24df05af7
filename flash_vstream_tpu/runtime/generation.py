"""KV-cached autoregressive generation.

Replaces the reference's HF `generate()` calls (model_msvd_qa_featuresloader.py:147-156,
inference_mcq_vqa.py:344-346) with a jitted prefill + jitted decode step and a
host loop. Deterministic decode matches the reference eval settings
(top_k=1 / do_sample=False).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import LLMConfig
from ..models.layers import KVCache
from ..models.llm import decoder_forward, embed_tokens, lm_head


@dataclasses.dataclass
class GenerationConfig:
    max_new_tokens: int = 128
    temperature: float = 0.0       # 0 => greedy (reference: do_sample=False)
    top_k: int = 0                 # 0 = disabled; reference MCQ uses top_k=1
    top_p: float = 1.0
    eos_token_ids: Sequence[int] = ()
    seed: int = 0
    # conversation-separator stop keywords (reference stops on conv.sep2,
    # model_msvd_qa_featuresloader.py:147-156); applied by trim_stop_strings
    # and, on the stepwise path, via KeywordsStoppingCriteria
    stop_strings: Sequence[str] = ()
    # prompt-lookup speculative decoding (greedy path only, EXACT): draft
    # the k tokens that followed the latest occurrence of the current
    # n-gram in the prompt/generated history, verify them in one k+1-token
    # forward (reads the weights once for k+1 targets — decode is
    # weight-read-bound, so accepted drafts are nearly free). 0 = off.
    # Requires context_ids at generate() time.
    speculative_k: int = 0
    speculative_ngram: int = 3
    # preemptible answers (greedy path): split the compiled decode loop into
    # chunks of this many tokens with a host sync between dispatches, so a
    # concurrent ingest thread's queued clips run BETWEEN chunks instead of
    # stalling behind one monolithic answer dispatch (the contention the
    # reference sidesteps with a dedicated second GPU, cli_server_2gpu.py).
    # Costs ~1 tunnel RTT per chunk of answer latency. 0 = off (fused).
    # Precedence: when speculative_k is also active (with context_ids), the
    # speculative fused loop wins and preemption is ignored — speculation
    # already keeps the dispatch short, and chunking it would discard the
    # accepted-draft bookkeeping. generate() warns once on the combination.
    preemptible_chunk: int = 0
    # preemptible PREFILL (greedy path, with preemptible_chunk > 0): also
    # split the prompt forward into sequence chunks of this many tokens run
    # against the growing KV cache (the decode_multi path — causal with
    # q_offset, numerically identical to one-shot prefill), with the same
    # host sync between dispatches. Without it a ~3k-token memory prefill is
    # one 100-300 ms dispatch that blows ~1-2 clip deadlines per answer even
    # when decode is chunked. 0 = whole-prompt prefill.
    prefill_chunk: int = 0


_SPEC_PREEMPT_WARNED = False


def _warn_spec_preempt_once():
    """speculative_k + preemptible_chunk: speculation wins (see
    GenerationConfig); surface the silent-ignore once per process."""
    global _SPEC_PREEMPT_WARNED
    if not _SPEC_PREEMPT_WARNED:
        _SPEC_PREEMPT_WARNED = True
        import warnings
        warnings.warn(
            "speculative_k and preemptible_chunk both set: the speculative "
            "fused loop runs and preemption is ignored (one monolithic "
            "dispatch). Drop speculative_k if clip-deadline preemption "
            "matters more than answer latency.", stacklevel=3)


def trim_stop_strings(text: str, stop_strings: Sequence[str]) -> str:
    """Cut the answer at the first conversation-separator keyword (the
    reference's outputs.strip(stop_str), model_msvd_qa_featuresloader.py:156)."""
    for s in stop_strings:
        if s and s in text:
            text = text.split(s)[0]
    return text.strip()


def _sample(logits: jnp.ndarray, gen: "GenerationConfig", key) -> jnp.ndarray:
    if gen.temperature <= 0.0 or gen.top_k == 1:
        return jnp.argmax(logits, axis=-1)
    logits = logits / gen.temperature
    if gen.top_k > 1:
        kth = jnp.sort(logits, axis=-1)[..., -gen.top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest prefix with cumulative mass >= top_p stays
        cutoff_idx = jnp.sum(cum < gen.top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


class Generator:
    """Caches the jitted prefill/decode functions for one (params, cfg).

    Two decode paths:
    - compiled (default): the whole greedy loop is ONE jit — a
      lax.while_loop over decode steps with EOS early exit, so a full answer
      costs two device dispatches (prefill + loop) instead of one per token.
    - stepwise: one jit per token, for incremental text streaming.
    """

    def __init__(self, params: dict, cfg: LLMConfig, max_len: int = 4096,
                 cache_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.max_len = max_len
        self.cache_dtype = cache_dtype
        mrope = cfg.mrope_sections is not None

        def prefill(params, embeds, positions, cache, segment_ids=None,
                    last_idx=None):
            h, cache = decoder_forward(params, cfg, embeds, positions,
                                       segment_ids=segment_ids, cache=cache)
            logits = lm_head(params, cfg, h)
            if last_idx is None:
                return logits[:, -1], cache
            # right-padded prompts: read logits at the last REAL position
            idx = jnp.broadcast_to(jnp.asarray(last_idx).reshape(-1, 1, 1),
                                   (logits.shape[0], 1, logits.shape[2]))
            return jnp.take_along_axis(logits, idx, axis=1)[:, 0], cache

        def step(params, tok, pos_scalar, cache):
            # pos_scalar: [] shared position or [B] per-row positions
            emb = embed_tokens(params, tok[:, None])
            B = tok.shape[0]
            pos_b = jnp.broadcast_to(jnp.asarray(pos_scalar).reshape(-1, 1),
                                     (B, 1))
            if mrope:
                pos = jnp.broadcast_to(pos_b[None], (3, B, 1))
            else:
                pos = pos_b
            h, cache = decoder_forward(params, cfg, emb, pos, cache=cache)
            return lm_head(params, cfg, h)[:, -1], cache

        def decode_loop(params, first_tok, pos_start, cache, max_new,
                        eos_ids):
            B = first_tok.shape[0]
            out = jnp.zeros((B, max_new), jnp.int32)

            def is_eos(tok):
                if eos_ids.shape[0] == 0:
                    return jnp.zeros(tok.shape, bool)
                return jnp.any(tok[:, None] == eos_ids[None, :], axis=1)

            def cond(state):
                i, tok, cache, out, done = state
                return (i < max_new) & ~jnp.all(done)

            def body(state):
                i, tok, cache, out, done = state
                out = out.at[:, i].set(tok)
                done = done | is_eos(tok)
                logits, cache = step(params, tok, pos_start + i, cache)
                ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ntok = jnp.where(done, tok, ntok)
                return (i + 1, ntok, cache, out, done)

            state = (jnp.int32(0), first_tok.astype(jnp.int32), cache, out,
                     jnp.zeros((B,), bool))
            n, _, cache, out, _ = jax.lax.while_loop(cond, body, state)
            return out, n, cache

        def decode_chunk(params, first_tok, pos_start, cache, max_new,
                         eos_ids, done0):
            """Resumable slice of decode_loop: also returns the next token
            and done mask so the host can stitch chunks together with a
            completion-forcing sync between dispatches (preemptible
            answers — ingest clips queued mid-answer run in the gaps)."""
            B = first_tok.shape[0]
            out = jnp.zeros((B, max_new), jnp.int32)

            def is_eos(tok):
                if eos_ids.shape[0] == 0:
                    return jnp.zeros(tok.shape, bool)
                return jnp.any(tok[:, None] == eos_ids[None, :], axis=1)

            def cond(state):
                i, tok, cache, out, done = state
                return (i < max_new) & ~jnp.all(done)

            def body(state):
                i, tok, cache, out, done = state
                out = out.at[:, i].set(tok)
                done = done | is_eos(tok)
                logits, cache = step(params, tok, pos_start + i, cache)
                ntok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                ntok = jnp.where(done, tok, ntok)
                return (i + 1, ntok, cache, out, done)

            state = (jnp.int32(0), first_tok.astype(jnp.int32), cache, out,
                     done0)
            n, tok, cache, out, done = jax.lax.while_loop(cond, body, state)
            return out, n, cache, tok, done

        def spec_decode_loop(params, first_tok, pos_start, cache, hist0,
                             h_len0, max_new, eos_ids, k, ngram):
            """Greedy decode with in-loop PROMPT-LOOKUP drafting, all inside
            one jit. Exact greedy equivalence: every emitted token is the
            model's argmax given its true prefix — drafts only decide how
            many targets one weight-read verifies. Rejected draft kv/out/
            hist slots are overwritten by the next round's k+1-wide writes
            (always wider than the rejected tail), so no rollback is needed.
            """
            B = first_tok.shape[0]
            H = hist0.shape[1]
            out = jnp.zeros((B, max_new + k), jnp.int32)

            def is_eos(tok):
                if eos_ids.shape[0] == 0:
                    return jnp.zeros(tok.shape, bool)
                return jnp.any(tok[..., None] == eos_ids[None, None, :],
                               axis=-1)

            def verify(params, toks, pos0, cache):
                emb = embed_tokens(params, toks)
                K1 = toks.shape[1]
                pos_b = jnp.broadcast_to(
                    jnp.asarray(pos0).reshape(-1, 1) + jnp.arange(K1)[None],
                    (B, K1))
                pos = (jnp.broadcast_to(pos_b[None], (3, B, K1))
                       if mrope else pos_b)
                h, cache = decoder_forward(params, cfg, emb, pos,
                                           cache=cache, decode_multi=True)
                return lm_head(params, cfg, h), cache

            # history = context + first token (emitted at out[0])
            hist = jax.lax.dynamic_update_slice(
                hist0, first_tok.reshape(B, 1).astype(jnp.int32),
                (0, h_len0))
            h_len = h_len0 + 1
            out = out.at[:, 0].set(first_tok)
            done0 = is_eos(first_tok[:, None])[:, 0]

            def cond(state):
                i, tok, cache, out, done, hist, h_len = state
                return (i < max_new) & ~jnp.all(done)

            def body(state):
                i, tok, cache, out, done, hist, h_len = state
                # draft: tokens after the LATEST occurrence of the trailing
                # ngram in history (prompt-lookup decoding)
                q0 = jnp.maximum(h_len - ngram, 0)
                query = jax.lax.dynamic_slice(hist, (0, q0), (B, ngram))
                widx = (jnp.arange(H - ngram + 1)[:, None]
                        + jnp.arange(ngram)[None])
                windows = hist[0][widx]                       # [W, ngram]
                jpos = jnp.arange(H - ngram + 1)
                match = jnp.all(windows == query[0][None], axis=1)
                valid = match & (jpos <= h_len - ngram - 1) & (h_len >= ngram)
                found = jnp.any(valid)
                jstar = jnp.max(jnp.where(valid, jpos, -1))
                dstart = jnp.maximum(jstar + ngram, 0)
                draft = jax.lax.dynamic_slice(hist, (0, dstart), (B, k))

                toks_in = jnp.concatenate(
                    [tok.reshape(B, 1).astype(jnp.int32), draft], axis=1)
                logits, cache = verify(params, toks_in,
                                       pos_start + i - 1, cache)
                g = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B,k+1]
                eq = (draft == g[:, :-1]) & found
                m = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1),
                            axis=1)                           # accepted
                n_new = m + 1
                eosv = is_eos(g)
                within = jnp.arange(k + 1)[None] < n_new[:, None]
                any_e = jnp.any(eosv & within, axis=1)
                fe = jnp.argmax(eosv & within, axis=1)
                n_emit = jnp.where(any_e, fe + 1, n_new)[0]
                # unmasked writes: rejected tails are overwritten by the
                # next round (k+1 wide) or trimmed by the returned count
                out = jax.lax.dynamic_update_slice(out, g, (0, i))
                hist = jax.lax.dynamic_update_slice(hist, g, (0, h_len))
                # cache wrote k+1 entries; only 1+accepted are real
                cache = cache._replace(
                    length=cache.length - (k + 1) + n_emit)
                done = done | any_e
                tok = jnp.take_along_axis(
                    g, (n_emit - 1).reshape(1, 1), axis=1)[:, 0]
                return (i + n_emit, tok, cache, out, done, hist,
                        h_len + n_emit)

            state = (jnp.int32(1), first_tok.astype(jnp.int32), cache, out,
                     done0, hist, h_len)
            i, _, cache, out, _, _, _ = jax.lax.while_loop(cond, body, state)
            return out, jnp.minimum(i, max_new + k), cache

        def prefill_seq_chunk(params, embeds, positions, cache, last_rel,
                              segment_ids=None):
            """One prompt chunk against the existing cache prefix
            (decode_multi: intra-chunk causal + full attention to the
            prefix via q_offset=cache_len — same math as one-shot prefill).
            Returns logits at chunk-relative last_rel (callers ignore them
            for all but the chunk holding the last real token)."""
            h, cache = decoder_forward(params, cfg, embeds, positions,
                                       segment_ids=segment_ids, cache=cache,
                                       decode_multi=True)
            idx = jnp.broadcast_to(jnp.asarray(last_rel).reshape(-1, 1, 1),
                                   (h.shape[0], 1, h.shape[2]))
            h_last = jnp.take_along_axis(h, idx, axis=1)
            return lm_head(params, cfg, h_last)[:, -1], cache

        self._prefill = jax.jit(prefill, donate_argnums=(3,))
        self._prefill_seq_chunk = jax.jit(prefill_seq_chunk,
                                          donate_argnums=(3,))
        self._step = jax.jit(step, donate_argnums=(3,))
        self._decode_loop = jax.jit(decode_loop, donate_argnums=(3,),
                                    static_argnums=(4,))
        self._decode_chunk = jax.jit(decode_chunk, donate_argnums=(3,),
                                     static_argnums=(4,))
        self._spec_decode_loop = jax.jit(spec_decode_loop,
                                         donate_argnums=(3,),
                                         static_argnums=(6, 8, 9))
        # unjitted bodies, for callers that COMPOSE prefill+decode (and
        # prompt assembly) into one jit — a full answer then costs a single
        # dispatch, which matters when per-dispatch latency is tens of ms
        # (remote-device tunnels)
        self.prefill_fn = prefill
        self.decode_loop_fn = decode_loop

    def generate_batch(
        self,
        embeds: jnp.ndarray,            # [B, S, D] LEFT-padded prompts
        positions: jnp.ndarray,         # [B, S] or [3, B, S]
        segment_ids: jnp.ndarray,       # [B, S]; -1 at padding
        gen: "GenerationConfig",
        decode_pos_start: jnp.ndarray,  # [B] first decode position per row
        last_real_idx=None,             # [B] last real position per row
    ) -> List[List[int]]:
        """Shared batched greedy decode for B concurrent prompts
        (BASELINE config #5: one fused decode loop serves every stream)."""
        B, S, _ = embeds.shape
        assert S + gen.max_new_tokens <= self.max_len, (
            f"prompt ({S}) + max_new_tokens ({gen.max_new_tokens}) exceeds "
            f"the KV cache capacity ({self.max_len}); raise max_len")
        cache = self.new_cache(B, self._active_len(S, gen.max_new_tokens))
        logits, cache = self._prefill(self.params, embeds, positions, cache,
                                      segment_ids, last_real_idx)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        eos = jnp.asarray(list(gen.eos_token_ids), jnp.int32)
        out, n, _ = self._decode_loop(
            self.params, first, jnp.asarray(decode_pos_start, jnp.int32),
            cache, gen.max_new_tokens, eos)
        outs = []
        arr = np.asarray(out[:, :int(n)])
        for b in range(B):
            toks = arr[b].tolist()
            for j, t in enumerate(toks):
                if t in gen.eos_token_ids:
                    toks = toks[:j + 1]
                    break
            outs.append(toks)
        return outs

    def new_cache(self, batch: int = 1, length: Optional[int] = None) -> KVCache:
        return KVCache.create(self.cfg.num_layers, batch,
                              self.cfg.num_kv_heads, length or self.max_len,
                              self.cfg.head_dim, self.cache_dtype)

    def _active_len(self, S: int, max_new: int) -> int:
        """Tight KV capacity bucket for one answer. Decode attention reads
        the WHOLE cache buffer every token, so sizing it to the session-wide
        max_len (e.g. 16k) instead of this prompt's needs multiplies the
        per-token HBM traffic; bucket to 256 to bound recompiles."""
        need = -(-(S + max_new + 1) // 256) * 256
        return min(self.max_len, need)

    def generate(
        self,
        embeds: jnp.ndarray,                 # [B, S, D] prompt embeddings
        positions: jnp.ndarray,              # [B, S] or [3, B, S]
        gen: GenerationConfig,
        decode_pos_start: Optional[int] = None,  # first decode position
        stream: bool = False,                # stepwise decode (text streaming)
        segment_ids: Optional[jnp.ndarray] = None,  # [B, S]; -1 = padding
        last_real_idx=None,                  # logits position (right-padded)
        stopping=None,   # KeywordsStoppingCriteria (see below)
        context_ids=None,  # text token ids (question/history) enabling
                           # prompt-lookup speculative decoding
    ) -> List[int]:
        """Greedy/temperature decode; returns generated token ids (batch 1)."""
        B, S, _ = embeds.shape
        assert B == 1, "generation currently supports batch=1 per stream"
        assert S + gen.max_new_tokens <= self.max_len, (
            f"prompt ({S}) + max_new_tokens ({gen.max_new_tokens}) exceeds "
            f"the KV cache capacity ({self.max_len}); raise max_len")
        # speculative rounds may scribble up to k rejected entries past the
        # final length; size the cache bucket for them
        spec_pad = (gen.speculative_k
                    if gen.speculative_k > 0 and context_ids is not None
                    else 0)
        if spec_pad and gen.preemptible_chunk > 0:
            _warn_spec_preempt_once()
        # fixed-size preemptible chunks may overrun max_new_tokens by up to
        # chunk-1 masked steps; the cache bucket must cover them
        chunk_pad = 0
        if gen.preemptible_chunk > 0 and not spec_pad:
            c = gen.preemptible_chunk
            chunk_pad = (c - gen.max_new_tokens % c) % c
        cache = self.new_cache(
            B, self._active_len(S, gen.max_new_tokens + spec_pad + chunk_pad))
        if (gen.preemptible_chunk > 0 and gen.prefill_chunk > 0
                and not spec_pad):
            # preemptible prefill: sequence chunks through the decode_multi
            # path (exact — causal vs the cached prefix), one host sync per
            # chunk so concurrently queued ingest clips run between them
            c = gen.prefill_chunk
            last = (int(np.asarray(last_real_idx).ravel()[0])
                    if last_real_idx is not None else S - 1)
            logits = None
            for a in range(0, S, c):
                b_ = min(a + c, S)
                rel = last - a if a <= last < b_ else 0
                seg = (segment_ids[:, a:b_]
                       if segment_ids is not None else None)
                lg, cache = self._prefill_seq_chunk(
                    self.params, embeds[:, a:b_], positions[..., a:b_],
                    cache, jnp.int32(rel), seg)
                if a <= last < b_:
                    logits = lg
                lg.block_until_ready()       # host sync (preemption point)
        else:
            logits, cache = self._prefill(self.params, embeds, positions,
                                          cache, segment_ids, last_real_idx)
        if decode_pos_start is None:
            decode_pos_start = S

        if (gen.temperature <= 0.0 or gen.top_k == 1) and not stream:
            # fully compiled greedy loop: one dispatch for the whole answer.
            # Single-token stop KEYWORDS fold into the EOS set (the loop
            # cannot run host-side substring checks); multi-token keywords
            # only apply on the stepwise path, with trim_stop_strings as the
            # text-level backstop either way.
            stop_ids = set(gen.eos_token_ids)
            if stopping is not None:
                stop_ids |= set(stopping.single_token_ids())
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            eos = jnp.asarray(sorted(stop_ids), jnp.int32)
            if gen.speculative_k > 0 and context_ids is not None:
                k, ng = gen.speculative_k, gen.speculative_ngram
                ctx = np.asarray(context_ids, np.int32).ravel()
                Hb = -(-(len(ctx) + gen.max_new_tokens + k + 1) // 128) * 128
                hist0 = np.zeros((1, Hb), np.int32)
                hist0[0, :len(ctx)] = ctx
                out, n, _ = self._spec_decode_loop(
                    self.params, first, jnp.int32(decode_pos_start), cache,
                    jnp.asarray(hist0), jnp.int32(len(ctx)),
                    gen.max_new_tokens, eos, k, ng)
                toks = np.asarray(out[0, :min(int(n),
                                              gen.max_new_tokens)]).tolist()
                for j, t in enumerate(toks):
                    if t in stop_ids:
                        return toks[:j + 1]
                return toks
            if gen.preemptible_chunk > 0:
                # chunked greedy: identical tokens to the fused loop, but the
                # device queue drains between chunks (the int(n) fetch forces
                # completion through the tunnel), letting concurrently
                # dispatched ingest clips preempt a long answer.
                # Every dispatch uses the SAME chunk size (the tail chunk
                # over-decodes masked steps and is trimmed host-side), so one
                # compiled program serves every (max_new_tokens, chunk)
                # combination — no cold tail-chunk compile mid-answer.
                toks: List[int] = []
                tok, pos = first, decode_pos_start
                done = jnp.zeros((first.shape[0],), bool)
                c = gen.preemptible_chunk
                remaining = gen.max_new_tokens
                while remaining > 0:
                    out, n, cache, tok, done = self._decode_chunk(
                        self.params, tok, jnp.int32(pos), cache, c, eos,
                        done)
                    n = int(n)                       # host sync (preemption)
                    take = min(n, remaining)
                    toks += np.asarray(out[0, :take]).tolist()
                    pos += n
                    remaining -= take
                    if n == 0 or bool(done[0]):
                        break
                for j, t in enumerate(toks):
                    if t in stop_ids:
                        return toks[:j + 1]
                return toks
            out, n, _ = self._decode_loop(self.params, first,
                                          jnp.int32(decode_pos_start), cache,
                                          gen.max_new_tokens, eos)
            toks = np.asarray(out[0, :int(n)]).tolist()
            # trim everything after the first stop id (inclusive)
            for j, t in enumerate(toks):
                if t in stop_ids:
                    return toks[:j + 1]
            return toks

        return list(self._stream_tokens(logits, cache, gen,
                                        decode_pos_start, stopping))

    def _stream_tokens(self, logits, cache, gen: GenerationConfig,
                       decode_pos_start: int, stopping=None):
        """Stepwise decode from a completed prefill, yielding one token id at
        a time (the TextStreamer analog, cli_video_stream.py:292-309)."""
        key = jax.random.PRNGKey(gen.seed)
        out: List[int] = []
        tok = _sample(logits, gen, key)
        for i in range(gen.max_new_tokens):
            t = int(tok[0])
            out.append(t)
            yield t
            if t in gen.eos_token_ids:
                break
            if stopping is not None and stopping.should_stop(out):
                break
            key, sub = jax.random.split(key)
            logits, cache = self._step(self.params, tok,
                                       jnp.int32(decode_pos_start + i), cache)
            tok = _sample(logits, gen, sub)

    def generate_stream(self, embeds, positions, gen: GenerationConfig,
                        decode_pos_start: Optional[int] = None,
                        segment_ids=None, last_real_idx=None, stopping=None):
        """Incremental decode: yields generated token ids as they are
        produced (one jitted step per token). Used by --stream-output serving
        to print tokens live instead of waiting for the full answer."""
        B, S, _ = embeds.shape
        assert B == 1, "generation currently supports batch=1 per stream"
        cache = self.new_cache(B, self._active_len(S, gen.max_new_tokens))
        logits, cache = self._prefill(self.params, embeds, positions, cache,
                                      segment_ids, last_real_idx)
        if decode_pos_start is None:
            decode_pos_start = S
        yield from self._stream_tokens(logits, cache, gen, decode_pos_start,
                                       stopping)
