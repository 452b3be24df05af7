"""Single-process streaming engine: async device-side frame ingestion with a
device-resident memory state, overlapped with KV-cached decoding.

This replaces the reference's 4-process design (main LLM loop + listener +
frame simulator + memory manager communicating through
torch.multiprocessing Manager.list + Lock + retry loops,
cli_video_stream.py:206-327, cli_server_2gpu.py:241-402):

- ingest is ONE jitted state transition (encode clip -> consolidate ->
  write state in-place via donated buffers). JAX dispatch is asynchronous, so
  the host thread returns immediately and the next clip's host-side
  preprocessing overlaps device compute — no processes, no locks, no CPU
  tensor round-trips.
- a question reads the current state pytree (a snapshot by construction —
  functional updates never mutate the arrays a reader holds), so the
  reference's lock + 300-retry loop (vstream_arch.py:477-491) disappears.
- multi-stream: states stack along a leading axis and ingest is vmapped,
  batching encode+consolidate across streams (BASELINE config #5).
"""
from __future__ import annotations

import time
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import VStreamLLaVAConfig, VStreamQwenConfig
from ..models import vstream_llava, vstream_qwen
from ..models.flash_memory import (
    FlashState,
    am_rope_visual_positions,
    flash_stream_update,
    init_flash_state,
)
from ..models.qwen2_vit import patch_merger
from ..models.star_memory import (
    init_star_state,
    star_memory_tokens,
    star_stream_update,
)
from ..ops.pooling import qwen_temporal_pool
from ..preprocess.image import (
    clip_device_preprocess,
    clip_resize_u8,
    qwen_device_preprocess,
    qwen_resize_u8,
    smart_resize,
)
from ..preprocess.qwen_processor import build_video_prompt
from ..preprocess.tokenizer import tokenizer_image_token
from ..preprocess.prompts import conv_templates
from .generation import GenerationConfig, Generator, trim_stop_strings
from .metrics import MetricMeter, Timer, force_completion


def _save_session_state(session, path: str) -> str:
    """Persist a stream's memory to disk (orbax): state pytree, the
    published snapshot, frame count, and step counter.

    Beyond the reference — its streaming memory bank is process-lifetime
    only, never persisted (SURVEY.md §5.4): killing the server loses the
    whole stream. Here a live session checkpoints and resumes (answers work
    immediately from the restored snapshot; jits recompile on first use)."""
    import os

    import orbax.checkpoint as ocp
    snap, count = session._published
    payload = {
        "state": dict(session.state._asdict()),
        "meta": {"count": np.int64(count), "step": np.int64(session._step)},
    }
    if snap is not None:
        payload["snapshot"] = [np.asarray(x) for x in
                               jax.tree_util.tree_leaves(snap)]
    path = os.path.abspath(path)
    ocp.PyTreeCheckpointer().save(path, jax.device_get(payload), force=True)
    return path


def _load_session_state(session, path: str, state_cls, snap_builder) -> None:
    import os

    import orbax.checkpoint as ocp
    payload = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    state = state_cls(**{k: jnp.asarray(v)
                         for k, v in payload["state"].items()})
    cur = session.state
    for name in state._fields:
        want, got = getattr(cur, name).shape, getattr(state, name).shape
        assert want == got, (
            f"restored session state field {name!r} has shape {got}, this "
            f"session expects {want} — config/bank_size mismatch")
    dev = getattr(getattr(session, "placement", None), "ingest_device", None)
    session.state = (jax.device_put(state, dev) if dev is not None
                     else jax.device_put(state))
    snap = payload.get("snapshot")
    count = int(payload["meta"]["count"])
    session._published = (
        (snap_builder([jnp.asarray(x) for x in snap]), count)
        if snap is not None else (None, count))
    session._step = int(payload["meta"]["step"])


def bucket_up(real: int, cap: int) -> int:
    """Round a memory length up to one of the shape buckets of `cap`.

    Pre-saturation every ingest grows the memory, and an exact-size prompt
    would compile a FRESH assemble+prefill+decode program per answer
    (30-60 s each cold) — measured as missed ingest deadlines early in a
    live stream. Bucketing bounds the shape set; padded memory slots are
    masked out via segment ids. cli_server's prewarm derives its coverage
    from bucket_candidates, so keep the two in sync by construction."""
    for b in bucket_candidates(cap):
        if real <= b:
            return b
    return cap


def bucket_candidates(cap: int):
    """The bucket boundaries bucket_up can return for a given capacity."""
    return (max(cap // 4, 1), max(cap // 2, 1), cap)


def _stream_text(generator, tokenizer, embeds, positions, gen,
                 decode_start, segment_ids, last_real, stop_strings):
    """Shared incremental-decode driver: runs the generator's stepwise path
    and yields TEXT DELTAS (re-decoding the full output each step so
    multi-byte/multi-token characters emit only once complete). Stops at the
    first stop string, trimming it from the stream."""
    toks: List[int] = []
    emitted = ""
    for t in generator.generate_stream(
            embeds, positions, gen, decode_pos_start=decode_start,
            segment_ids=segment_ids, last_real_idx=last_real):
        toks.append(t)
        if t in gen.eos_token_ids:
            break
        text = tokenizer.decode(toks, skip_special_tokens=True)
        trimmed = trim_stop_strings(text, stop_strings)
        if trimmed != text.strip():       # a stop string appeared
            if len(trimmed) > len(emitted):
                yield trimmed[len(emitted):]
            return
        # hold back a partial trailing replacement char (incomplete utf-8)
        safe = text[:-1] if text.endswith("�") else text
        if len(safe) > len(emitted):
            yield safe[len(emitted):]
            emitted = safe
    text = trim_stop_strings(
        tokenizer.decode(toks, skip_special_tokens=True), stop_strings)
    if len(text) > len(emitted):
        yield text[len(emitted):]


class LLaVAStreamSession:
    """Streaming LLaVA-generation session (config #3 of BASELINE.json)."""

    def __init__(self, params: dict, cfg: VStreamLLaVAConfig, tokenizer,
                 clip_size: int = 1, conv_template: str = "vicuna_v1",
                 max_len: int = 4096, kv_cache_dtype=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.clip_size = clip_size
        self.conv_template = conv_template
        self.metrics = MetricMeter()
        self.state = init_star_state(
            cfg.star, cfg.projector.effective_input_dim)
        self.generator = Generator(
            params["llm"], cfg.llm, max_len=max_len,
            cache_dtype=kv_cache_dtype or jnp.bfloat16)

        def ingest(params, state, frames_u8, n_new, key):
            images = clip_device_preprocess(frames_u8)
            feats = vstream_llava.encode_frames(params, cfg, images)
            state = star_stream_update(params["ntm"], cfg.star, state, feats,
                                       n_new, key)
            # emit a (non-donated) memory snapshot so answers can run on a
            # different host thread while the next ingest donates `state`
            return state, star_memory_tokens(cfg.star, state)
        # donate the state so the update happens in-place in HBM; params are
        # jit arguments (closures would inline weights as HLO constants)
        self._ingest = jax.jit(ingest, donate_argnums=(1,))
        # (memory snapshot, frame count) published as ONE tuple: a single
        # GIL-atomic reference swap, so a concurrent answer thread never sees
        # a count from one ingest paired with the snapshot of another
        self._published = (None, 0)

        def assemble(params, mem_tokens, mem_valid, pre_ids, post_ids, n_mem):
            """Snapshot -> prompt embeddings, entirely on device (one
            dispatch instead of eager per-op round trips)."""
            from ..models.llm import embed_tokens
            from ..models.projector import project
            from ..models.star_memory import STARMemory
            from ..models.vstream_llava import pack_memory_tokens
            packed = pack_memory_tokens(STARMemory(mem_tokens, mem_valid),
                                        n_mem)
            proj = project(params["projector"], cfg.projector, packed)
            dtype = params["llm"]["embed"].dtype
            embeds = jnp.concatenate([
                embed_tokens(params["llm"], pre_ids[None]),
                proj[None].astype(dtype),
                embed_tokens(params["llm"], post_ids[None]),
            ], axis=1)
            return embeds
        self._assemble = jax.jit(assemble, static_argnums=(5,))
        self._step = 0

    def ingest_frames(self, frames: Sequence[np.ndarray]):
        """Dispatch one clip's encode+consolidate; returns without blocking."""
        with Timer(self.metrics, "memory_latency_host_preprocess"):
            imgs = clip_resize_u8(frames, self.cfg.vit.image_size)
            n = len(frames)
            pad = self.clip_size - n
            if pad > 0:
                imgs = np.concatenate([imgs, np.zeros_like(imgs[:1]).repeat(pad, 0)])
        t0 = time.perf_counter()
        self.state, snapshot = self._ingest(
            self.params, self.state, jnp.asarray(imgs), jnp.int32(n),
            jax.random.PRNGKey(self._step))
        self._step += 1
        self._published = (snapshot, self._published[1] + n)
        self.metrics.update("memory_latency_dispatch", time.perf_counter() - t0)

    def block_until_ingested(self):
        # force_completion, not block_until_ready: the latter returns before
        # the device finishes through remote-dispatch tunnels (VERDICT r2)
        force_completion(self.state.long)

    def reset(self):
        """Fresh stream state (jits stay compiled) — used after prewarming."""
        self.state = init_star_state(
            self.cfg.star, self.cfg.projector.effective_input_dim)
        self._published = (None, 0)
        self._step = 0

    def clone_fresh(self) -> "LLaVAStreamSession":
        """A new independent stream sharing this session's params and
        COMPILED jits (trace/compile once, serve many streams — the HTTP
        server's per-stream factory uses this so stream N+1 pays no new
        compiles); fresh memory state, counters and metrics."""
        import copy
        # materialize the lazy shape->compiled-fn caches BEFORE copying so
        # every clone shares them (compiled answers are stream-agnostic)
        for name in ("_fused_cache", "_assemble_cache"):
            self.__dict__.setdefault(name, {})
        c = copy.copy(self)
        c.metrics = MetricMeter()
        c.reset()
        return c

    def save_session(self, path: str) -> str:
        """Checkpoint this stream's memory for resume (beyond the reference,
        whose bank dies with the process — SURVEY.md §5.4)."""
        return _save_session_state(self, path)

    def load_session(self, path: str) -> None:
        from ..models.star_memory import STARMemory, STARState
        _load_session_state(self, path, STARState,
                            lambda leaves: STARMemory(*leaves))

    @property
    def n_frames(self) -> int:
        """Published frame count (paired with the published snapshot)."""
        return self._published[1]

    def _bucket_n_mem(self, n_mem_real: int) -> int:
        """Round the memory token count up to the shape buckets of its
        saturated size (see bucket_up). Padded slots (pack_memory_tokens
        emits invalid/zero rows past the real count) get segment -1."""
        from ..models.vstream_llava import star_valid_counts
        sat = sum(star_valid_counts(
            self.cfg, self.cfg.star.video_max_frames, streaming=True))
        return bucket_up(n_mem_real, sat)

    def _prompt_parts(self, question: str, memory, n_frames: int):
        """(embeds, positions, decode_start, seg_row, last_real_idx,
        stop_str) for one published memory snapshot."""
        from ..models.vstream_llava import star_valid_counts
        n_mem_real = sum(star_valid_counts(self.cfg, n_frames,
                                           streaming=True))
        n_mem = self._bucket_n_mem(n_mem_real)
        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        input_ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        (img_pos,) = np.where(input_ids == -200)
        p = int(img_pos[0])
        pre, post = input_ids[:p], input_ids[p + 1:]
        # bucket the question length to bound recompiles
        q_real = len(post)
        qb = -(-q_real // 32) * 32
        pad_id = self.tokenizer.pad_token_id or 0
        post_p = np.pad(post, (0, qb - q_real), constant_values=pad_id)

        embeds = self._assemble(self.params, memory.tokens,
                                memory.valid, jnp.asarray(pre),
                                jnp.asarray(post_p), n_mem)
        S = embeds.shape[1]
        # layout [pre | n_mem memory slots (n_mem_real valid) | post];
        # padded slots: segment -1 (invisible), position 0 (unused);
        # real post tokens keep positions continuing after REAL memory
        positions = np.zeros(S, np.int64)
        seg = np.full(S, -1, np.int32)
        positions[:p] = np.arange(p)
        seg[:p] = 0
        positions[p:p + n_mem_real] = p + np.arange(n_mem_real)
        seg[p:p + n_mem_real] = 0
        post_pos0 = p + n_mem_real
        positions[p + n_mem:p + n_mem + q_real] = \
            post_pos0 + np.arange(q_real)
        seg[p + n_mem:p + n_mem + q_real] = 0
        return (embeds, jnp.asarray(positions)[None], post_pos0 + q_real,
                seg, p + n_mem + q_real - 1, conv.stop_str)

    def _answer_fused_fn(self, n_mem: int, max_new: int, cache_len: int):
        """ONE jit per (memory bucket, decode budget): assembly + prefill +
        fused decode loop (the Qwen session's single-dispatch answer,
        mirrored for the LLaVA family)."""
        key = ("fused", n_mem, max_new, cache_len)
        if key in getattr(self, "_fused_cache", {}):
            return self._fused_cache[key]
        if not hasattr(self, "_fused_cache"):
            self._fused_cache = {}
        cfg = self.cfg
        gen_obj = self.generator
        llm = cfg.llm

        def fused(params, mem_tokens, mem_valid, pre_ids, post_ids,
                  positions, seg_row, last_real, decode_start, eos_ids):
            from ..models.layers import KVCache
            from ..models.llm import embed_tokens
            from ..models.projector import project
            from ..models.star_memory import STARMemory
            from ..models.vstream_llava import pack_memory_tokens
            packed = pack_memory_tokens(STARMemory(mem_tokens, mem_valid),
                                        n_mem)
            proj = project(params["projector"], cfg.projector, packed)
            dtype = params["llm"]["embed"].dtype
            embeds = jnp.concatenate([
                embed_tokens(params["llm"], pre_ids[None]),
                proj[None].astype(dtype),
                embed_tokens(params["llm"], post_ids[None]),
            ], axis=1)
            cache = KVCache.create(llm.num_layers, 1, llm.num_kv_heads,
                                   cache_len, llm.head_dim,
                                   gen_obj.cache_dtype)
            logits, cache = gen_obj.prefill_fn(
                params["llm"], embeds, positions[None], cache,
                seg_row[None], last_real)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out, n, _ = gen_obj.decode_loop_fn(
                params["llm"], first, decode_start, cache, max_new, eos_ids)
            return out, n

        fn = jax.jit(fused)
        self._fused_cache[key] = fn
        return fn

    def answer(self, question: str,
               gen: Optional[GenerationConfig] = None) -> str:
        with Timer(self.metrics, "llm_latency"):
            with Timer(self.metrics, "llm_latency_memoryio"):
                # one read of the published (snapshot, count) pair: the state
                # pytree itself may be donated by a concurrent ingest thread,
                # and reading snapshot/count separately could pair a new count
                # with an old snapshot
                memory, n_frames = self._published
                assert memory is not None, "no frames ingested yet"
            gen = gen or GenerationConfig(
                max_new_tokens=128,
                eos_token_ids=(self.tokenizer.eos_token_id,))
            greedy = gen.temperature <= 0.0 or gen.top_k == 1
            if (greedy and gen.speculative_k == 0
                    and gen.preemptible_chunk == 0):
                out = self._answer_fused(question, memory, n_frames, gen)
                stop_str = conv_templates[self.conv_template].stop_str
            else:
                embeds, positions, decode_start, seg, last_real, stop_str = \
                    self._prompt_parts(question, memory, n_frames)
                ctx = None
                if gen.speculative_k > 0:
                    conv = conv_templates[self.conv_template].copy()
                    conv.append_message(conv.roles[0],
                                        "<image>\n" + question)
                    conv.append_message(conv.roles[1], None)
                    ids = tokenizer_image_token(conv.get_prompt(),
                                                self.tokenizer)
                    ctx = ids[ids >= 0]          # text ids only
                out = self.generator.generate(
                    embeds, positions, gen, decode_pos_start=decode_start,
                    segment_ids=jnp.asarray(seg)[None],
                    last_real_idx=last_real, context_ids=ctx)
        text = self.tokenizer.decode(out, skip_special_tokens=True)
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or (stop_str,))

    def _answer_fused(self, question: str, memory, n_frames: int,
                      gen: "GenerationConfig") -> List[int]:
        from ..models.vstream_llava import star_valid_counts
        n_mem_real = sum(star_valid_counts(self.cfg, n_frames,
                                           streaming=True))
        n_mem = self._bucket_n_mem(n_mem_real)
        conv = conv_templates[self.conv_template].copy()
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        input_ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        (img_pos,) = np.where(input_ids == -200)
        p = int(img_pos[0])
        pre, post = input_ids[:p], input_ids[p + 1:]
        q_real = len(post)
        qb = -(-q_real // 32) * 32
        pad_id = self.tokenizer.pad_token_id or 0
        post_p = np.pad(post, (0, qb - q_real), constant_values=pad_id)
        S = p + n_mem + qb
        positions = np.zeros(S, np.int64)
        seg = np.full(S, -1, np.int32)
        positions[:p] = np.arange(p)
        seg[:p] = 0
        positions[p:p + n_mem_real] = p + np.arange(n_mem_real)
        seg[p:p + n_mem_real] = 0
        post_pos0 = p + n_mem_real
        positions[p + n_mem:p + n_mem + q_real] = \
            post_pos0 + np.arange(q_real)
        seg[p + n_mem:p + n_mem + q_real] = 0
        last_real = p + n_mem + q_real - 1
        assert S + gen.max_new_tokens <= self.generator.max_len
        cache_len = self.generator._active_len(S, gen.max_new_tokens)
        fn = self._answer_fused_fn(n_mem, gen.max_new_tokens, cache_len)
        eos_ids = sorted(set(gen.eos_token_ids))
        out, n = fn(self.params, memory.tokens, memory.valid,
                    jnp.asarray(pre), jnp.asarray(post_p),
                    jnp.asarray(positions), jnp.asarray(seg),
                    jnp.int32(last_real), jnp.int32(post_pos0 + q_real),
                    jnp.asarray(eos_ids, jnp.int32))
        toks = np.asarray(out[0, :int(n)]).tolist()
        for j, t in enumerate(toks):
            if t in gen.eos_token_ids:
                return toks[:j + 1]
        return toks

    def answer_stream(self, question: str,
                      gen: Optional[GenerationConfig] = None):
        """Incremental answer: yields text deltas as tokens decode (the
        reference's TextStreamer UX, cli_video_stream.py:292-309)."""
        memory, n_frames = self._published
        assert memory is not None, "no frames ingested yet"
        embeds, positions, decode_start, seg, last_real, stop_str = \
            self._prompt_parts(question, memory, n_frames)
        gen = gen or GenerationConfig(
            max_new_tokens=128,
            eos_token_ids=(self.tokenizer.eos_token_id,))
        yield from _stream_text(
            self.generator, self.tokenizer, embeds, positions, gen,
            decode_start, jnp.asarray(seg)[None], last_real,
            tuple(gen.stop_strings) or (stop_str,))


class QwenStreamSession:
    """Streaming Qwen-generation session (cli_server_2gpu.py replacement)."""

    def __init__(self, params: dict, cfg: VStreamQwenConfig, tokenizer,
                 frame_hw=(224, 224), clip_size: int = 2,
                 bank_size: int = 1024, max_len: int = 16384,
                 max_pixels: int = 4 * 224 * 224, kv_cache_dtype=None,
                 placement=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        assert clip_size % 2 == 0, (
            "Qwen streaming ingests temporal frame PAIRS; clip_size must be "
            f"even (got {clip_size})")
        self.clip_size = clip_size
        self.metrics = MetricMeter()
        # disaggregated serve (parallel/serve.py): vision tower + memory on
        # the ingest device, TP decoder + merger on the decode mesh — the
        # slice mapping of the reference's 2-GPU split
        # (cli_server_2gpu.py:197-239). None = everything on one chip.
        self.placement = placement
        if placement is not None:
            from ..parallel.serve import place_qwen_serve_params
            self._ingest_params, self.params = place_qwen_serve_params(
                params, placement)
        else:
            self._ingest_params = params
            self.params = params
        self.generator = Generator(
            self.params["llm"], cfg.llm, max_len=max_len,
            cache_dtype=kv_cache_dtype or jnp.bfloat16)

        h, w = frame_hw
        self.resize_hw = smart_resize(h, w, factor=56, max_pixels=max_pixels)
        gh, gw = self.resize_hw[0] // 14, self.resize_hw[1] // 14
        self.grid_hw = (gh, gw)
        self.p_full = gh * gw
        self.p_small = (gh // 2) * (gw // 2)
        self._bank_size = bank_size
        self.state = init_flash_state(cfg.flash_memory, self.p_full,
                                      self.p_small, cfg.vit.hidden_size,
                                      bank_size=bank_size)
        if placement is not None:
            self.state = jax.device_put(self.state, placement.ingest_device)
        # ((spa_pos, tem_pos, video_embeds), frame-pair count) published as
        # one tuple — single reference swap, safe for a concurrent answer
        self._published = (None, 0)
        self._step = 0

        t_clip = clip_size // 2
        grid = (t_clip, gh, gw)
        S = t_clip * gh * gw
        S_small = S // 4

        def ingest(params, state, frames_u8, n_new, key):
            # fused device preprocess: uint8 -> normalized patch stream
            patches = qwen_device_preprocess(frames_u8)
            # dual-resolution encode; attention batched per frame (attention
            # is block-diagonal per temporal frame, no padded [S,S] masking)
            small, small_grid = qwen_temporal_pool(patches, grid)
            allp = jnp.concatenate([patches, small], axis=0)
            from ..models.qwen2_vit import qwen_vit_blocks_frames
            hidden = qwen_vit_blocks_frames(
                params["vit"], cfg.vit, allp,
                t_full=t_clip, hw_full=(gh, gw),
                t_small=t_clip, hw_small=(gh // 2, gw // 2))
            D = cfg.vit.hidden_size
            x = hidden[:S].reshape(t_clip, self.p_full, D)
            sx = hidden[S:S + S_small].reshape(t_clip, self.p_small, D)
            state, out = flash_stream_update(cfg.flash_memory, state, x, sx,
                                             n_new, key)
            # snapshot RAW memory rows; the patch merger runs at answer time
            # inside the assemble/fused jits. The reference pre-merges per
            # clip (embed_new_video_clip, realtime.py:616-620) but answers
            # are ~100x rarer and ~30x longer than ingests here, so the
            # ~4 ms full-capacity merger belongs on the answer side — it
            # costs ~1% of an answer vs ~25% of the 20 ms ingest budget.
            return state, (out.spa_positions, out.tem_positions,
                           out.spa_x, out.tem_x)

        self._ingest = jax.jit(ingest, donate_argnums=(1,))

    def ingest_frames(self, frames: Sequence[np.ndarray]):
        assert len(frames) <= self.clip_size
        with Timer(self.metrics, "memory_latency_host_preprocess"):
            arr = list(qwen_resize_u8(frames, self.resize_hw,
                                      pad_to_even=False))
            n = len(arr)
            while len(arr) % 2 or len(arr) < self.clip_size:
                arr.append(arr[-1])
            frames_u8 = np.stack(arr)
        t0 = time.perf_counter()
        # frame-pair count actually ingested
        n_pairs = -(-n // 2)
        if self.placement is not None:
            frames_dev = jax.device_put(frames_u8,
                                        self.placement.ingest_device)
        else:
            frames_dev = jnp.asarray(frames_u8)
        self.state, snapshot = self._ingest(
            self._ingest_params, self.state, frames_dev,
            jnp.int32(n_pairs), jax.random.PRNGKey(self._step))
        self._step += 1
        self._published = (snapshot, self._published[1] + n_pairs)
        self.metrics.update("memory_latency_dispatch", time.perf_counter() - t0)

    def block_until_ingested(self):
        # force_completion, not block_until_ready: the latter returns before
        # the device finishes through remote-dispatch tunnels (VERDICT r2)
        force_completion(self.state.tem_x)

    def reset(self):
        """Fresh stream state (jits stay compiled) — used after prewarming."""
        self.state = init_flash_state(
            self.cfg.flash_memory, self.p_full, self.p_small,
            self.cfg.vit.hidden_size, bank_size=self._bank_size)
        if self.placement is not None:
            self.state = jax.device_put(self.state,
                                        self.placement.ingest_device)
        self._published = (None, 0)
        self._step = 0

    def _snapshot_to_decode(self, snapshot):
        """Disaggregated handover: move the published memory snapshot from
        the ingest device to the decode mesh (replicated) — the ICI analog
        of the reference's CPU Manager.list round-trip
        (vstream_qwen2vl_realtime.py:623-627). No-op on one chip."""
        if self.placement is None:
            return snapshot
        from ..parallel.sharding import replicated
        rep = replicated(self.placement.decode_mesh)
        return tuple(jax.device_put(x, rep) for x in snapshot)

    def clone_fresh(self) -> "QwenStreamSession":
        """A new independent stream sharing this session's params and
        COMPILED jits (trace/compile once, serve many streams — the HTTP
        server's per-stream factory uses this so stream N+1 pays no new
        compiles); fresh memory state, counters and metrics."""
        import copy
        # materialize the lazy shape->compiled-fn caches BEFORE copying so
        # every clone shares them (compiled answers are stream-agnostic)
        for name in ("_fused_cache", "_assemble_cache"):
            self.__dict__.setdefault(name, {})
        c = copy.copy(self)
        c.metrics = MetricMeter()
        c.reset()
        return c

    def save_session(self, path: str) -> str:
        """Checkpoint this stream's memory for resume (beyond the reference,
        whose bank dies with the process — SURVEY.md §5.4)."""
        return _save_session_state(self, path)

    def load_session(self, path: str) -> None:
        _load_session_state(self, path, FlashState, tuple)

    @property
    def n_frames(self) -> int:
        """Published frame-pair count (paired with the published snapshot)."""
        return self._published[1]

    def _assemble_fn(self, t_dam: int, t_csm: int, P: int, Qb: int):
        """One jitted snapshot->prompt assembly per (memory size, prompt
        bucket) — answers become assemble + prefill + decode-loop dispatches."""
        key = (t_dam, t_csm, P, Qb)
        if key in getattr(self, "_assemble_cache", {}):
            return self._assemble_cache[key]
        if not hasattr(self, "_assemble_cache"):
            self._assemble_cache = {}
        cfg = self.cfg
        fm = cfg.flash_memory
        gh, gw = self.grid_hw
        def assemble(params, spa_pos, tem_pos, spa_x, tem_x, pre_ids,
                     post_ids, q_real):
            from ..models.llm import embed_tokens
            # merge only the bucketed t_dam/t_csm slice (snapshots carry
            # full-capacity raw rows): [n_dam_tok + n_csm_tok, llm] == n_vis
            D = spa_x.shape[-1]
            vis = patch_merger(params["vit"], jnp.concatenate([
                spa_x[:t_dam].reshape(-1, D),
                tem_x[:t_csm].astype(spa_x.dtype).reshape(-1, D)]))
            vis_pos = am_rope_visual_positions(
                spa_pos[:t_dam], tem_pos[:t_csm], (gh, gw), (gh // 2, gw // 2))
            dtype = params["llm"]["embed"].dtype
            embeds = jnp.concatenate([
                embed_tokens(params["llm"], pre_ids[None]),
                vis[None].astype(dtype),
                embed_tokens(params["llm"], post_ids[None]),
            ], axis=1)
            # 3D rope positions with AM-RoPE visual block
            pre_pos = jnp.broadcast_to(jnp.arange(P)[None], (3, P))
            vpos = vis_pos + P
            st = jnp.max(vpos) + 1
            tail = st + jnp.broadcast_to(jnp.arange(Qb)[None], (3, Qb))
            pos = jnp.concatenate([pre_pos, vpos, tail], axis=1)[:, None, :]
            decode_start = st + q_real
            return embeds, pos, decode_start

        fn = jax.jit(assemble)
        self._assemble_cache[key] = fn
        return fn

    @staticmethod
    def _bucket_t(real: int, cap: int) -> int:
        return bucket_up(real, cap)

    def _prompt_host(self, question: str, n_frames: int) -> dict:
        """Host-side prompt pieces for one snapshot: bucketed memory sizes,
        pre/post token ids (question bucketed to 32s), segment row (padded
        DAM/CSM slots get id -1 so attention never sees them)."""
        fm = self.cfg.flash_memory
        t_dam_real = min(n_frames, fm.dam_grid_len)
        t_csm_real = min(n_frames, fm.csm_grid_len)
        t_dam = self._bucket_t(t_dam_real, fm.dam_grid_len)
        t_csm = self._bucket_t(t_csm_real, fm.csm_grid_len)
        n_dam = t_dam * self.p_full // 4
        n_csm = t_csm * self.p_small // 4
        n_vis = n_dam + n_csm

        input_ids, span = build_video_prompt(
            self.cfg, self.tokenizer, question, n_video_tokens=n_vis)
        start, _ = span
        pre = input_ids[:start]
        post = input_ids[start + n_vis:]
        q_real = len(post)
        Qb = -(-q_real // 32) * 32
        pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        post_p = np.pad(post, (0, Qb - q_real), constant_values=pad_id)
        P = len(pre)
        S = P + n_vis + Qb
        vis_valid = np.concatenate([
            np.arange(n_dam) < t_dam_real * self.p_full // 4,
            np.arange(n_csm) < t_csm_real * self.p_small // 4])
        seg_row = np.concatenate([
            np.zeros(P, np.int32),
            np.where(vis_valid, 0, -1).astype(np.int32),
            np.zeros(q_real, np.int32),
            np.full(S - P - n_vis - q_real, -1, np.int32)])
        return {"t_dam": t_dam, "t_csm": t_csm, "P": P, "Qb": Qb, "S": S,
                "n_vis": n_vis, "pre": pre, "post_p": post_p,
                "q_real": q_real, "seg_row": seg_row,
                "last_real": P + n_vis + q_real - 1}

    def _prompt_parts(self, question: str, snapshot, n_frames: int,
                      h: Optional[dict] = None):
        """(embeds, positions, decode_start, seg_row, last_real_idx) for one
        stream's published snapshot."""
        spa_pos, tem_pos, spa_x, tem_x = snapshot
        h = h or self._prompt_host(question, n_frames)
        fn = self._assemble_fn(h["t_dam"], h["t_csm"], h["P"], h["Qb"])
        embeds, positions, decode_start = fn(
            self.params, spa_pos, tem_pos, spa_x, tem_x,
            jnp.asarray(h["pre"]), jnp.asarray(h["post_p"]),
            jnp.int32(h["q_real"]))
        return (embeds, positions, decode_start, h["seg_row"],
                h["last_real"])

    def _answer_fused_fn(self, t_dam: int, t_csm: int, P: int, Qb: int,
                         max_new: int, cache_len: int):
        """ONE jit for a whole greedy answer: snapshot->embeds assembly,
        prefill, and the fused decode loop. Per-dispatch latency through a
        remote-device tunnel is tens of ms, so collapsing the
        assemble/prefill/argmax/decode-loop dispatches into one is worth
        ~100 ms of answer latency."""
        key = ("fused", t_dam, t_csm, P, Qb, max_new, cache_len)
        if key in getattr(self, "_assemble_cache", {}):
            return self._assemble_cache[key]
        if not hasattr(self, "_assemble_cache"):
            self._assemble_cache = {}
        cfg = self.cfg
        fm = cfg.flash_memory
        gh, gw = self.grid_hw
        gen_obj = self.generator
        llm = cfg.llm

        def fused(params, spa_pos, tem_pos, spa_x, tem_x, pre_ids,
                  post_ids, q_real, seg_row, last_real, eos_ids):
            from ..models.layers import KVCache
            from ..models.llm import embed_tokens
            D = spa_x.shape[-1]
            vis = patch_merger(params["vit"], jnp.concatenate([
                spa_x[:t_dam].reshape(-1, D),
                tem_x[:t_csm].astype(spa_x.dtype).reshape(-1, D)]))
            vis_pos = am_rope_visual_positions(
                spa_pos[:t_dam], tem_pos[:t_csm], (gh, gw),
                (gh // 2, gw // 2))
            dtype = params["llm"]["embed"].dtype
            embeds = jnp.concatenate([
                embed_tokens(params["llm"], pre_ids[None]),
                vis[None].astype(dtype),
                embed_tokens(params["llm"], post_ids[None]),
            ], axis=1)
            pre_pos = jnp.broadcast_to(jnp.arange(P)[None], (3, P))
            vpos = vis_pos + P
            st = jnp.max(vpos) + 1
            tail = st + jnp.broadcast_to(jnp.arange(Qb)[None], (3, Qb))
            pos = jnp.concatenate([pre_pos, vpos, tail], axis=1)[:, None, :]
            decode_start = st + q_real
            cache = KVCache.create(llm.num_layers, 1, llm.num_kv_heads,
                                   cache_len, llm.head_dim,
                                   gen_obj.cache_dtype)
            logits, cache = gen_obj.prefill_fn(
                params["llm"], embeds, pos, cache, seg_row[None], last_real)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            out, n, _ = gen_obj.decode_loop_fn(
                params["llm"], first, decode_start, cache, max_new, eos_ids)
            return out, n

        fn = jax.jit(fused)
        self._assemble_cache[key] = fn
        return fn

    def _answer_fused(self, snapshot, n_frames: int, question: str,
                      gen: "GenerationConfig") -> List[int]:
        h = self._prompt_host(question, n_frames)
        assert h["S"] + gen.max_new_tokens <= self.generator.max_len, (
            f"prompt ({h['S']}) + max_new_tokens ({gen.max_new_tokens}) "
            f"exceeds the KV capacity ({self.generator.max_len})")
        cache_len = self.generator._active_len(h["S"], gen.max_new_tokens)
        fn = self._answer_fused_fn(h["t_dam"], h["t_csm"], h["P"], h["Qb"],
                                   gen.max_new_tokens, cache_len)
        spa_pos, tem_pos, spa_x, tem_x = snapshot
        eos_ids = sorted(set(gen.eos_token_ids))
        out, n = fn(self.params, spa_pos, tem_pos, spa_x, tem_x,
                    jnp.asarray(h["pre"]), jnp.asarray(h["post_p"]),
                    jnp.int32(h["q_real"]), jnp.asarray(h["seg_row"]),
                    jnp.int32(h["last_real"]),
                    jnp.asarray(eos_ids, jnp.int32))
        toks = np.asarray(out[0, :int(n)]).tolist()
        for j, t in enumerate(toks):
            if t in gen.eos_token_ids:
                return toks[:j + 1]
        return toks

    def answer(self, question: str,
               gen: Optional[GenerationConfig] = None) -> str:
        with Timer(self.metrics, "llm_latency"):
            with Timer(self.metrics, "llm_latency_memoryio"):
                # one read of the published (snapshot, count) pair: snapshot
                # arrays are ingest OUTPUTS (never donated), and the paired
                # count guarantees t_dam/t_csm match this exact snapshot even
                # if an ingest thread publishes concurrently
                snapshot, n_frames = self._published
                assert snapshot is not None, "no frames ingested yet"
            return self.answer_snapshot(snapshot, n_frames, question, gen)

    def answer_snapshot(self, snapshot, n_frames: int, question: str,
                        gen: Optional[GenerationConfig] = None) -> str:
        """Answer against an EXPLICIT (snapshot, count) pair without touching
        session state — safe for concurrent callers holding different
        snapshots (the multi-stream engine answers stream i while stream j's
        question is in flight on another thread)."""
        gen = gen or GenerationConfig(
            max_new_tokens=128,
            eos_token_ids=(self.tokenizer.eos_token_id,))
        snapshot = self._snapshot_to_decode(snapshot)
        greedy = gen.temperature <= 0.0 or gen.top_k == 1
        if greedy and gen.speculative_k == 0 and gen.preemptible_chunk == 0:
            # greedy: whole answer in ONE dispatch (assemble+prefill+decode)
            out = self._answer_fused(snapshot, n_frames, question, gen)
        else:
            h = self._prompt_host(question, n_frames)
            embeds, positions, decode_start, seg_row, last_real = \
                self._prompt_parts(question, snapshot, n_frames, h=h)
            # prompt-lookup speculation drafts from the question text
            ctx = (np.concatenate([h["pre"],
                                   h["post_p"][:h["q_real"]]])
                   if gen.speculative_k > 0 else None)
            out = self.generator.generate(
                embeds, positions, gen, decode_pos_start=decode_start,
                segment_ids=jnp.asarray(seg_row)[None],
                last_real_idx=last_real, context_ids=ctx)
        text = self.tokenizer.decode(out, skip_special_tokens=True)
        # ChatML assistant turns terminate on <|im_end|>
        return trim_stop_strings(
            text, tuple(gen.stop_strings) or ("<|im_end|>",))

    def answer_stream(self, question: str,
                      gen: Optional[GenerationConfig] = None):
        """Incremental answer: yields text deltas as tokens decode (the
        reference's TextStreamer UX, cli_video_stream.py:292-309)."""
        snapshot, n_frames = self._published
        assert snapshot is not None, "no frames ingested yet"
        snapshot = self._snapshot_to_decode(snapshot)
        embeds, positions, decode_start, seg_row, last_real = \
            self._prompt_parts(question, snapshot, n_frames)
        gen = gen or GenerationConfig(
            max_new_tokens=128,
            eos_token_ids=(self.tokenizer.eos_token_id,))
        yield from _stream_text(
            self.generator, self.tokenizer, embeds, positions, gen,
            decode_start, jnp.asarray(seg_row)[None], last_real,
            tuple(gen.stop_strings) or ("<|im_end|>",))


class QwenMultiStreamEngine:
    """N concurrent Qwen-family streams: FlashStates stack on a leading axis,
    the dual-res encode + Flash memory update runs vmapped (one launch for
    all streams), and answer_all serves every stream's question through one
    shared batched decode (BASELINE config #5, flagship family)."""

    def __init__(self, params: dict, cfg: VStreamQwenConfig, tokenizer,
                 n_streams: int, frame_hw=(224, 224), clip_size: int = 2,
                 bank_size: int = 256, max_len: int = 8192,
                 max_pixels: int = 4 * 224 * 224):
        self.n_streams = n_streams
        self.sess = QwenStreamSession(params, cfg, tokenizer,
                                      frame_hw=frame_hw, clip_size=clip_size,
                                      bank_size=bank_size, max_len=max_len,
                                      max_pixels=max_pixels)
        one = self.sess.state
        self.states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_streams, *x.shape)).copy(),
            one)
        ingest_one = self.sess._ingest.__wrapped__   # unjitted fn
        self._vingest = jax.jit(
            jax.vmap(ingest_one, in_axes=(None, 0, 0, 0, 0)),
            donate_argnums=(1,))
        self._snapshots = None
        self._n_frames = [0] * n_streams     # host-tracked frame-pair counts
        self._step = 0

    def ingest(self, clips: Sequence[Sequence[np.ndarray]]):
        """One clip per stream (ragged ok; empty clips are no-ops)."""
        assert len(clips) == self.n_streams
        sess = self.sess
        nh, nw = sess.resize_hw
        frames, ns = [], []
        for clip in clips:
            # same invariant as QwenStreamSession.ingest_frames: a clip
            # longer than clip_size would advance _n_frames past what was
            # actually ingested, desynchronizing t_dam/t_csm and timestamps
            assert len(clip) <= sess.clip_size, (
                f"clip of {len(clip)} frames > clip_size {sess.clip_size}")
            arr = (list(qwen_resize_u8(clip, (nh, nw), pad_to_even=False))
                   if clip else [])
            n = len(arr)
            while len(arr) % 2 or len(arr) < sess.clip_size:
                arr.append(arr[-1] if arr else
                           np.zeros((nh, nw, 3), np.uint8))
            frames.append(np.stack(arr[:sess.clip_size]))
            ns.append(-(-n // 2) if n else 0)
        keys = jax.random.split(jax.random.PRNGKey(self._step), self.n_streams)
        self._step += 1
        self.states, self._snapshots = self._vingest(
            self.sess.params, self.states, jnp.asarray(np.stack(frames)),
            jnp.asarray(ns, jnp.int32), keys)
        for i, n in enumerate(ns):
            self._n_frames[i] += int(n)

    def block(self):
        force_completion(self.states.tem_x)

    def answer(self, stream_idx: int, question: str,
               gen: Optional[GenerationConfig] = None) -> str:
        # explicit-snapshot path: never mutates the shared session, so a
        # second thread answering stream j mid-call cannot corrupt stream
        # i's state/published pair
        snapshot = jax.tree.map(lambda x: x[stream_idx], self._snapshots)
        return self.sess.answer_snapshot(snapshot,
                                         self._n_frames[stream_idx],
                                         question, gen)

    def answer_all(self, questions: Sequence[str],
                   gen: Optional[GenerationConfig] = None) -> List[str]:
        """All streams share one batched prefill + fused decode loop.

        Every stream has the same memory capacity, so once saturated the
        prompts share a shape; before saturation per-stream visual token
        counts may differ and answers fall back to per-stream decode."""
        sess = self.sess
        fm = sess.cfg.flash_memory
        # memory sizes BUCKET (QwenStreamSession._bucket_t), so streams with
        # different frame counts often still share a prompt shape
        t_dams = {sess._bucket_t(min(c, fm.dam_grid_len), fm.dam_grid_len)
                  for c in self._n_frames}
        t_csms = {sess._bucket_t(min(c, fm.csm_grid_len), fm.csm_grid_len)
                  for c in self._n_frames}
        if len(t_dams) > 1 or len(t_csms) > 1:
            return [self.answer(i, q, gen) for i, q in enumerate(questions)]

        per = []
        for i, q in enumerate(questions):
            snapshot = jax.tree.map(lambda x: x[i], self._snapshots)
            per.append(sess._prompt_parts(q, snapshot, self._n_frames[i]))
        S = max(e.shape[1] for e, *_ in per)
        B = self.n_streams
        D = per[0][0].shape[-1]
        embeds = jnp.zeros((B, S, D), per[0][0].dtype)
        positions = jnp.zeros((3, B, S), jnp.int32)
        segments = jnp.full((B, S), -1, jnp.int32)
        starts, last_idx = [], []
        for b, (e, p, dstart, seg_row, last_real) in enumerate(per):
            n = e.shape[1]
            embeds = embeds.at[b, S - n:].set(e[0])
            positions = positions.at[:, b, S - n:].set(p[:, 0])
            segments = segments.at[b, S - n:].set(jnp.asarray(seg_row))
            starts.append(int(dstart))
            last_idx.append(S - n + last_real)
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(sess.tokenizer.eos_token_id,))
        outs = sess.generator.generate_batch(
            embeds, positions, segments, gen,
            jnp.asarray(starts, jnp.int32),
            last_real_idx=jnp.asarray(last_idx, jnp.int32))
        stops = tuple(gen.stop_strings) or ("<|im_end|>",)
        return [trim_stop_strings(
                    sess.tokenizer.decode(o, skip_special_tokens=True), stops)
                for o in outs]


class ThreadedIngestor:
    """Paced frame ingestion on a background host thread.

    The device-side design needs no locks (functional state snapshots), but a
    long answer blocks the *host* thread that paces ingestion. This restores
    the reference's producer/consumer concurrency (cli_video_stream.py's
    simulator+manager processes) with one thread instead of three processes:
    the thread paces clips at the target fps and dispatches ingest jits;
    answer() runs on the caller's thread concurrently. Python-level handoff
    is a single reference swap (GIL-atomic); readers always see a complete
    state pytree.
    """

    def __init__(self, session, frame_iter, fps: float, clip_size: int):
        import queue
        import threading
        self.session = session
        self.frames = list(frame_iter)
        self.fps = fps
        self.clip_size = clip_size
        self.frames_ingested = 0
        self.missed_deadlines = 0
        self._stop = threading.Event()
        self._done = threading.Event()
        # (snapshot, deadline) pairs for the deadline watcher
        self._pending: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._watcher = threading.Thread(target=self._watch, daemon=True)

    def start(self):
        self._thread.start()
        self._watcher.start()
        return self

    def _run(self):
        start = time.perf_counter()
        i = 0
        while i < len(self.frames) and not self._stop.is_set():
            clip = self.frames[i:i + self.clip_size]
            deadline = start + (i + len(clip)) / self.fps if self.fps > 0 \
                else 0.0
            self.session.ingest_frames(clip)
            i += len(clip)
            self.frames_ingested = i
            # deadlines count against DEVICE completion of this clip's
            # published snapshot, verified by the watcher thread below —
            # pacing here stays dispatch-only so uploads and device compute
            # of consecutive clips pipeline instead of serializing on a
            # per-clip fence
            self._pending.put((self.session._published[0], deadline))
            now = time.perf_counter()
            if self.fps > 0 and deadline > now:
                time.sleep(deadline - now)
        self._pending.put(None)
        self.session.block_until_ingested()
        self._done.set()

    def _watch(self):
        """Fence each published snapshot in dispatch order (the donated
        state chains clip i after i-1, so completion of i's snapshot implies
        every earlier clip finished) and count a miss when the DEVICE
        completed after the clip's wall deadline. block_until_ready is
        unreliable through remote-dispatch tunnels (VERDICT r2); a host
        scalar fetch is the only trustworthy completion signal."""
        while True:
            item = self._pending.get()
            if item is None or self._stop.is_set():
                return
            snapshot, deadline = item
            force_completion(snapshot)
            if self.fps > 0 and time.perf_counter() > deadline + 1e-3:
                self.missed_deadlines += 1

    def wait(self, timeout=None) -> bool:
        done = self._done.wait(timeout)
        if done and self._thread.is_alive():
            self._thread.join()
            self._watcher.join()
        return done

    def stop(self):
        self._stop.set()
        self._pending.put(None)
        self._thread.join()
        self._watcher.join(timeout=10)


class MultiStreamEngine:
    """Batched ingest for N concurrent LLaVA-family streams: states stack on a
    leading axis, encode+consolidate runs vmapped (one launch for all
    streams). answer_all serves every stream through one shared batched
    decode."""

    def __init__(self, params: dict, cfg: VStreamLLaVAConfig, tokenizer,
                 n_streams: int, clip_size: int = 1, max_len: int = 4096):
        self.params = params
        self.cfg = cfg
        self.n_streams = n_streams
        self.clip_size = clip_size
        self.tokenizer = tokenizer
        self.metrics = MetricMeter()
        self.generator = Generator(params["llm"], cfg.llm, max_len=max_len)
        one = init_star_state(cfg.star, cfg.projector.effective_input_dim)
        self.states = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n_streams, *x.shape)).copy(), one)

        def ingest_one(params, state, frames_u8, n_new, key):
            images = clip_device_preprocess(frames_u8)
            feats = vstream_llava.encode_frames(params, cfg, images)
            return star_stream_update(params["ntm"], cfg.star, state, feats,
                                      n_new, key)
        self._ingest = jax.jit(
            jax.vmap(ingest_one, in_axes=(None, 0, 0, 0, 0)),
            donate_argnums=(1,))
        self._step = 0

    def ingest(self, clips: Sequence[Sequence[np.ndarray]]):
        """clips: one frame list per stream (may be ragged; padded+masked)."""
        assert len(clips) == self.n_streams
        imgs, ns = [], []
        for frames in clips:
            x = clip_resize_u8(frames, self.cfg.vit.image_size) if frames \
                else np.zeros((0, self.cfg.vit.image_size,
                               self.cfg.vit.image_size, 3), np.uint8)
            n = x.shape[0]
            if n < self.clip_size:
                pad = np.zeros((self.clip_size - n, *x.shape[1:]), np.uint8)
                x = np.concatenate([x, pad]) if n else pad
            imgs.append(x[:self.clip_size])
            ns.append(n)
        keys = jax.random.split(jax.random.PRNGKey(self._step), self.n_streams)
        self._step += 1
        t0 = time.perf_counter()
        self.states = self._ingest(self.params, self.states,
                                   jnp.asarray(np.stack(imgs)),
                                   jnp.asarray(ns, jnp.int32), keys)
        self.metrics.update("memory_latency_dispatch", time.perf_counter() - t0)

    def block(self):
        force_completion(self.states.long)

    def _prompt_embeds(self, stream_idx: int, question: str):
        state = jax.tree.map(lambda x: x[stream_idx], self.states)
        memory = star_memory_tokens(self.cfg.star, state)
        n_frames = int(state.n_frames)
        conv = conv_templates["vicuna_v1"].copy()
        conv.append_message(conv.roles[0], "<image>\n" + question)
        conv.append_message(conv.roles[1], None)
        input_ids = tokenizer_image_token(conv.get_prompt(), self.tokenizer)
        return vstream_llava.build_multimodal_embeds(
            self.params, self.cfg, input_ids, memory, n_frames,
            streaming=True)

    def answer(self, stream_idx: int, question: str,
               gen: Optional[GenerationConfig] = None) -> str:
        embeds, positions = self._prompt_embeds(stream_idx, question)
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        out = self.generator.generate(embeds, positions, gen)
        text = self.tokenizer.decode(out, skip_special_tokens=True)
        return trim_stop_strings(
            text,
            tuple(gen.stop_strings) or (conv_templates["vicuna_v1"].stop_str,))

    def answer_all(self, questions: Sequence[str],
                   gen: Optional[GenerationConfig] = None) -> List[str]:
        """Shared batched decode across all streams (BASELINE config #5):
        one prefill + one fused decode loop serves every stream's question."""
        assert len(questions) == self.n_streams
        per = [self._prompt_embeds(i, q) for i, q in enumerate(questions)]
        S = max(e.shape[1] for e, _ in per)
        D = per[0][0].shape[-1]
        B = self.n_streams
        embeds = jnp.zeros((B, S, D), per[0][0].dtype)
        positions = jnp.zeros((B, S), jnp.int32)
        segments = jnp.full((B, S), -1, jnp.int32)
        starts = []
        for b, (e, p) in enumerate(per):
            n = e.shape[1]
            embeds = embeds.at[b, S - n:].set(e[0])       # left-pad
            positions = positions.at[b, S - n:].set(p[0])
            segments = segments.at[b, S - n:].set(0)
            starts.append(n)
        gen = gen or GenerationConfig(
            max_new_tokens=128, eos_token_ids=(self.tokenizer.eos_token_id,))
        outs = self.generator.generate_batch(
            embeds, positions, segments, gen,
            jnp.asarray(starts, jnp.int32))
        stops = (tuple(gen.stop_strings)
                 or (conv_templates["vicuna_v1"].stop_str,))
        return [trim_stop_strings(
                    self.tokenizer.decode(o, skip_special_tokens=True), stops)
                for o in outs]
