"""Real-time streaming QA server (CLI).

Single-process rebuild of the reference's 4-process servers
(Flash-VStream-LLaVA/flash_vstream/serve/cli_video_stream.py,
Flash-VStream-Qwen/cli_server_2gpu.py): a frame pacer drives clip ingestion
at --fps * --play_speed; questions fire every --question_interval seconds (or
interactively); latency metrics print at the end — same metric names as the
reference (memory_latency_*, llm_latency*, conv_latency).

The reference needed two GPUs (LLM on cuda:0, memory manager on cuda:1) and
Manager.list shared memory; here ingest is an async-dispatched jit on the
same chip and the memory state is device-resident, so one process and one
chip suffice.
"""
from __future__ import annotations

import argparse
import json
import time
from typing import List, Optional

import numpy as np

from ..preprocess.video import SyntheticSource, load_video
from ..runtime.generation import GenerationConfig
from ..runtime.metrics import MetricMeter, Timer
from ..utils.logging import build_logger


def _apply_quantization(params, args):
    """Serve-side analogue of the reference's load_8bit/load_4bit loader
    options (Flash-VStream-LLaVA builder.py:35-44, bitsandbytes): decoder
    weights become int8 (or block-scaled int4) QuantWeights, optionally the
    ViT blocks too; --w8a8-prefill additionally runs prefill-scale matmuls
    as int8xint8 on the MXU (2x bf16 rate)."""
    from ..weights.quantize import (enable_w8a8_prefill, quantize_params,
                                    quantize_params4)
    if getattr(args, "load_4bit", False):
        params = dict(params, llm=quantize_params4(params["llm"]))
    elif getattr(args, "load_8bit", False):
        params = dict(params, llm=quantize_params(params["llm"]))
    if getattr(args, "int8_vit", False):
        params = dict(params, vit=quantize_params(params["vit"]))
    if getattr(args, "w8a8_prefill", False):
        enable_w8a8_prefill()
    return params


def build_session(args):
    import jax
    import jax.numpy as _jnp
    kv_dtype = _jnp.int8 if args.kv_int8 else None
    if args.model_family == "qwen":
        from ..core.config import (FlashMemoryConfig, VStreamQwenConfig,
                                   tiny_qwen_config)
        from ..models.vstream_qwen import init_qwen_params
        from ..preprocess.qwen_processor import make_byte_qwen_tokenizer
        from ..runtime.streaming import QwenStreamSession
        if args.dry_run:
            cfg = tiny_qwen_config()
            params = init_qwen_params(jax.random.PRNGKey(0), cfg)
            tokenizer = make_byte_qwen_tokenizer()
            frame_hw = (56, 56)
        else:
            import jax.numpy as jnp
            from ..preprocess.tokenizer import load_tokenizer
            from ..weights.convert import load_qwen_checkpoint
            cfg = VStreamQwenConfig()
            if args.flash_memory_dict:
                cfg = cfg.replace(flash_memory=FlashMemoryConfig.from_dict(
                    json.loads(args.flash_memory_dict)))
            params = load_qwen_checkpoint(args.model_path, cfg,
                                          dtype=jnp.bfloat16)
            tokenizer = load_tokenizer(args.model_path)
            frame_hw = (args.frame_size, args.frame_size)
        params = _apply_quantization(params, args)
        placement = None
        if args.ingest_devices or args.decode_devices:
            from ..parallel.serve import make_serve_placement
            n_dev = len(jax.devices())
            if n_dev < (args.ingest_devices or 1) + 1:
                print(f"[serve] only {n_dev} device(s) visible — "
                      "disaggregation needs >= 2; falling back to the "
                      "single-chip path (use --preempt so answers yield "
                      "to clips)")
            else:
                placement = make_serve_placement(
                    n_ingest=args.ingest_devices or 1,
                    n_decode=args.decode_devices or None)
        return QwenStreamSession(params, cfg, tokenizer, frame_hw=frame_hw,
                                 clip_size=args.clip_size,
                                 bank_size=args.video_max_frames,
                                 kv_cache_dtype=kv_dtype,
                                 placement=placement)
    else:
        from ..core.config import VStreamLLaVAConfig, tiny_llava_config
        from ..models.vstream_llava import init_llava_params
        from ..preprocess.tokenizer import ByteTokenizer, load_tokenizer
        from ..runtime.streaming import LLaVAStreamSession
        if args.dry_run:
            cfg = tiny_llava_config()
            params = init_llava_params(jax.random.PRNGKey(0), cfg)
            tokenizer = ByteTokenizer()
        else:
            import jax.numpy as jnp
            from ..weights.convert import load_llava_checkpoint
            cfg = VStreamLLaVAConfig()
            params = load_llava_checkpoint(args.model_path, cfg,
                                           dtype=jnp.bfloat16)
            tokenizer = load_tokenizer(args.model_path)
        params = _apply_quantization(params, args)
        return LLaVAStreamSession(params, cfg, tokenizer,
                                  clip_size=args.clip_size,
                                  kv_cache_dtype=kv_dtype)


def prewarm_session(session, args, gen, logger):
    """Compile every answer bucket BEFORE the stream starts.

    Pre-saturation answers cross 3-4 (t_dam, t_csm) / n_mem buckets; each
    bucket's assemble+prefill+decode programs compile 30-60 s cold through
    the remote compile service, which showed up as missed ingest deadlines
    early in live streams. Prewarming moves all of it ahead of frame zero,
    then resets the stream state (jits stay compiled).

    Preemptible answers use ONE fixed-size chunk program (the tail chunk
    over-decodes and trims host-side, generation.py), so even when a trained
    checkpoint emits EOS during the first prewarm chunk, no un-prewarmed
    program remains to compile cold mid-stream."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    side = 56 if args.dry_run else args.frame_size
    dummy = [np.zeros((side, side, 3), np.uint8)] * args.clip_size
    session.ingest_frames(dummy)
    session.block_until_ingested()
    snapshot, _ = session._published
    q = args.question or "What is happening?"
    if hasattr(session.cfg, "flash_memory"):       # Qwen family
        from ..runtime.streaming import bucket_candidates
        fm = session.cfg.flash_memory
        ns = sorted(set(bucket_candidates(fm.dam_grid_len))
                    | set(bucket_candidates(fm.csm_grid_len)))
        seen = set()
        for n in ns:
            key = (session._bucket_t(min(n, fm.dam_grid_len), fm.dam_grid_len),
                   session._bucket_t(min(n, fm.csm_grid_len), fm.csm_grid_len))
            if key in seen:
                continue
            seen.add(key)
            # compile the same program answers use (the fused
            # assemble+prefill+decode jit for greedy configs)
            session.answer_snapshot(snapshot, n, q, gen)
    else:                                          # LLaVA family
        from ..models.vstream_llava import star_valid_counts
        sat_frames = session.cfg.star.video_max_frames
        seen = set()
        for n in range(1, sat_frames + 1):
            b = session._bucket_n_mem(
                sum(star_valid_counts(session.cfg, n, streaming=True)))
            if b in seen:
                continue
            seen.add(b)
            session._published = (session._published[0], n)
            session.answer(q, gen)
    session.reset()
    session.metrics = MetricMeter()
    logger.info(f"prewarmed {len(seen)} answer buckets in "
                f"{time.perf_counter() - t0:.1f}s")


def run_server(args) -> dict:
    logger = build_logger("cli_server", args.log_file)

    from ..core.runtime_setup import enable_compilation_cache
    enable_compilation_cache()
    session = build_session(args)
    if args.resume_session:
        session.load_session(args.resume_session)
        logger.info(f"resumed session memory from {args.resume_session} "
                    f"({session._published[1]} frames already ingested)")
    if args.prewarm:
        prewarm_session(
            session, args,
            GenerationConfig(max_new_tokens=args.max_new_tokens,
                             eos_token_ids=(session.tokenizer.eos_token_id,),
                             preemptible_chunk=args.preempt,
                             prefill_chunk=args.prefill_chunk),
            logger)

    if args.video_file:
        src = load_video(args.video_file, fps=args.fps,
                         max_frames=args.video_max_frames)
    else:
        side = 56 if args.dry_run else args.frame_size
        src = SyntheticSource(args.synthetic_frames, side, side, fps=args.fps)
    logger.info(f"stream source: {len(src)} frames at {args.fps} fps "
                f"(play_speed {args.play_speed})")

    questions: List[str] = []
    if args.questions_file:
        questions = [l.strip() for l in open(args.questions_file)
                     if l.strip()]
    elif args.question:
        questions = [args.question]

    metrics = session.metrics
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           eos_token_ids=(session.tokenizer.eos_token_id,),
                           preemptible_chunk=args.preempt,
                           prefill_chunk=args.prefill_chunk)

    def do_answer(q: str) -> str:
        """Full answer, or incremental printing with --stream-output (the
        reference's TextStreamer, cli_video_stream.py:292-309)."""
        if args.stream_output:
            print(f"Q: {q}\nA: ", end="", flush=True)
            pieces = []
            for piece in session.answer_stream(q, gen):
                print(piece, end="", flush=True)
                pieces.append(piece)
            print(flush=True)
            return "".join(pieces)
        return session.answer(q, gen)
    frame_interval = (1.0 / (args.fps * args.play_speed)
                      if args.play_speed > 0 else 0.0)
    next_q_time = args.question_interval
    q_idx = 0
    answers = []
    start = time.perf_counter()

    if args.threaded_ingest:
        # background-thread pacing: long answers never stall ingestion
        from ..runtime.streaming import ThreadedIngestor
        ing = ThreadedIngestor(
            session, list(src),
            fps=args.fps * args.play_speed if args.play_speed > 0 else 0.0,
            clip_size=args.clip_size).start()
        while not ing.wait(timeout=0.05):
            elapsed = time.perf_counter() - start
            if session.n_frames == 0:
                continue   # nothing ingested yet (first clip still compiling)
            if questions and elapsed >= next_q_time:
                q = questions[q_idx % len(questions)]
                q_idx += 1
                next_q_time += args.question_interval
                with Timer(metrics, "conv_latency"):
                    ans = do_answer(q)
                logger.info(f"[t={elapsed:.1f}s frames="
                            f"{ing.frames_ingested}] Q: {q}\nA: {ans}")
                answers.append({"t": elapsed, "frames": ing.frames_ingested,
                                "question": q, "answer": ans})
        ing.stop()     # join the pacing thread before teardown
        i = ing.frames_ingested
        metrics.update("missed_clip_deadlines", ing.missed_deadlines)
    else:
        i = 0
        while i < len(src):
            clip = [src[j] for j in range(i, min(i + args.clip_size,
                                                 len(src)))]
            target = start + i * frame_interval
            now = time.perf_counter()
            if args.play_speed > 0 and now < target:
                time.sleep(target - now)
            try:
                with Timer(metrics, "memory_latency"):
                    session.ingest_frames(clip)
                    if args.sync_every_clip:
                        session.block_until_ingested()
            except Exception as e:
                # keep streaming on a bad clip (reference catches-and-loops,
                # cli_video_stream.py:201-203)
                logger.error(f"ingest failed at frame {i}: {e}")
            i += len(clip)

            elapsed = time.perf_counter() - start
            if questions and elapsed >= next_q_time:
                q = questions[q_idx % len(questions)]
                q_idx += 1
                next_q_time += args.question_interval
                with Timer(metrics, "conv_latency"):
                    ans = do_answer(q)
                logger.info(f"[t={elapsed:.1f}s frames={i}] Q: {q}")
                logger.info(f"A: {ans}")
                answers.append({"t": elapsed, "frames": i, "question": q,
                                "answer": ans})

    session.block_until_ingested()
    # final question after the stream ends
    if questions:
        q = questions[q_idx % len(questions)]
        with Timer(metrics, "conv_latency"):
            ans = do_answer(q)
        answers.append({"t": time.perf_counter() - start, "frames": i,
                        "question": q, "answer": ans})

    summary = {"frames_ingested": i, "answers": answers,
               "metrics": metrics.as_dict()}
    if args.save_session:
        session.block_until_ingested()
        session.save_session(args.save_session)
        logger.info(f"saved session memory to {args.save_session}")
    logger.info("metrics:\n" + metrics.summary())
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def make_parser():
    p = argparse.ArgumentParser(description="Flash-VStream TPU streaming server")
    p.add_argument("--model-family", choices=["llava", "qwen"], default="qwen")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--video_file", type=str, default=None,
                   help="video file or frame directory")
    p.add_argument("--synthetic-frames", type=int, default=64,
                   help="synthetic source length when no video given")
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--play_speed", type=float, default=1.0,
                   help="0 = ingest as fast as possible")
    p.add_argument("--video_max_frames", type=int, default=1200)
    p.add_argument("--clip-size", type=int, default=2)
    p.add_argument("--frame-size", type=int, default=224)
    p.add_argument("--question", type=str, default=None)
    p.add_argument("--questions-file", type=str, default=None)
    p.add_argument("--question_interval", type=float, default=10.0)
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--flash-memory-dict", type=str, default=None)
    p.add_argument("--log_file", type=str, default=None)
    p.add_argument("--output-file", type=str, default=None)
    p.add_argument("--sync-every-clip", action="store_true")
    p.add_argument("--save-session", type=str, default=None,
                   help="checkpoint the stream's memory state here at the "
                        "end (resumable with --resume-session; the "
                        "reference's bank dies with the process)")
    p.add_argument("--resume-session", type=str, default=None,
                   help="restore a previously saved session memory before "
                        "streaming")
    p.add_argument("--prewarm", action="store_true",
                   help="compile all answer shape buckets before streaming "
                        "(no mid-stream compile stalls)")
    p.add_argument("--load-8bit", action="store_true",
                   help="weight-only int8 decoder (reference builder.py "
                        "load_8bit / bitsandbytes parity; a 7B fits one "
                        "16 GB chip)")
    p.add_argument("--load-4bit", action="store_true",
                   help="block-scaled int4 decoder base (reference "
                        "load_4bit parity; Pallas packed-byte decode matvec)")
    p.add_argument("--int8-vit", action="store_true",
                   help="weight-only int8 ViT blocks (patch merger stays "
                        "bf16); with --w8a8-prefill the ingest encode runs "
                        "int8xint8 on the MXU")
    p.add_argument("--w8a8-prefill", action="store_true",
                   help="quantize activations per-token to int8 for "
                        "prefill-scale matmuls over int8 weights (2x MXU "
                        "rate, slight logit drift)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache with per-position scales (halves "
                        "decode's cache HBM reads)")
    p.add_argument("--stream-output", action="store_true",
                   help="print answer tokens incrementally as they decode "
                        "(TextStreamer UX, cli_video_stream.py:292-309)")
    p.add_argument("--prefill-chunk", type=int, default=0,
                   help="with --preempt: also run the prompt prefill in "
                        "sequence chunks of this many tokens (exact; one "
                        "host sync per chunk) so clips preempt mid-prefill "
                        "too. 0 = one-dispatch prefill")
    p.add_argument("--preempt", type=int, default=0,
                   help="decode chunk size for preemptible answers: queued "
                        "ingest clips run between answer chunks instead of "
                        "stalling behind one fused dispatch (0 = fused). "
                        "With --stream-output the stepwise one-jit-per-token "
                        "path runs instead — it is inherently preemptible "
                        "and this chunk size is ignored")
    p.add_argument("--ingest-devices", type=int, default=0,
                   help="disaggregated serve (qwen): pin vision encode + "
                        "memory consolidation to this many leading devices "
                        "(the reference's dedicated memory-manager GPU, "
                        "cli_server_2gpu.py:197-239); decoder runs "
                        "TP-sharded on the rest. 0 = single-chip.")
    p.add_argument("--decode-devices", type=int, default=0,
                   help="device count for the TP decode stage (0 = all "
                        "remaining devices)")
    p.add_argument("--threaded-ingest", action="store_true",
                   help="pace ingestion on a background thread so answers "
                        "never stall the stream")
    p.add_argument("--dry-run", action="store_true")
    return p


def main(argv=None):
    run_server(make_parser().parse_args(argv))


if __name__ == "__main__":
    main()
