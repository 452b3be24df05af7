"""Streaming CLI server test: synthetic stream, paced ingest, periodic QA."""
import json
import os

from flash_vstream_tpu.serve.cli_server import make_parser, run_server


def test_cli_server_dry_run_qwen(tmp_path):
    out = str(tmp_path / "summary.json")
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "12", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",   # as fast as possible
        "--question", "What is happening?",
        "--question_interval", "0.0001",
        "--max-new-tokens", "4",
        "--output-file", out,
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 12
    assert len(summary["answers"]) >= 1
    assert all(isinstance(a["answer"], str) for a in summary["answers"])
    assert "memory_latency" in summary["metrics"]
    assert "conv_latency" in summary["metrics"]
    saved = json.load(open(out))
    assert saved["frames_ingested"] == 12


def test_cli_server_dry_run_llava(tmp_path):
    args = make_parser().parse_args([
        "--model-family", "llava", "--dry-run",
        "--synthetic-frames", "6", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?",
        "--question_interval", "1000",   # only the final answer fires
        "--max-new-tokens", "4",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 6
    assert len(summary["answers"]) == 1


def test_cli_server_stream_output(tmp_path, capsys):
    """--stream-output prints answer tokens incrementally (TextStreamer UX,
    cli_video_stream.py:292-309); the summary still records full answers."""
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "6", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "What is happening?",
        "--question_interval", "1000",
        "--max-new-tokens", "4", "--stream-output",
    ])
    summary = run_server(args)
    assert len(summary["answers"]) == 1
    captured = capsys.readouterr().out
    assert "Q: What is happening?" in captured
    # the streamed text equals the recorded answer
    assert summary["answers"][0]["answer"] in captured.replace("\n", "")


def test_answer_stream_matches_answer():
    """answer_stream's concatenated deltas == answer() for greedy decode."""
    import jax
    from flash_vstream_tpu.core.config import tiny_qwen_config
    from flash_vstream_tpu.models.vstream_qwen import init_qwen_params
    from flash_vstream_tpu.preprocess.qwen_processor import (
        make_byte_qwen_tokenizer)
    from flash_vstream_tpu.runtime.generation import GenerationConfig
    from flash_vstream_tpu.runtime.streaming import QwenStreamSession
    import numpy as np
    cfg = tiny_qwen_config()
    params = init_qwen_params(jax.random.PRNGKey(0), cfg)
    sess = QwenStreamSession(params, cfg, make_byte_qwen_tokenizer(),
                             frame_hw=(56, 56), clip_size=2, bank_size=16,
                             max_len=2048)
    frames = [np.zeros((56, 56, 3), np.uint8)] * 2
    sess.ingest_frames(frames)
    sess.block_until_ingested()
    gen = GenerationConfig(max_new_tokens=6, eos_token_ids=())
    full = sess.answer("What?", gen)
    streamed = "".join(sess.answer_stream("What?", gen))
    assert streamed.strip() == full.strip()


def test_cli_server_prewarm_qwen(tmp_path):
    """--prewarm compiles the answer buckets up front, resets state, and the
    stream then runs normally (no leftover warmup frames in counts)."""
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "8", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4", "--prewarm",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 8
    assert len(summary["answers"]) == 1


def test_cli_server_prewarm_llava(tmp_path):
    args = make_parser().parse_args([
        "--model-family", "llava", "--dry-run",
        "--synthetic-frames", "4", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4", "--prewarm",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 4
    assert len(summary["answers"]) == 1


def test_cli_server_frame_dir(tmp_path):
    import numpy as np
    from PIL import Image
    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (56, 56, 3), dtype=np.uint8)
                        ).save(d / f"{i:06d}.jpg")
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--video_file", str(d), "--clip-size", "2",
        "--fps", "1", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 6


def test_cli_server_threaded_ingest(tmp_path):
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run", "--threaded-ingest",
        "--synthetic-frames", "12", "--clip-size", "2",
        "--fps", "50", "--play_speed", "1.0",
        "--question", "Q?", "--question_interval", "0.05",
        "--max-new-tokens", "4",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 12
    assert len(summary["answers"]) >= 1


def test_cli_server_quantized_serve(tmp_path):
    """--load-8bit/--int8-vit/--w8a8-prefill (reference builder.py
    load_8bit/load_4bit parity): the quantized session serves end-to-end."""
    from flash_vstream_tpu.models import layers
    old = layers.W8A8_PREFILL
    try:
        args = make_parser().parse_args([
            "--model-family", "qwen", "--dry-run",
            "--load-8bit", "--int8-vit", "--w8a8-prefill", "--kv-int8",
            "--synthetic-frames", "6", "--clip-size", "2",
            "--fps", "2", "--play_speed", "0",
            "--question", "Q?", "--question_interval", "1000",
            "--max-new-tokens", "4",
        ])
        summary = run_server(args)
        assert summary["frames_ingested"] == 6
        assert len(summary["answers"]) == 1
        assert isinstance(summary["answers"][0]["answer"], str)
    finally:
        layers.W8A8_PREFILL = old


def test_cli_server_4bit_llava(tmp_path):
    args = make_parser().parse_args([
        "--model-family", "llava", "--dry-run", "--load-4bit",
        "--synthetic-frames", "4", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4",
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 4
    assert len(summary["answers"]) == 1


def test_cli_server_save_and_resume_session(tmp_path):
    """--save-session / --resume-session round-trip through the CLI: the
    resumed server starts with the prior stream's memory."""
    ckpt = str(tmp_path / "stream_ckpt")
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "6", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4", "--save-session", ckpt,
    ])
    s1 = run_server(args)
    assert s1["frames_ingested"] == 6

    args2 = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "2", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "Q?", "--question_interval", "1000",
        "--max-new-tokens", "4", "--resume-session", ckpt,
    ])
    s2 = run_server(args2)
    assert s2["frames_ingested"] == 2   # this run's frames
    assert len(s2["answers"]) == 1     # answered over resumed + new memory


def test_cli_server_preemptible_answers(tmp_path):
    """--preempt N serves chunk-stitched answers (queued clips run between
    chunks); output contract is identical to the fused path."""
    out = str(tmp_path / "summary.json")
    args = make_parser().parse_args([
        "--model-family", "qwen", "--dry-run",
        "--synthetic-frames", "8", "--clip-size", "2",
        "--fps", "2", "--play_speed", "0",
        "--question", "What is happening?",
        "--question_interval", "0.0001",
        "--max-new-tokens", "6", "--preempt", "2",
        "--output-file", out,
    ])
    summary = run_server(args)
    assert summary["frames_ingested"] == 8
    assert len(summary["answers"]) >= 1
    assert all(isinstance(a["answer"], str) for a in summary["answers"])
