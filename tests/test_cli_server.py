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
