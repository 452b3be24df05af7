"""Batch inference worker: MCQ / open-ended video QA over a dataset chunk.

CLI-compatible rebuild of Flash-VStream-Qwen/inference_mcq_vqa.py:
- round-robin chunking (--num-chunks/--chunk-idx, reference L26-37),
- resume from existing answer files (L203-208),
- dataset-specific prompts incl. the MCQ "Best option: (" priming trick
  (L320-321) and the open-ended prompt for rvs/actnet/nextoe (L229-232),
- frame-dir sampling by fps / max_frames (L244-289),
- per-sample try/except-continue (L362-364),
- deterministic decode (top_k=1/do_sample=False -> greedy, L344-346).

The model is a pipeline object with .answer(frames, question, gen=...) —
QwenPipeline with converted weights in production, a tiny random-init pipeline
in tests/dry runs (--dry-run).
"""
from __future__ import annotations

import argparse
import json
import math
import os
from typing import List, Optional

MCQ_PROMPT = ("Select the best answer to the following multiple-choice "
              "question based on the video. Respond with only the letter "
              "(A, B, C, or D) of the correct option.")
MCQ_SUB_PROMPT = ("Select the best answer to the following multiple-choice "
                  "question based on the video and the subtitles. Respond "
                  "with only the letter (A, B, C, or D) of the correct "
                  "option.")
OE_PROMPT = "Answer the following open-ended question based on the video. "
OE_DATASETS = ("rvs_ego", "rvs_movie", "actnet", "nextoe", "videochatgpt")


def get_chunk(lst: List, n: int, k: int) -> List:
    """Round-robin chunking (inference_mcq_vqa.py:26-37)."""
    return lst[k::n]


def sample_frame_paths(video_dir: str, fps: Optional[float],
                       max_frames: Optional[int],
                       source_fps: float = 1.0, dataset: str = "",
                       reproduce: bool = False) -> List[str]:
    """Frame-dir sampling with the reference's mode set
    (inference_mcq_vqa.py:244-289): fps subsample; max_frames linspace;
    tight (i, i+1) pairs for frames_fps4 dirs; duplicated pairs for
    rvs_movie; --reproduce = every 4th frame (egoschema paper setting)."""
    import numpy as np

    def dup_pairs(paths, n):
        """Each sampled frame twice (temporal patch pairs see a still
        frame — the reference's rvs_movie handling)."""
        T = len(paths)
        idx = np.linspace(0, T - 1, max(n, 1)).round().astype(int)
        return [p for i in idx for p in (paths[i], paths[i])]

    names = sorted(os.listdir(video_dir),
                   key=lambda x: int(x.split("_")[-1].split(".")[0])
                   if x.split("_")[-1].split(".")[0].isdigit() else 0)
    paths = [os.path.join(video_dir, n) for n in names]
    if reproduce:
        return paths[::4]
    T = len(paths)
    if fps is not None:
        # fps mode is UNCAPPED (the reference sets max_frames=10000 here,
        # inference_mcq_vqa.py:284-289) — do not apply --max-frames
        if fps < source_fps:
            step = max(int(round(source_fps / fps)), 1)
            paths = paths[::step]
        return paths
    if "rvs_movie" in dataset:
        n = min(T, (max_frames or 2 * T) // 2)
        return dup_pairs(paths, n)
    if max_frames is None or T <= max_frames:
        return paths
    if "frames_fps4" in video_dir:
        # tight pairs from a 4 fps dir: (i, i+1) half-second pairs.
        # An odd --max-frames rounds DOWN to even (with a warning) rather
        # than aborting the whole eval worker on an AssertionError.
        if max_frames % 2:
            even = max(max_frames - 1, 2)
            print(f"[sample_frame_paths] fps4 dirs sample frame pairs; "
                  f"rounding odd max_frames {max_frames} to {even}")
            max_frames = even
        idx = np.linspace(0, T - 1, max_frames // 2).round().astype(int)
        out = []
        for i in idx:
            a, b = (i, i + 1) if i < T - 1 else (i - 1, i)
            out.append(paths[a])
            out.append(paths[b])
        return out
    idx = np.linspace(0, T - 1, max_frames).round().astype(int)
    return [paths[i] for i in idx]


def load_frames(paths: List[str]):
    import numpy as np
    from PIL import Image
    return [np.asarray(Image.open(p).convert("RGB")) for p in paths]


def build_question(sample: dict, dataset: str, subtitle: str = "",
                   q_base: Optional[str] = None) -> tuple:
    q = q_base or sample.get("question") or sample.get("question1")
    if dataset in OE_DATASETS:
        return OE_PROMPT + q, False
    if "videommesub" in dataset and subtitle:
        return ("This video's subtitles are listed below: \n" + subtitle
                + "\n" + MCQ_SUB_PROMPT + q), True
    return MCQ_PROMPT + q, True


def run_inference(args, pipeline=None) -> str:
    """Run one worker chunk; returns the answers file path."""
    from ..runtime.generation import GenerationConfig

    from ..core.runtime_setup import enable_compilation_cache
    enable_compilation_cache()

    gt_questions = json.load(open(args.data_file))
    gt_questions = get_chunk(gt_questions, args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    output_name = (f"{args.num_chunks}_{args.chunk_idx}"
                   if args.num_chunks > 1 else args.output_name)
    answers_file = os.path.join(args.output_dir, f"{output_name}.json")
    if os.path.exists(answers_file):
        with open(answers_file) as f:
            done = {json.loads(row)["id"] for row in f if row.strip()}
        gt_questions = [s for s in gt_questions if s["id"] not in done]

    if pipeline is None:
        pipeline = build_pipeline(args)

    gen = GenerationConfig(max_new_tokens=args.max_new_tokens,
                           eos_token_ids=(pipeline.tokenizer.eos_token_id,))

    with open(answers_file, "a") as ans_file:
        for sample in gt_questions:
            try:
                video_path = os.path.join(args.video_dir, sample["video_id"])
                if not os.path.exists(video_path):
                    raise FileNotFoundError(video_path)
                paths = sample_frame_paths(video_path, args.fps,
                                           args.max_frames,
                                           dataset=args.dataset,
                                           reproduce=args.reproduce)
                subtitle = ""
                if "videommesub" in args.dataset and args.subtitle_dir:
                    from .subtitles import get_subtitle
                    idxs = [int(os.path.basename(p).split("_")[-1].split(".")[0])
                            for p in paths
                            if os.path.basename(p).split("_")[-1]
                            .split(".")[0].isdigit()]
                    subtitle = get_subtitle(args.subtitle_dir,
                                            sample["video_id"], idxs)
                # consistency-style samples carry TWO paraphrased questions
                # sharing one answer; both are asked over the same frames and
                # recorded as pred1/pred2 (reference
                # inference_mcq_vqa.py:213-216,374-381)
                q_bases = ([sample["question"]] if "question" in sample
                           else [sample["question1"], sample["question2"]])
                frames = load_frames(paths)
                preds = []
                for q_base in q_bases:
                    question, is_mcq = build_question(
                        sample, args.dataset, subtitle, q_base=q_base)
                    if is_mcq:
                        question = question + "\nBest option: ("
                    preds.append(pipeline.answer(frames, question, gen=gen))
                record = dict(sample)
                if "question" in sample:
                    record["pred"] = preds[0]
                else:
                    record["pred1"], record["pred2"] = preds
                ans_file.write(json.dumps(record) + "\n")
                ans_file.flush()
            except Exception as e:
                print(f"[chunk {args.chunk_idx}] error on id="
                      f"{sample.get('id')}: {e}")
                continue
    return answers_file


def build_pipeline(args):
    """Load the Qwen pipeline from a checkpoint dir, or a tiny random-init
    pipeline for --dry-run."""
    import jax
    from ..runtime.pipeline import QwenPipeline

    if args.dry_run:
        from ..core.config import tiny_qwen_config
        from ..models.vstream_qwen import init_qwen_params
        from ..preprocess.qwen_processor import make_byte_qwen_tokenizer
        cfg = tiny_qwen_config()
        params = init_qwen_params(jax.random.PRNGKey(0), cfg)
        return QwenPipeline(params, cfg, make_byte_qwen_tokenizer(),
                            max_len=2048, max_pixels=args.max_pixels)

    from ..core.config import VStreamQwenConfig, FlashMemoryConfig
    from ..preprocess.tokenizer import load_tokenizer
    from ..weights.convert import load_qwen_checkpoint
    import jax.numpy as jnp
    cfg = VStreamQwenConfig()
    if args.flash_memory_dict:
        cfg = cfg.replace(flash_memory=FlashMemoryConfig.from_dict(
            json.loads(args.flash_memory_dict)))
    params = load_qwen_checkpoint(args.model_path, cfg, dtype=jnp.bfloat16)
    tokenizer = load_tokenizer(args.model_path)
    return QwenPipeline(params, cfg, tokenizer, max_pixels=args.max_pixels)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Flash-VStream TPU batch inference")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--video-dir", type=str, required=True)
    p.add_argument("--data-file", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--output-name", type=str, default="pred")
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--fps", type=float, default=None)
    p.add_argument("--max-frames", type=int, default=240)
    p.add_argument("--max-pixels", type=int, default=4 * 224 * 224)
    p.add_argument("--max-new-tokens", type=int, default=128)
    p.add_argument("--flash-memory-dict", type=str, default=None)
    p.add_argument("--subtitle-dir", type=str, default=None,
                   help="directory of <video_id>.srt files (videommesub)")
    p.add_argument("--dry-run", action="store_true",
                   help="tiny random-init model (no checkpoint needed)")
    p.add_argument("--reproduce", action="store_true",
                   help="paper-reproduction sampling: every 4th frame "
                        "(reference inference_mcq_vqa.py:244-246)")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. 'cpu'). Needed for "
                        "subprocess workers: the host profile may override "
                        "JAX_PLATFORMS before user code runs, so the parent's"
                        " platform cannot be inherited through the env")
    return p


def force_platform(platform: str):
    """Claim `platform` before first backend use (see
    __graft_entry__._force_cpu_mesh for why env inheritance is not enough)."""
    import jax
    os.environ["JAX_PLATFORMS"] = platform
    jax.config.update("jax_platforms", platform)


def main(argv=None):
    args = make_parser().parse_args(argv)
    if args.platform:
        force_platform(args.platform)
    run_inference(args)


if __name__ == "__main__":
    main()
