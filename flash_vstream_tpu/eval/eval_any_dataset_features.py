"""LLaVA-generation eval orchestrator (feature-based datasets).

CLI rebuild of Flash-VStream-LLaVA/flash_vstream/eval_video/
eval_any_dataset_features.py: per-dataset launcher over precomputed-feature
QA sets (msvd, msrvtt, actnet, nextoe, vstream movienet/ego4d and their
realtime variants), chunked workers, then GPT-judged open-ended scoring.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

DATASETS = {
    "msvd": {"features": "msvd/features", "gt": "msvd/test_qa.json"},
    "msrvtt": {"features": "msrvtt/features", "gt": "msrvtt/test_qa.json"},
    "actnet": {"features": "actnet/features", "gt": "actnet/test_qa.json"},
    "nextoe": {"features": "nextoe/features", "gt": "nextoe/test_qa.json"},
    "vsmovienet": {"features": "vstream/movienet_features",
                   "gt": "vstream/test_qa_movienet.json"},
    "vsego4d": {"features": "vstream/ego4d_features",
                "gt": "vstream/test_qa_ego4d.json"},
    "realtime_vsmovienet": {"features": "vstream-realtime/movienet_features",
                            "gt": "vstream-realtime/test_qa_movienet.json"},
    "realtime_vsego4d": {"features": "vstream-realtime/ego4d_features",
                         "gt": "vstream-realtime/test_qa_ego4d.json"},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True, choices=sorted(DATASETS))
    p.add_argument("--data-root", default="data/eval_video")
    p.add_argument("--model-path", default=None)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--judge-model", default="gpt-3.5-turbo-0125")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--skip-inference", action="store_true")
    p.add_argument("--skip-judge", action="store_true")
    args = p.parse_args(argv)

    info = DATASETS[args.dataset]
    gt = os.path.join(args.data_root, info["gt"])
    feats = os.path.join(args.data_root, info["features"])
    os.makedirs(args.output_dir, exist_ok=True)

    if not args.skip_inference:
        from . import model_video_qa as worker
        common = ["--video_dir", feats, "--gt_file", gt,
                  "--output_dir", args.output_dir,
                  "--num-chunks", str(args.num_chunks)]
        if args.model_path:
            common += ["--model-path", args.model_path]
        if args.dry_run:
            common += ["--dry-run"]
        if args.num_chunks == 1:
            wargs = worker.make_parser().parse_args(
                common + ["--chunk-idx", "0"])
            worker.run_inference(wargs)
        else:
            procs = [subprocess.Popen(
                [sys.executable, "-m",
                 "flash_vstream_tpu.eval.model_video_qa", *common,
                 "--chunk-idx", str(i),
                 "--output_name", f"{args.num_chunks}_{i}"])
                for i in range(args.num_chunks)]
            for pr in procs:
                pr.wait()

    if not args.skip_judge:
        from .gpt_judge import aggregate, judge_all
        from .scoring import load_predictions
        preds = load_predictions(args.output_dir, args.num_chunks)
        results = judge_all(preds, os.path.join(args.output_dir, "judge.json"),
                            model=args.judge_model)
        summary = aggregate(results)
        print(json.dumps(summary, indent=2))
        with open(os.path.join(args.output_dir, "result.json"), "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
