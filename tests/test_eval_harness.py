"""Eval harness tests: fake dataset -> chunked inference -> scoring, resume."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from flash_vstream_tpu.eval import eval_any_dataset
from flash_vstream_tpu.eval.scoring import ScoreMeter, calc_mcq_result, extract_answer


def make_fake_dataset(root, n_videos=2, n_q=4, n_frames=4):
    frame_dir = os.path.join(root, "mvbench", "frames")
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = os.path.join(frame_dir, f"vid{v}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"frame_{i:06d}.jpg"))
    qa = [{"id": f"{i}", "video_id": f"vid{i % n_videos}",
           "question": f"Q{i}?\nA. one\nB. two\nC. three\nD. four",
           "answer": i % 4, "a_type": "action"} for i in range(n_q)]
    qa_file = os.path.join(root, "mvbench", "test_qa.json")
    with open(qa_file, "w") as f:
        json.dump(qa, f)
    return frame_dir, qa_file


def test_extract_answer():
    assert extract_answer("B") == 1
    assert extract_answer("The answer is (C).") == 2
    assert extract_answer("A. one") == 0
    assert extract_answer("no letter here!") in range(5)  # random fallback


def test_score_meter():
    m = ScoreMeter()
    m.add_score(1.0, "yes")
    m.add_score(0.0, "no")
    m.add_score(1.0, "yes")
    assert m.get_accuracy("yes") == f"{2/3*100:.6f}"
    assert m.get_average_score() == f"{2/3*100:.6f}"


def test_eval_any_dataset_dry_run(tmp_path):
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    make_fake_dataset(root)
    eval_any_dataset.main([
        "--dataset", "mvbench", "--data-root", root, "--output-dir", out,
        "--dry-run", "--max-frames", "4",
    ])
    preds = [json.loads(l) for l in open(os.path.join(out, "pred.json"))]
    assert len(preds) == 4
    assert all("pred" in p for p in preds)
    result = json.load(open(os.path.join(out, "result.json")))
    assert len(result) == 4
    assert os.path.exists(os.path.join(out, "result.csv"))


def test_eval_resume(tmp_path):
    """Already-answered ids are skipped on restart (reference L203-208)."""
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    make_fake_dataset(root)
    os.makedirs(out, exist_ok=True)
    # pre-seed two answers
    with open(os.path.join(out, "pred.json"), "w") as f:
        f.write(json.dumps({"id": "0", "video_id": "vid0", "answer": 0,
                            "pred": "A", "question": "Q0?"}) + "\n")
        f.write(json.dumps({"id": "1", "video_id": "vid1", "answer": 1,
                            "pred": "B", "question": "Q1?"}) + "\n")
    eval_any_dataset.main([
        "--dataset", "mvbench", "--data-root", root, "--output-dir", out,
        "--dry-run", "--max-frames", "4",
    ])
    preds = [json.loads(l) for l in open(os.path.join(out, "pred.json"))]
    assert len(preds) == 4
    assert preds[0]["pred"] == "A" and preds[1]["pred"] == "B"  # kept


def test_mcq_scoring_accuracy(tmp_path):
    out = str(tmp_path)
    qa_file = os.path.join(out, "qa.json")
    with open(qa_file, "w") as f:
        json.dump([], f)
    with open(os.path.join(out, "pred.json"), "w") as f:
        for i, (pred, ans) in enumerate([("A", 0), ("B", 0), ("C", 2), ("D", 3)]):
            f.write(json.dumps({"id": str(i), "pred": pred, "answer": ans,
                                "a_type": "x"}) + "\n")
    csv_dic = calc_mcq_result(out, 1, qa_file)
    assert csv_dic["acc"] == "75.000000"


def test_unknown_dataset_errors(tmp_path):
    with pytest.raises(SystemExit):
        eval_any_dataset.main(["--dataset", "nope",
                               "--output-dir", str(tmp_path)])


def test_frame_sampling_modes(tmp_path):
    """Reference sampling modes (inference_mcq_vqa.py:244-289): linspace,
    fps, tight fps4 pairs, rvs_movie duplicate pairs, --reproduce."""
    from flash_vstream_tpu.eval.inference_mcq_vqa import sample_frame_paths
    d = tmp_path / "frames_fps4" / "vid"
    d.mkdir(parents=True)
    for t in range(40):
        (d / f"frame_{t:06d}.jpg").write_bytes(b"x")
    d = str(d)
    # max_frames linspace (non-fps4 path name)
    plain = tmp_path / "plain" / "vid"
    plain.mkdir(parents=True)
    for t in range(40):
        (plain / f"frame_{t:06d}.jpg").write_bytes(b"x")
    out = sample_frame_paths(str(plain), None, 8)
    assert len(out) == 8 and out == sorted(out)
    # fps subsample — UNCAPPED: the reference ignores max_frames in fps
    # mode (inference_mcq_vqa.py:284-289)
    out = sample_frame_paths(str(plain), 0.5, None)
    assert len(out) == 20
    assert len(sample_frame_paths(str(plain), 0.5, 8)) == 20
    # tight pairs from an fps4 dir: consecutive (i, i+1) frames
    out = sample_frame_paths(d, None, 8)
    assert len(out) == 8
    for a, b in zip(out[::2], out[1::2]):
        ia = int(a.split("_")[-1].split(".")[0])
        ib = int(b.split("_")[-1].split(".")[0])
        assert ib == ia + 1
    # rvs_movie: each sampled frame duplicated
    out = sample_frame_paths(str(plain), None, 8, dataset="rvs_movie")
    assert len(out) == 8 and all(a == b for a, b in zip(out[::2], out[1::2]))
    # reproduce: every 4th frame
    out = sample_frame_paths(str(plain), None, None, reproduce=True)
    assert len(out) == 10


def make_fake_videochatgpt(root, n_videos=2, n_frames=4):
    """Three-split VideoChatGPT bench layout (reference
    eval_any_dataset.py:117-121)."""
    frame_dir = os.path.join(root, "VideoChatGPTBench",
                             "video_10000frames_high_fps1")
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = os.path.join(frame_dir, f"vid{v}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
            Image.fromarray(img).save(os.path.join(d, f"frame_{i:06d}.jpg"))
    base = os.path.join(root, "VideoChatGPTBench")
    for split in ("generic", "temporal"):
        qa = [{"id": f"{split}{i}", "video_id": f"vid{i % n_videos}",
               "question": f"What happens ({split} {i})?",
               "answer": f"something {i}"} for i in range(2)]
        with open(os.path.join(base, f"test_{split}_qa.json"), "w") as f:
            json.dump(qa, f)
    qa = [{"id": f"cons{i}", "video_id": f"vid{i % n_videos}",
           "question1": f"What occurs in the clip ({i})?",
           "question2": f"Describe what happens ({i}).",
           "answer": f"something {i}"} for i in range(2)]
    with open(os.path.join(base, "test_consistency_qa.json"), "w") as f:
        json.dump(qa, f)


def test_videochatgpt_three_splits(tmp_path, monkeypatch):
    """videochatgpt evaluates generic+temporal+consistency splits and the
    five judge dimensions (reference eval_any_dataset.py:117-121,371-387);
    consistency samples ask BOTH paraphrases and record pred1/pred2."""
    from flash_vstream_tpu.eval import gpt_judge
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    make_fake_videochatgpt(root)
    monkeypatch.setattr(gpt_judge, "_chat_completion",
                        lambda messages, model: "{'score': 4}")
    eval_any_dataset.main([
        "--dataset", "videochatgpt", "--data-root", root,
        "--output-dir", out, "--dry-run", "--max-frames", "4",
    ])
    for split in ("generic", "temporal", "consistency"):
        preds = [json.loads(l)
                 for l in open(os.path.join(out, split, "pred.json"))]
        assert len(preds) == 2
        if split == "consistency":
            assert all("pred1" in p and "pred2" in p for p in preds)
        else:
            assert all("pred" in p for p in preds)
    result = json.load(open(os.path.join(out, "result.json")))
    assert set(result) == {"1_correctness", "2_detailed_orientation",
                           "3_context", "4_temporal", "5_consistency"}
    assert result["5_consistency"] == "4.000000"  # raw 0-5 avg score


def test_vcg_consistency_template_fields():
    """The consistency judge template formats with question1/2 + pred1/2."""
    from flash_vstream_tpu.eval.gpt_judge import VCG_DIMENSIONS
    split, system, template = VCG_DIMENSIONS["5_consistency"]
    assert split == "consistency"
    text = template.format(question1="q1", question2="q2", answer="a",
                           pred1="p1", pred2="p2", id=0, video_id="v")
    assert "q1" in text and "p2" in text


def test_eval_chunked_subprocess(tmp_path):
    """num_chunks > 1: workers run as subprocesses; results merge in scoring."""
    import subprocess
    root = str(tmp_path / "data")
    out = str(tmp_path / "out")
    make_fake_dataset(root, n_q=4)
    eval_any_dataset.main([
        "--dataset", "mvbench", "--data-root", root, "--output-dir", out,
        "--dry-run", "--max-frames", "4", "--num-chunks", "2",
    ])
    import glob
    files = sorted(glob.glob(os.path.join(out, "2_*.json")))
    assert len(files) == 2
    total = sum(1 for f in files for l in open(f) if l.strip())
    assert total == 4
    result = json.load(open(os.path.join(out, "result.json")))
    assert len(result) == 4
