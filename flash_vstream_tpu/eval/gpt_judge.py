"""GPT-judged open-ended QA scoring.

Rebuild of Flash-VStream-Qwen/eval_activitynet_qa.py (same as the LLaVA
variant): for each (question, answer, prediction) triple, ask an
openai-protocol chat model for {'pred': yes/no, 'score': 0-5}, with a
multiprocessing pool, a rerun-until-stable loop (L149-183), and ScoreMeter
aggregation (L204-254).

Network access is environment-gated: the client uses OPENAI_API_KEY /
OPENAI_BASE_URL (or AZURE_* equivalents) through stdlib urllib — no sdk
dependency. Without a key, combine_and_score() still merges chunks and
reports what it can.
"""
from __future__ import annotations

import ast
import json
import os
import time
import urllib.request
from multiprocessing.pool import ThreadPool
from typing import Dict, List, Optional

from .scoring import ScoreMeter

JUDGE_SYSTEM = (
    "You are an intelligent chatbot designed for evaluating the correctness "
    "of generative outputs for question-answer pairs. "
    "Your task is to compare the predicted answer with the correct answer "
    "and determine if they match meaningfully.")

JUDGE_TEMPLATE = (
    "Please evaluate the following video-based question-answer pair:\n\n"
    "Question: {question}\n"
    "Correct Answer: {answer}\n"
    "Predicted Answer: {pred}\n\n"
    "Provide your evaluation only as a yes/no and score where the score is "
    "an integer value between 0 and 5, with 5 indicating the highest "
    "meaningful match. Please generate the response in the form of a Python "
    "dictionary string with keys 'pred' and 'score', where value of 'pred' "
    "is a string of 'yes' or 'no' and value of 'score' is in INTEGER, not "
    "STRING. DO NOT PROVIDE ANY OTHER OUTPUT TEXT OR EXPLANATION. Only "
    "provide the Python dictionary string. For example, your response should "
    "look like this: {{'pred': 'yes', 'score': 4.8}}.")


def _chat_completion(messages: List[dict], model: str) -> str:
    api_key = os.environ.get("OPENAI_API_KEY")
    if not api_key:
        raise RuntimeError("OPENAI_API_KEY not set; GPT judging unavailable")
    base = os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
    req = urllib.request.Request(
        f"{base}/chat/completions",
        data=json.dumps({"model": model, "messages": messages}).encode(),
        headers={"Authorization": f"Bearer {api_key}",
                 "Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        out = json.loads(resp.read())
    return out["choices"][0]["message"]["content"]


def judge_one(item: dict, model: str = "gpt-3.5-turbo-0125") -> Optional[dict]:
    """Score one QA triple; returns {'pred': 'yes'/'no', 'score': float}."""
    try:
        content = _chat_completion([
            {"role": "system", "content": JUDGE_SYSTEM},
            {"role": "user", "content": JUDGE_TEMPLATE.format(
                question=item["question"], answer=item["answer"],
                pred=item["pred"])},
        ], model)
        return ast.literal_eval(content)
    except Exception as e:
        print(f"judge error on id={item.get('id')}: {e}")
        return None


def judge_all(items: List[dict], out_path: str,
              model: str = "gpt-3.5-turbo-0125", workers: int = 8,
              max_stall_rounds: int = 5) -> Dict[str, dict]:
    """Rerun-until-stable judging loop (eval_activitynet_qa.py:149-183):
    retry incomplete items each round; stop after max_stall_rounds rounds
    with no progress. Results are checkpointed to out_path."""
    results: Dict[str, dict] = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))
    stall, last_incomplete = 0, None
    while True:
        todo = [it for it in items if str(it["id"]) not in results]
        if not todo:
            break
        with ThreadPool(workers) as pool:
            scored = pool.map(lambda it: (it, judge_one(it, model)), todo)
        for it, res in scored:
            if res is not None:
                results[str(it["id"])] = {**it, "judge": res}
        with open(out_path, "w") as f:
            json.dump(results, f)
        incomplete = len(items) - len(results)
        print(f"judge round done: {incomplete} incomplete")
        if incomplete == last_incomplete:
            stall += 1
            if stall >= max_stall_rounds:
                break
        else:
            stall = 0
        last_incomplete = incomplete
        time.sleep(1)
    return results


def aggregate(results: Dict[str, dict]) -> Dict[str, str]:
    """Accuracy + average score (eval_activitynet_qa.py:204-254)."""
    meter = ScoreMeter()
    by_type: Dict[str, ScoreMeter] = {}
    for r in results.values():
        j = r.get("judge", {})
        meter.add_score(float(j.get("score", 0)), j.get("pred", "no"))
        t = r.get("a_type")
        if t is not None:
            by_type.setdefault(str(t), ScoreMeter()).add_score(
                float(j.get("score", 0)), j.get("pred", "no"))
    out = {"accuracy": meter.get_accuracy("yes"),
           "avg_score": meter.get_average_score()}
    for t, m in sorted(by_type.items()):
        out[f"type_{t}_acc"] = m.get_accuracy("yes")
    return out
