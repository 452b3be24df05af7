"""Supervised training data pipeline.

Rebuild of the reference's dataset/collator stack
(Flash-VStream-LLaVA/flash_vstream/train/train.py:428-853: preprocess_v1 /
preprocess_plain, LazySupervisedDataset with precomputed-feature loading,
DataCollatorForSupervisedDataset; vstream_trainer.py:56-148
LengthGroupedSampler):

- conversation json schema matches the reference ({id, video?, conversations:
  [{from: human|gpt, value}]}).
- video features load from .safetensors (key 'feature') or .npy; raw frame
  dirs decode via preprocess/video.
- TPU-first collation: every batch is padded to a (frame-bucket, pre-image
  length, post-image length) triple so the spliced sequence is fixed-shape;
  the image splice slot is the same for the whole batch (left-pad the
  pre-image segment), which is what lets the whole train step live in one
  pjit program.
"""
from __future__ import annotations

import dataclasses
import json
import os
import random
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.config import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from ..preprocess.prompts import conv_templates
from ..preprocess.tokenizer import tokenizer_image_token


def preprocess_v1(conversations: List[dict], tokenizer,
                  has_image: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Vicuna-v1 round tokenization with assistant-only supervision.

    Mirrors preprocess_v1 (train.py:428-507): the prompt is the full
    conversation; labels mask everything except assistant replies (IGNORE
    elsewhere), with round boundaries located by the separators."""
    conv = conv_templates["vicuna_v1"].copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    src = conversations
    if src and roles.get(src[0]["from"]) != conv.roles[0]:
        src = src[1:]
    for i, s in enumerate(src):
        conv.append_message(roles[s["from"]], s["value"])
    prompt = conv.get_prompt()

    def tok(text):
        if has_image:
            return tokenizer_image_token(text, tokenizer).tolist()
        return list(tokenizer.encode(text))

    input_ids = np.asarray(tok(prompt), np.int64)
    labels = np.full_like(input_ids, IGNORE_INDEX)

    # supervise each assistant turn: find its text span by tokenizing the
    # conversation prefix up to and including the turn. cur starts at 1 to
    # skip the BOS token (the reference's cur_len = 1, train.py:464), since
    # the per-round token counts below exclude it.
    sep2 = conv.sep2
    rounds = prompt.split(sep2)
    cur = 1 if len(input_ids) and input_ids[0] == getattr(
        tokenizer, "bos_token_id", None) else 0
    for r in rounds:
        if not r:
            continue
        full_round = r + sep2
        parts = full_round.split(conv.roles[1] + ": ")
        round_len = len(tok(full_round)) - 1          # strip per-chunk BOS
        if len(parts) == 2:
            instruction_len = len(tok(parts[0] + conv.roles[1] + ": ")) - 1
            lo = cur + instruction_len
            hi = cur + round_len
            labels[lo:hi] = input_ids[lo:hi]
        cur += round_len
    return input_ids, labels


def preprocess_llama_2(conversations: List[dict], tokenizer,
                       has_image: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Llama-2 chat tokenization with assistant-only supervision.

    Mirrors preprocess_llama_2 (train.py:345-425): rounds split on '</s>',
    the supervised span of each round starts after '[/INST] '."""
    conv = conv_templates["llama_2"].copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    src = conversations
    if src and roles.get(src[0]["from"]) != conv.roles[0]:
        src = src[1:]
    for s in src:
        conv.append_message(roles[s["from"]], s["value"])
    prompt = conv.get_prompt()

    def tok(text):
        if has_image:
            return tokenizer_image_token(text, tokenizer).tolist()
        return list(tokenizer.encode(text))

    input_ids = np.asarray(tok(prompt), np.int64)
    labels = np.full_like(input_ids, IGNORE_INDEX)

    sep = "[/INST] "
    cur = 1 if len(input_ids) and input_ids[0] == getattr(
        tokenizer, "bos_token_id", None) else 0
    for r in prompt.split(conv.sep2):
        if not r:
            continue
        full_round = r + conv.sep2
        parts = full_round.split(sep)
        round_len = len(tok(full_round)) - 1          # strip per-chunk BOS
        if len(parts) == 2:
            instruction_len = len(tok(parts[0] + sep)) - 1
            labels[cur + instruction_len:cur + round_len] = \
                input_ids[cur + instruction_len:cur + round_len]
        cur += round_len
    return input_ids, labels


def preprocess_mpt(conversations: List[dict], tokenizer,
                   has_image: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """MPT/ChatML-style tokenization with assistant-only supervision.

    Mirrors preprocess_mpt (train.py:509-575): the prompt splits on the
    '<|im_end|>' separator; chunks opening with the assistant role are
    supervised past the role header (the reference regroups chunks into
    [system+user+gpt] / [user+gpt] rounds before splitting on sep+role —
    same spans, this walks the chunks directly)."""
    conv = conv_templates["mpt"].copy()
    roles = {"human": conv.roles[0], "gpt": conv.roles[1]}
    src = conversations
    if src and roles.get(src[0]["from"]) != conv.roles[0]:
        src = src[1:]
    for s in src:
        conv.append_message(roles[s["from"]], s["value"])
    prompt = conv.get_prompt()

    def tok(text):
        if has_image:
            return tokenizer_image_token(text, tokenizer).tolist()
        return list(tokenizer.encode(text))

    input_ids = np.asarray(tok(prompt), np.int64)
    labels = np.full_like(input_ids, IGNORE_INDEX)

    cur = 1 if len(input_ids) and input_ids[0] == getattr(
        tokenizer, "bos_token_id", None) else 0
    chunks = prompt.split(conv.sep)
    for i, chunk in enumerate(chunks):
        if not chunk:
            continue
        piece = chunk + conv.sep if i < len(chunks) - 1 else chunk
        n = len(tok(piece)) - 1                       # strip per-chunk BOS
        if chunk.startswith(conv.roles[1]):
            ins = len(tok(conv.roles[1])) - 1
            # the closing sep is supervised with the reply (the reference's
            # round_len includes it, train.py:556)
            labels[cur + ins:cur + n] = input_ids[cur + ins:cur + n]
        cur += n
    return input_ids, labels


PREPROCESS_BY_VERSION = {
    "v1": preprocess_v1,
    "vicuna_v1": preprocess_v1,
    "llama_2": preprocess_llama_2,
    "mpt": preprocess_mpt,
}


def preprocess_plain(conversations: List[dict], tokenizer
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Pretrain-style: '<image>\\ncaption' with only the caption supervised
    (train.py:576-595)."""
    assert len(conversations) == 2
    caption = conversations[1]["value"]
    prompt = "<image>" + caption + "\n"
    input_ids = tokenizer_image_token(prompt, tokenizer)
    labels = input_ids.copy()
    # mask everything up to (and incl.) the image token
    (img_pos,) = np.where(input_ids == IMAGE_TOKEN_INDEX)
    labels[:img_pos[0] + 1] = IGNORE_INDEX
    return input_ids, labels


@dataclasses.dataclass
class DataConfig:
    data_path: str = ""
    video_dir: str = ""
    feature_dir: Optional[str] = None     # precomputed .safetensors features
    video_max_frames: int = 50
    conv_version: str = "v1"              # or "plain"
    frame_bucket: int = 64
    max_text_len: int = 512
    image_size: int = 224                 # host resize target for raw media
    # raw-video subsampling beyond video_max_frames (reference
    # DataArguments.video_sample_type, train.py:86 + 768-780):
    # "" = evenly-spaced truncation; "center" = middle window;
    # "uniform" = the reference's round((i+1)*scale - 1) index rule
    video_sample_type: str = ""


def breakpoint_slice_features(feature: np.ndarray, item: dict) -> np.ndarray:
    """Breakpoint-mode time slicing of precomputed features.

    Mirrors the reference LazySupervisedDataset exactly
    (Flash-VStream-LLaVA/flash_vstream/train/train.py:740-756): items with a
    'time' key (realtime VStream-QA sets) slice a window around the question
    timestamp — ±15 frames by default, ±9 if a 'time_9' key is present, and
    for 'time_9dense' a ±54 window around time_9dense//4; items with ONLY a
    'time_9dense' key subsample the whole feature [::6]."""
    if "time" in item:
        if "time_9dense" in item:
            tim = int(item["time_9dense"]) // 4
            start = max(tim - 6 * 9, 0)
            end = min(tim + 6 * 9, feature.shape[0])
        else:
            expansion = 9 if "time_9" in item else 15
            tim = int(item["time"])
            start = max(tim - expansion, 0)
            end = min(tim + expansion, feature.shape[0])
        return feature[start:end]
    if "time_9dense" in item:
        return feature[::6]
    return feature


def sample_type_indices(n: int, max_frames: int, sample_type: str) -> list:
    """Frame-index subsampling beyond max_frames (reference
    train.py:768-780). Returns indices into the fps-sampled frame list."""
    idx = list(range(n))
    if n <= max_frames:
        return idx
    if sample_type == "center":
        start = (n - max_frames) // 2
        return idx[start:start + max_frames]
    if sample_type == "uniform":
        scale = 1.0 * n / max_frames
        # round-half-even like python round(), matching the reference
        return [idx[round((i + 1) * scale - 1)] for i in range(max_frames)]
    if n > 18000:
        # the reference's emergency cap for un-typed huge videos
        scale = 1.0 * n / 180
        return [idx[round((i + 1) * scale - 1)] for i in range(180)]
    return idx


class SupervisedVideoDataset:
    """Lazy dataset over conversation-json + videos/features
    (LazySupervisedDataset analog, train.py:645-816)."""

    def __init__(self, cfg: DataConfig, tokenizer, retries: int = 10,
                 rng: Optional[random.Random] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.items = json.load(open(cfg.data_path))
        self.retries = retries
        self.rng = rng or random.Random(0)

    def __len__(self):
        return len(self.items)

    def _load_video_features(self, name: str) -> np.ndarray:
        """[T, P, D] float features from safetensors/npy feature files."""
        base = os.path.join(self.cfg.feature_dir, name)
        for ext in (".safetensors", ".npy"):
            p = base + ext if not base.endswith(ext) else base
            if os.path.exists(p):
                if p.endswith(".safetensors"):
                    from safetensors.numpy import load_file
                    d = load_file(p)
                    key = "feature" if "feature" in d else next(iter(d))
                    return d[key]
                return np.load(p)
        raise FileNotFoundError(base)

    def _subsample(self, x: np.ndarray) -> np.ndarray:
        T = x.shape[0]
        m = self.cfg.video_max_frames
        if T > m:
            idx = np.linspace(0, T - 1, m).round().astype(int)
            x = x[idx]
        return x

    def __getitem__(self, i: int) -> dict:
        """Returns {'input_ids', 'labels', 'features' or 'frames', 'n_frames'}.
        Corrupt items resample randomly (train.py:680-793)."""
        for attempt in range(self.retries):
            item = self.items[i]
            try:
                conv = item["conversations"]
                if self.cfg.conv_version == "plain":
                    ids, labels = preprocess_plain(conv, self.tokenizer)
                else:
                    fn = PREPROCESS_BY_VERSION[self.cfg.conv_version]
                    ids, labels = fn(conv, self.tokenizer,
                                     has_image="video" in item
                                     or "image" in item)
                out = {"input_ids": ids, "labels": labels, "id": item.get("id", i)}
                if "video" in item:
                    if self.cfg.feature_dir:
                        feats = np.asarray(
                            self._load_video_features(item["video"]),
                            np.float32)
                        # breakpoint-mode time slicing (realtime VStream-QA
                        # sets; reference train.py:740-756)
                        feats = breakpoint_slice_features(feats, item)
                        out["features"] = self._subsample(feats)
                        out["n_frames"] = out["features"].shape[0]
                    else:
                        # raw-video branch (reference train.py:764-793):
                        # decode frames, CLIP pad-to-square + resize on host
                        from ..preprocess.image import clip_resize_u8
                        from ..preprocess.video import load_video
                        path = os.path.join(self.cfg.video_dir, item["video"])
                        if self.cfg.video_sample_type:
                            # center/uniform selection over the fps-sampled
                            # list (reference train.py:768-780)
                            frames = list(load_video(path))
                            sel = sample_type_indices(
                                len(frames), self.cfg.video_max_frames,
                                self.cfg.video_sample_type)
                            frames = [frames[j] for j in sel]
                        else:
                            frames = list(load_video(
                                path, max_frames=self.cfg.video_max_frames))
                        out["frames"] = list(
                            clip_resize_u8(frames, self.cfg.image_size))
                        out["n_frames"] = len(out["frames"])
                elif "image" in item:
                    # single-image branch (reference train.py:694-716):
                    # full patch features spliced without memory compression
                    from PIL import Image
                    from ..preprocess.image import clip_resize_u8
                    img = np.asarray(Image.open(os.path.join(
                        self.cfg.video_dir, item["image"])).convert("RGB"))
                    out["image_frame"] = clip_resize_u8(
                        [img], self.cfg.image_size)[0]
                return out
            except Exception as e:
                if attempt == self.retries - 1:
                    raise
                i = self.rng.randrange(len(self.items))
        raise RuntimeError("unreachable")

    def modality_lengths(self) -> List[int]:
        """Signed text lengths: positive for multimodal, negative for
        text-only (LengthGroupedSampler input, vstream_trainer.py:117-148)."""
        out = []
        for item in self.items:
            l = sum(len(c["value"].split()) for c in item["conversations"])
            out.append(l if ("video" in item or "image" in item) else -l)
        return out


def proportional_schedule(sizes: Dict, total_steps: int) -> List:
    """Deterministic largest-remainder interleaving: each step draws from one
    group, groups picked proportionally to their size (a 9:1 dataset trains
    its groups 9:1, matching the reference's uniform-over-dataset sampling
    in HF Trainer). Keys keep their insertion order for tie-breaking."""
    keys = list(sizes)
    total = sum(sizes.values())
    credit = {k: 0.0 for k in keys}
    schedule = []
    for _ in range(total_steps):
        for k in keys:
            credit[k] += sizes[k] / total
        pick = max(keys, key=lambda k: credit[k])
        credit[pick] -= 1.0
        schedule.append(pick)
    return schedule


def length_grouped_indices(lengths: Sequence[int], batch_size: int,
                           world_size: int, seed: int = 0) -> List[int]:
    """Modality-grouped megabatch shuffling (vstream_trainer.py:56-114):
    multimodal and text-only samples form separate megabatches, each sorted
    by length, megabatches shuffled."""
    rng = random.Random(seed)
    mm = [i for i, l in enumerate(lengths) if l > 0]
    lang = [i for i, l in enumerate(lengths) if l <= 0]
    rng.shuffle(mm)
    rng.shuffle(lang)
    mega = world_size * batch_size

    def make_megabatches(idx):
        batches = [idx[i:i + mega] for i in range(0, len(idx), mega)]
        return [sorted(b, key=lambda j: abs(lengths[j]), reverse=True)
                for b in batches]

    megabatches = make_megabatches(mm) + make_megabatches(lang)
    rng.shuffle(megabatches)
    return [i for b in megabatches for i in b]


def collate_llava(samples: List[dict], frame_bucket: int, pad_id: int,
                  max_text_len: int = 512,
                  fixed_pre_len: Optional[int] = None,
                  fixed_post_len: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Fixed-shape batch: splits each sequence at the image token, left-pads
    the pre segment and right-pads the post segment so the splice slot is
    batch-constant (pass fixed_pre/post_len to keep it constant across
    batches and avoid re-jits). Returns arrays ready for llava_forward_train."""
    pres, posts, lpres, lposts = [], [], [], []
    for s in samples:
        ids, labels = s["input_ids"], s["labels"]
        (img_pos,) = np.where(ids == IMAGE_TOKEN_INDEX)
        p = int(img_pos[0])
        pres.append(ids[:p][-max_text_len:])
        posts.append(ids[p + 1:][:max_text_len])
        lpres.append(labels[:p][-max_text_len:])
        lposts.append(labels[p + 1:][:max_text_len])
    P = fixed_pre_len or max(len(x) for x in pres)
    Q = fixed_post_len or max(len(x) for x in posts)
    pres = [x[-P:] for x in pres]
    posts = [x[:Q] for x in posts]
    lpres = [x[-P:] for x in lpres]
    lposts = [x[:Q] for x in lposts]
    B = len(samples)

    input_ids = np.full((B, P + 1 + Q), pad_id, np.int64)
    seg = np.full((B, 0), 0)  # segment ids computed on the spliced layout
    for b in range(B):
        input_ids[b, P - len(pres[b]):P] = pres[b]
        input_ids[b, P] = IMAGE_TOKEN_INDEX
        input_ids[b, P + 1:P + 1 + len(posts[b])] = posts[b]

    # features / frames / single image
    if "features" in samples[0]:
        Pp, D = samples[0]["features"].shape[1:]
        feats = np.zeros((B, frame_bucket, Pp, D), np.float32)
        for b, s in enumerate(samples):
            feats[b, :s["n_frames"]] = s["features"]
        media = {"features": feats}
        n_frames = [min(s["n_frames"], frame_bucket) for s in samples]
    elif "image_frame" in samples[0]:
        media = {"image": np.stack([s["image_frame"] for s in samples])}
        n_frames = [1] * B
    else:
        shp = samples[0]["frames"][0].shape
        frames = np.zeros((B, frame_bucket, *shp), np.uint8)
        for b, s in enumerate(samples):
            for t, f in enumerate(s["frames"][:frame_bucket]):
                frames[b, t] = f
        media = {"frames": frames}
        n_frames = [min(s["n_frames"], frame_bucket) for s in samples]

    return {
        "input_ids": input_ids, "image_slot": P,
        "n_frames": np.asarray(n_frames, np.int32),
        "pre_lens": np.asarray([len(x) for x in pres], np.int32),
        "labels_pre": _pad_left([l for l in lpres], P),
        "labels_post": _pad_right([l for l in lposts], Q),
        **media,
    }


def collate_text(samples: List[dict], pad_id: int, fixed_len: int
                 ) -> Dict[str, np.ndarray]:
    """Text-only batch (no media, no splice): right-padded fixed shape
    (reference text-only path, train.py:803-816)."""
    B = len(samples)
    ids = np.full((B, fixed_len), pad_id, np.int64)
    labels = np.full((B, fixed_len), IGNORE_INDEX, np.int64)
    seg = np.full((B, fixed_len), -1, np.int32)
    for b, s in enumerate(samples):
        x, l = s["input_ids"][:fixed_len], s["labels"][:fixed_len]
        ids[b, :len(x)] = x
        labels[b, :len(l)] = l
        seg[b, :len(x)] = 0
    return {"input_ids": ids, "labels": labels, "segments": seg}


def _pad_left(xs, n):
    out = np.full((len(xs), n), IGNORE_INDEX, np.int64)
    for i, x in enumerate(xs):
        if len(x):
            out[i, n - len(x):] = x
    return out


def _pad_right(xs, n):
    out = np.full((len(xs), n), IGNORE_INDEX, np.int64)
    for i, x in enumerate(xs):
        if len(x):
            out[i, :len(x)] = x
    return out


def spliced_labels(batch: Dict[str, np.ndarray], n_mem: int) -> np.ndarray:
    """Labels aligned to the spliced embedding layout
    [pre | n_mem memory tokens (IGNORE) | post]."""
    B = batch["labels_pre"].shape[0]
    mem = np.full((B, n_mem), IGNORE_INDEX, np.int64)
    return np.concatenate([batch["labels_pre"], mem, batch["labels_post"]], 1)


def spliced_segments(batch: Dict[str, np.ndarray], n_mem: int,
                     pad_id: int) -> np.ndarray:
    """Segment ids for the spliced layout: -1 at padding, 0 at real tokens."""
    ids = batch["input_ids"]
    P = batch["image_slot"]
    B, S = ids.shape
    pre_valid = np.zeros((B, P), np.int32) - (ids[:, :P] == pad_id)
    post_valid = np.zeros((B, S - P - 1), np.int32) - (ids[:, P + 1:] == pad_id)
    mem = np.zeros((B, n_mem), np.int32)
    return np.concatenate([pre_valid, mem, post_valid], 1)
