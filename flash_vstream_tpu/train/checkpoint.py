"""Checkpoint save/restore with auto-resume.

Reference behavior: HF Trainer checkpoints with resume-if-exists
(train.py:1036-1039, finetune_flash.py:593-596), adapter-only saves
(mm_projector.bin, train.py:199-221), and merged LoRA export
(finetune_flash.py:600-617). Here: orbax-backed step directories
(checkpoint-<step>/) holding {params, opt_state, step}, plus safetensors
export of (optionally LoRA-merged) params for interchange.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _ckpt_dirs(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    out = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            out.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(out)


def latest_checkpoint(output_dir: str) -> Optional[Tuple[int, str]]:
    dirs = _ckpt_dirs(output_dir)
    return dirs[-1] if dirs else None


def save_checkpoint(output_dir: str, step: int, params: Any,
                    opt_state: Any = None, keep: int = 3) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    ckptr.save(path, payload, force=True)
    # prune old checkpoints
    dirs = _ckpt_dirs(output_dir)
    for _, old in dirs[:-keep]:
        import shutil
        shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(output_dir: str, template: Any = None
                       ) -> Optional[Tuple[int, Any]]:
    """Restore the latest checkpoint; returns (step, payload) or None."""
    import orbax.checkpoint as ocp
    latest = latest_checkpoint(output_dir)
    if latest is None:
        return None
    step, path = latest
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(path), item=template)
    return step, payload


def export_safetensors(path: str, params: Any, prefix: str = ""):
    """Flatten a param tree to one .safetensors file (interchange format)."""
    from safetensors.numpy import save_file
    flat = {}

    def visit(p, x):
        if isinstance(x, dict):
            for k, v in x.items():
                visit(f"{p}.{k}" if p else k, v)
        elif hasattr(x, "_fields"):  # NamedTuple (checked before tuple!)
            for k in x._fields:
                visit(f"{p}.{k}", getattr(x, k))
        elif isinstance(x, (list, tuple)):
            for i, v in enumerate(x):
                visit(f"{p}.{i}", v)
        else:
            flat[prefix + p] = np.asarray(x)

    visit("", params)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(flat, path)
    return flat
