#!/usr/bin/env python3
"""Merge LoRA adapters into base weights and export safetensors.

Rebuild of Flash-VStream-LLaVA/scripts/merge_lora_weights.py /
the merged-model save in Flash-VStream-Qwen/finetune_flash.py:600-617.
"""
import argparse

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--base-checkpoint", required=True,
                   help="orbax checkpoint dir of base params")
    p.add_argument("--lora-checkpoint", required=True,
                   help="orbax checkpoint dir of adapter params")
    p.add_argument("--output", required=True, help="output .safetensors path")
    p.add_argument("--rank", type=int, default=64)
    p.add_argument("--alpha", type=float, default=32)
    args = p.parse_args()

    from flash_vstream_tpu.train.checkpoint import (export_safetensors,
                                                    restore_checkpoint)
    from flash_vstream_tpu.train.lora import merge_lora

    _, base = restore_checkpoint(args.base_checkpoint)
    _, lora = restore_checkpoint(args.lora_checkpoint)
    merged = merge_lora(base["params"], lora["params"], alpha=args.alpha,
                        rank=args.rank)
    export_safetensors(args.output, merged)
    print(f"merged weights written to {args.output}")


if __name__ == "__main__":
    main()
