#!/bin/bash
# Two-stage LLaVA-family training + evaluation on TPU.
# Mirrors Flash-VStream-LLaVA/scripts/train_and_eval.sh (STAR config:
# cur 1x8^2, long 25x4^2, Turing 25x1^2, weighted_kmeans; pretrain lr 1e-3,
# finetune lr 2e-5) on a dp x tp mesh instead of DeepSpeed ZeRO.
set -e

MODEL_PATH=${MODEL_PATH:-checkpoints/vicuna-7b-v1.5-clip336}
DATA_ROOT=${DATA_ROOT:-data}
OUT=${OUT:-checkpoints/flash-vstream-tpu-7b}
TP=${TP:-1}

# Stage 1: projector + NTM pretraining (plain template)
python -m flash_vstream_tpu.train.train \
    --stage pretrain \
    --model-path "$MODEL_PATH" \
    --data-path "$DATA_ROOT/pretrain/train.json" \
    --feature-dir "$DATA_ROOT/pretrain/features" \
    --output-dir "$OUT-pretrain" \
    --batch-size 32 --grad-accum 1 --epochs 1 \
    --learning-rate 1e-3 --tp "$TP"

# Stage 2: full finetune (vicuna_v1 template, vision tower frozen)
python -m flash_vstream_tpu.train.train \
    --stage finetune \
    --model-path "$MODEL_PATH" \
    --data-path "$DATA_ROOT/finetune/train.json" \
    --feature-dir "$DATA_ROOT/finetune/features" \
    --output-dir "$OUT" \
    --batch-size 16 --grad-accum 1 --epochs 1 \
    --learning-rate 2e-5 --tp "$TP"

# Evaluation over the feature-based QA sets
for DS in msvd msrvtt actnet nextoe vsmovienet vsego4d; do
    python -m flash_vstream_tpu.eval.eval_any_dataset_features \
        --dataset "$DS" --data-root "$DATA_ROOT/eval_video" \
        --model-path "$OUT" --output-dir "eval_output/$DS"
done
