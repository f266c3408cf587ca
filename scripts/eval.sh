#!/bin/bash
# Evaluate the latest checkpoint in MODEL_DIR on the validation split (EMA weights if trained with EMA).
DATA_DIR=${1:?usage: $0 DATA_DIR MODEL_DIR [--train.use_ema]}
MODEL_DIR=${2:?usage: $0 DATA_DIR MODEL_DIR [--train.use_ema]}
exec python -m axcnn.cli.main_classification \
    --config=assemble_resnet50 \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    --runtime.eval_only \
    "${@:3}"
