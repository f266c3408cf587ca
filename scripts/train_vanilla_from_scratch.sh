#!/bin/bash
# Vanilla ResNet-50 from scratch on ImageNet (reference: scripts/train_vanilla_from_scratch.sh).
# Expected: ~76.9% top-1 (SURVEY.md §6).
DATA_DIR=${1:?usage: $0 DATA_DIR MODEL_DIR}
MODEL_DIR=${2:?usage: $0 DATA_DIR MODEL_DIR}
exec python -m axcnn.cli.main_classification \
    --config=vanilla_resnet50 \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    "${@:3}"
