#!/bin/bash
# Full Assemble-ResNet-50 from scratch (reference: scripts/train_assemble_from_scratch.sh).
# North star: >=82.8% top-1 (BASELINE.json).
DATA_DIR=${1:?usage: $0 DATA_DIR MODEL_DIR}
MODEL_DIR=${2:?usage: $0 DATA_DIR MODEL_DIR}
exec python -m axcnn.cli.main_classification \
    --config=assemble_resnet50 \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    "${@:3}"
