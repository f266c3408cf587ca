#!/bin/bash
# ImageNet-C mCE evaluation (reference mCE mode; SURVEY.md §3.4).
# DATA_DIR layout: <corruption>/<severity>/validation-* TFRecord shards.
DATA_DIR=${1:?usage: $0 IMAGENET_C_DIR MODEL_DIR}
MODEL_DIR=${2:?usage: $0 IMAGENET_C_DIR MODEL_DIR}
exec python -m axcnn.cli.main_classification \
    --config=assemble_resnet50 \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    --runtime.eval_imagenet_c \
    "${@:3}"
