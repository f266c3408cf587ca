#!/bin/bash
# FGVC transfer fine-tune from a pretrained Assemble checkpoint (reference fine-tune scripts).
DATASET=${1:?usage: $0 DATASET DATA_DIR MODEL_DIR PRETRAINED_CKPT_DIR}
DATA_DIR=${2:?usage: $0 DATASET DATA_DIR MODEL_DIR PRETRAINED_CKPT_DIR}
MODEL_DIR=${3:?usage: $0 DATASET DATA_DIR MODEL_DIR PRETRAINED_CKPT_DIR}
PRETRAINED=${4:?usage: $0 DATASET DATA_DIR MODEL_DIR PRETRAINED_CKPT_DIR}
exec python -m axcnn.cli.main_classification \
    --config=finetune_fgvc \
    --data.dataset_name="$DATASET" \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    --train.pretrained_checkpoint="$PRETRAINED" \
    "${@:5}"
