#!/bin/bash
# Assemble-ResNet-152 with KD from a trained teacher (BASELINE config 5).
DATA_DIR=${1:?usage: $0 DATA_DIR MODEL_DIR TEACHER_CKPT_DIR}
MODEL_DIR=${2:?usage: $0 DATA_DIR MODEL_DIR TEACHER_CKPT_DIR}
TEACHER=${3:?usage: $0 DATA_DIR MODEL_DIR TEACHER_CKPT_DIR}
exec python -m axcnn.cli.main_classification \
    --config=assemble_resnet152_kd \
    --data.data_dir="$DATA_DIR" \
    --runtime.model_dir="$MODEL_DIR" \
    --train.kd_teacher_checkpoint="$TEACHER" \
    "${@:4}"
