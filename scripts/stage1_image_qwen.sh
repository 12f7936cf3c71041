#!/bin/bash
# Stage 1: image alignment (reference scripts/stage1/train_image_qwen.sh)
# One process per TPU host; chips are addressed through the mesh.
python -m tdc_video_tpu.train.run --stage 1 \
    --model_path "${BASE_CHECKPOINT:-./checkpoints/Qwen2-7B-Instruct}" \
    --data_path "${PATH_TO_JSON:?set PATH_TO_JSON}" \
    --image_folder "${PATH_TO_FOLDER:?set PATH_TO_FOLDER}" \
    --output_dir ./checkpoints/stage1_qwen \
    "$@"
