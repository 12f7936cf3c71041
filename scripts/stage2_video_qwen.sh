#!/bin/bash
# Stage 2: video SFT (reference scripts/stage2/train_video_qwen.sh:
# lr 5e-6, 144 image tokens, fps 1, K=16 context tokens, bs 1 x accum 2)
python -m tdc_video_tpu.train.run --stage 2 \
    --model_path "${PREV_STAGE_CHECKPOINT:-./checkpoints/stage1_qwen}" \
    --data_path "${PATH_TO_JSON:?set PATH_TO_JSON}" \
    --image_folder "${PATH_TO_FOLDER:?set PATH_TO_FOLDER}" \
    --output_dir ./checkpoints/stage2_qwen \
    "$@"
