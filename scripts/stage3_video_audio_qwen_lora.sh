#!/bin/bash
# Stage 3: audio+video LoRA (reference scripts/stage3/train_video_audio_qwen_lora.sh:
# lora r=128 alpha=256, audio_input on)
python -m tdc_video_tpu.train.run --stage 3 \
    --model_path "${PREV_STAGE_CHECKPOINT:-./checkpoints/stage2_qwen}" \
    --data_path "${PATH_TO_JSON:?set PATH_TO_JSON}" \
    --image_folder "${PATH_TO_FOLDER:?set PATH_TO_FOLDER}" \
    --audio_folder "${PATH_TO_AUDIO:-}" \
    --output_dir ./checkpoints/stage3_qwen_lora \
    "$@"
