#!/bin/bash
# Eval runbook (reference eval/README.md): one process per host; videos shard
# across hosts automatically.
MODEL="${MODEL_PATH:?set MODEL_PATH}"
for bench in mlvu videomme mvbench egoschema perception musicqa avsd; do
    data_var="DATA_$(echo "$bench" | tr a-z A-Z)"
    data="${!data_var:-}"
    [ -z "$data" ] && { echo "skip $bench (set $data_var)"; continue; }
    python -m tdc_video_tpu.eval.harness "$bench" \
        --model_path "$MODEL" --data_path "$data" "$@"
done
