#!/usr/bin/env bash
# HTTP serving ingress at the canonical operating point — the multi-host
# entry the reference lacks (its only ingress is its own load generator).
#
#   ./scripts/run_serve.sh            # rm1, port 8321
#   MODEL=ncf PORT=9000 ./scripts/run_serve.sh
#
# Then:  curl -X POST localhost:8321/v1/infer -d '{"batch_size": 165}'
#        curl localhost:8321/v1/stats
set -euo pipefail
cd "$(dirname "$0")/.."

MODEL="${MODEL:-rm1}"
PORT="${PORT:-8321}"
ENGINES="${ENGINES:-2}"

exec python -m deeprecsys_tpu.main \
  --model "$MODEL" \
  --serve --port "$PORT" \
  --inference_engines "$ENGINES" \
  --sub_task_batch_size 64 \
  --max_mini_batch_size 1024 \
  --batch_size_distribution normal --avg_mini_batch_size 165 --var_mini_batch_size 16 \
  --bucket_policy auto \
  "$@"
