#!/usr/bin/env bash
# Start the OpenAI-compatible ChatTS server (reference:
# scripts/start_vllm_server.sh — vllm serve ./ckpt on :12345, model name
# "chatts", ≤15 timeseries per prompt, max_model_len 6000).
set -euo pipefail
cd "$(dirname "$0")/.."
MODEL=${1:-./ckpt}
PORT=${PORT:-12345}
MAX_MODEL_LEN=${MAX_MODEL_LEN:-6144}
MAX_BATCH=${MAX_BATCH:-8}
EXTRA=()
[[ "${QUANTIZE_INT8:-0}" == "1" ]] && EXTRA+=(--quantize-int8)
[[ "${QUANTIZE_INT4:-0}" == "1" ]] && EXTRA+=(--quantize-int4)
[[ "${KV_INT8:-0}" == "1" ]] && EXTRA+=(--kv-int8)
[[ -n "${PREFILL_CHUNK:-}" ]] && EXTRA+=(--prefill-chunk "$PREFILL_CHUNK")
[[ -n "${DECODE_CHUNK:-}" ]] && EXTRA+=(--decode-chunk "$DECODE_CHUNK")
exec python examples/serve_openai.py --model "$MODEL" --port "$PORT" \
  --max-model-len "$MAX_MODEL_LEN" --max-batch-size "$MAX_BATCH" "${EXTRA[@]}"
