#!/usr/bin/env bash
# Batch eval: inference over a dataset + scoring (reference flow:
# python3 -m chatts.utils.inference_tsmllm_vllm then
# python3 -m evaluation.evaluate_tsmllm_models).
# Usage: scripts/run_eval.sh <dataset.json> <model_ckpt_dir> [exp_name]
set -euo pipefail
cd "$(dirname "$0")/.."
DATASET=${1:?dataset json required}
MODEL=${2:?model checkpoint dir required}
EXP=${3:-chatts_eval}

python - <<EOF
import json
from chatts_tpu.eval.inference import load_eval_dataset, run_inference, evaluate_experiment
from chatts_tpu.eval.judge_config import load_judge
from chatts_tpu.eval.scorers import null_judge
from chatts_tpu.models import weights
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.serve.scheduler import ServeEngine
from chatts_tpu.utils.llm_client import LLMClient

dataset = load_eval_dataset("$DATASET")
cfg, params, tokenizer = weights.from_pretrained("$MODEL")
engine = ServeEngine(params, cfg, ChatTSProcessor(tokenizer, cfg),
                     eos_token_ids=(tokenizer.eos_token_id,))
client = LLMClient(engine="tpu-ts", serve_engine=engine,
                   sampling_params={"max_tokens": 512, "temperature": 0.2})
try:
    run_inference(dataset, client, "$EXP", patch_size=cfg.ts.patch_size)
finally:
    client.kill()
judge = load_judge() or null_judge
summary = evaluate_experiment(dataset, "$EXP", judge=judge)
print(json.dumps(summary, indent=2))
EOF
