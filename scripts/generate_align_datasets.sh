#!/usr/bin/env bash
# Generate the six alignment datasets (reference:
# scripts/generate_align_datasets.sh runs the six align module mains in
# order).  Template pipelines are pure-CPU; LLM-assisted ones default to the
# dryrun engine — point CHATTS_LLM_URL at an OpenAI-compatible endpoint (e.g.
# examples/serve_openai.py) for real physical-meaning generation.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${DATA_OUTPUT_DIR:-data}
NUM=${NUM_DATA:-100}
SEED=${SEED:-0}

python -m chatts_tpu.datagen.align.uts_template_qa \
  --output "$OUT/uts_template_qa.jsonl" --num-data "$NUM" --seed "$SEED"
python -m chatts_tpu.datagen.align.mts_shape_template_qa \
  --output "$OUT/mts_shape_template_qa.jsonl" --num-data "$NUM" --seed "$SEED"
python -m chatts_tpu.datagen.align.mts_local_template_qa \
  --output "$OUT/mts_local_template_qa.jsonl" --num-data "$NUM" --seed "$SEED"
python -m chatts_tpu.datagen.align.uts_llm_qa \
  --output "$OUT/uts_llm_qa.jsonl" \
  --labels "$OUT/labels/uts_llm_qa.json" \
  --evol-labels "$OUT/evol_labels/uts_llm_qa.json" \
  --num-data "$NUM" --seed "$SEED"
python - <<'EOF'
import os
from chatts_tpu.datagen.align.mts_llm_qa import (
    MTSLocalLLMQAGenerator, MTSShapeLLMQAGenerator, write_outputs)
from chatts_tpu.utils.llm_client import LLMClient

out = os.environ.get("DATA_OUTPUT_DIR", "data")
num = int(os.environ.get("NUM_DATA", "100"))
seed = int(os.environ.get("SEED", "0"))
url = os.environ.get("CHATTS_LLM_URL")
if url:
    from chatts_tpu.eval.openai_client import OpenAIClient
    client = LLMClient(engine="openai", openai_client=OpenAIClient(base_url=url))
else:
    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.0,
                       dryrun_output="This is a test answer.")
for name, gen_cls in (("mts_local_llm_qa", MTSLocalLLMQAGenerator),
                      ("mts_shape_llm_qa", MTSShapeLLMQAGenerator)):
    g = gen_cls(seed=seed)
    rows, evol_labels, labels = g.generate_dataset(num, client)
    n = write_outputs(rows, evol_labels, labels,
                      f"{out}/{name}.jsonl",
                      f"{out}/evol_labels/{name}.json",
                      f"{out}/labels/{name}.json")
    print(f"{name}: {n} rows")
EOF
echo "alignment datasets written to $OUT/"
