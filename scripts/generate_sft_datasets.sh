#!/usr/bin/env bash
# Generate the SFT dataset family (reference:
# scripts/generate_enhanced_sft_datasets.sh): seed LLM QA, TSEvol, IFT,
# reasoning (uts/mts/cn), rewrite.  LLM-dependent stages default to dryrun;
# set CHATTS_LLM_URL for real generation.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${DATA_OUTPUT_DIR:-data}
NUM=${NUM_DATA:-50}
SEED=${SEED:-0}

python -m chatts_tpu.datagen.sft.generate_llm_qa \
  --output "$OUT/llm_qa.jsonl" --evol-labels "$OUT/evol_labels/llm_qa.json" \
  --num-data "$NUM" --seed "$SEED"
python -m chatts_tpu.datagen.seed_template_qa \
  --output "$OUT/seed_template_qa.jsonl" \
  --labels "$OUT/evol_labels/seed_template_qa.json" \
  --num-data "$NUM" --seed "$SEED"
python - <<'EOF'
import os
from chatts_tpu.datagen.sft.tsevol import evol_instruct
from chatts_tpu.datagen.sft.reason import (UTSReasonGenerator,
                                           MTSReasonGenerator, write_dataset)
from chatts_tpu.datagen.sft.generate_ift_dataset import generate_dataset as ift
from chatts_tpu.utils.llm_client import LLMClient

out = os.environ.get("DATA_OUTPUT_DIR", "data")
num = int(os.environ.get("NUM_DATA", "50"))
seed = int(os.environ.get("SEED", "0"))
url = os.environ.get("CHATTS_LLM_URL")
if url:
    from chatts_tpu.eval.openai_client import OpenAIClient
    client = LLMClient(engine="openai", openai_client=OpenAIClient(base_url=url))
else:
    import json
    client = LLMClient(engine="dryrun", dryrun_sleep_s=0.0,
                       dryrun_output=json.dumps([{ "question": "Test?", "answer": "Test."}]))

# TSEvol over available seed files
seeds = []
for name in ("llm_qa", "uts_llm_qa", "mts_local_llm_qa", "mts_shape_llm_qa"):
    ds, lb = f"{out}/{name}.jsonl", f"{out}/evol_labels/{name}.json"
    if os.path.exists(ds) and os.path.exists(lb):
        seeds.append((ds, lb))
if seeds:
    rows = evol_instruct(seeds, f"{out}/evol.jsonl", num, client, seed)
    print(f"tsevol: {len(rows)} rows")

# IFT over label files
label_files = []
for name, kind in (("uts_llm_qa", "uts"), ("mts_local_llm_qa", "local"),
                   ("mts_shape_llm_qa", "shape")):
    p = f"{out}/labels/{name}.json"
    if os.path.exists(p):
        label_files.append((p, kind))
if label_files:
    n = ift(label_files, num, f"{out}/ift.jsonl", seed)
    print(f"ift: {n} rows")

# Reasoning
rows, labels = UTSReasonGenerator(seed=seed).generate_dataset(max(num // 5, 2), client)
print("uts_reason:", write_dataset(rows, labels, f"{out}/uts_reason.jsonl",
                                   f"{out}/evol_labels/uts_reason.json"))
rows, labels = MTSReasonGenerator(seed=seed).generate_dataset(max(num // 5, 2), client)
print("mts_reason:", write_dataset(rows, labels, f"{out}/mts_reason.jsonl",
                                   f"{out}/evol_labels/mts_reason.json"))
rows, labels = UTSReasonGenerator(seed=seed, chinese=True).generate_dataset(
    max(num // 10, 1), client)
print("uts_reason_cn:", write_dataset(rows, labels, f"{out}/uts_reason_cn.jsonl",
                                      f"{out}/evol_labels/uts_reason_cn.json"))
EOF
echo "sft datasets written to $OUT/"
