"""Synthesize an evaluation dataset in the dataset_a format.

The reference's eval datasets are external Zenodo downloads
(reference: README.md:75-77, evaluation/dataset/.gitkeep); this builder
produces samples with the exact schema ``evaluate_qa`` consumes
(question with <ts><ts/> holes + numbered sub-questions, ``timeseries``,
``ability_types``, ``attributes``, ``cols``, ``answer``) from the synthetic
generator's exact labels — so the full loop
(generate -> serve -> infer -> score) runs without external data, and scores
are exact because the ground truth is constructed, not annotated.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from chatts_tpu.core.encoding import timeseries_encoding
from chatts_tpu.datagen.changes import supported_change_types
from chatts_tpu.datagen.generator import TimeSeriesGenerator

ALL_LOCAL_TYPES = sorted(supported_change_types())


def _trend_qa(pool) -> Optional[Tuple[str, str, dict]]:
    t = pool["trend"]
    if t["type"] == "multiple":
        return None
    question = (
        'What is the trend of this time series? Please choose from ["steady", '
        '"decreasing", "increasing"] and describe the value trend change. '
        "Answer format: steady, the starting point value is around 32.10, and "
        "the trend change value from left to right is around 0.12."
    )
    answer = (
        f"{t['type']}, the starting point value is around {t['start']:.2f}, "
        f"and the trend change value from left to right is around "
        f"{t['amplitude']:.2f}."
    )
    attribute = {"type": t["type"], "start": float(t["start"]),
                 "amplitude": float(t["amplitude"])}
    return question, answer, attribute


def _season_qa(pool) -> Optional[Tuple[str, str, dict]]:
    s = pool["seasonal"]
    question = (
        "What is the periodicity of this time series? Please choose from "
        '["no periodic fluctuation", "periodic fluctuation"]. If there is '
        "periodic fluctuation, describe the period (each period) and "
        "amplitude. Answer format: periodic fluctuation, each period is "
        "around 20.58 points, and the amplitude of the periodic fluctuation "
        "is around 31.51."
    )
    if "no" in s["type"]:
        return question, "no periodic fluctuation", {"type": "no periodic fluctuation"}
    if not s.get("segments"):
        return None
    attribute = {
        "type": s["type"],
        "period": float(pool["frequency"]["period"]),
        "amplitude": float(s["segments"][0]["amplitude"]),
    }
    answer = (
        f"periodic fluctuation, each period is around "
        f"{attribute['period']:.2f} points, and the amplitude of the periodic "
        f"fluctuation is around {attribute['amplitude']:.2f}."
    )
    return question, answer, attribute


def _noise_qa(pool) -> Optional[Tuple[str, str, dict]]:
    n = pool["noise"]
    if "std" not in n:
        return None
    question = (
        "What are the noise characteristics of this time series? Please "
        'choose from ["noisy", "almost no noise"]. Answer format: noisy, the '
        "overall noise standard deviation is around 1.5."
    )
    answer = (
        f"{n['type']}, the overall noise standard deviation is around "
        f"{n['std']:.2f}."
    )
    return question, answer, {"type": n["type"], "std": float(n["std"])}


def _local_qa(pool) -> Optional[Tuple[str, str, list]]:
    local = pool["local"]
    question = (
        "What are the local characteristic fluctuations of this time series? "
        'The optional types include: ["' + '", "'.join(ALL_LOCAL_TYPES) + '"]. '
        "Answer each type, position, and amplitude, separated by semicolons. "
        "Answer format: shake, position around point 125, amplitude 135.03; "
        "sudden decrease, position around point 102, amplitude 31.05."
    )
    if not local:
        return question, "No local characteristic fluctuations found.", []
    answer = "; ".join(
        f"{c['type']}, position around point {c['position_start']}, amplitude "
        f"{c['amplitude']:.2f}"
        for c in local
    )
    attribute = [
        {"type": c["type"], "position": int(c["position_start"]),
         "amplitude": float(c["amplitude"])}
        for c in local
    ]
    return question, answer, attribute


def build_dataset(
    num_samples: int,
    seed: int = 0,
    seq_len: Optional[int] = 256,
    encoding_method: str = "sp",
) -> List[dict]:
    gen = TimeSeriesGenerator(seed=seed)
    samples: List[dict] = []
    while len(samples) < num_samples:
        cur_len = seq_len or int(gen.rng.integers(64, 1025))
        pool = gen.generate_random_attributes(
            change_positions=[(None, None)], seq_len=cur_len
        )
        try:
            ts, pool = gen.generate(pool, cur_len)
        except (ValueError, IndexError):
            continue

        candidates = [
            ("trend", _trend_qa(pool)),
            ("season", _season_qa(pool)),
            ("noise", _noise_qa(pool)),
            ("local", _local_qa(pool)),
        ]
        candidates = [(a, qa) for a, qa in candidates if qa is not None]
        if len(candidates) < 3:
            continue

        _, frag, _ = timeseries_encoding(ts, encoding_method)
        question = (
            f"Here is a time series of length {cur_len}: {frag}, please "
            "analyze its features and answer the following questions:"
        )
        ability_types, attributes = [], []
        answer_lines = []
        for i, (ability, (q, a, attr)) in enumerate(candidates):
            question += f"\n{i + 1}. {q}"
            ability_types.append(ability)
            attributes.append(attr)
            answer_lines.append(f"{i + 1}. {a}")
        question += (
            "\nAnswer each question on its own numbered line, strictly in the "
            "requested format."
        )
        samples.append({
            "question": question,
            "timeseries": [ts.tolist()],
            "cols": ["Time Series"],
            "ability_types": ability_types,
            "attributes": attributes,
            "answer": "\n".join(answer_lines),
        })
    return samples


def main(output_path: str, num_samples: int = 100, seed: int = 0,
         seq_len: Optional[int] = 256) -> int:
    samples = build_dataset(num_samples, seed, seq_len)
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(samples, f, ensure_ascii=False)
    return len(samples)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--output", default="evaluation/dataset/dataset_synth.json")
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--seq-len", type=int, default=256)
    args = p.parse_args()
    print(f"wrote {main(args.output, args.num_samples, args.seed, args.seq_len)} samples")
