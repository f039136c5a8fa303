"""TSEvol prompt machinery: context renderers, mutation prompts, state.

Behavioral re-implementation of the reference evol library
(reference: chatts/sft/utils/evol_prompt.py:22-261 and
chatts/sft/utils/evol_attributes.py:21-105): the CONTEXT block renders only
the attribute fields the evolution has unlocked so far; seven mutation prompt
builders (situation / constraints / deepen / concretize / complex-reasoning /
deductive / causal) drive depth- and breadth-wise instruction evolution; a
comparison prompt asks the LLM to rule Equal / Invalid / Valid before a
mutation is accepted.  The EvolPrompt state machine tracks unlocked fields
and a 2-entry QA history ring.

Prompt texts are functionally equivalent rewrites of the reference's (same
structure, constraints, JSON output contract, and Equal/Invalid/Valid
verdict protocol).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from chatts_tpu.datagen.generator import attribute_to_text

# ---------------------------------------------------------------------------
# CONTEXT renderers (reference: evol_attributes.py:21-105)
# ---------------------------------------------------------------------------


def _per_series(kind: str, include, timeseries, attribute_pool, metrics, idx):
    result = f"The {kind} information of some time series are as follows: "
    for i in idx:
        result += (
            f"In {metrics[i]}, "
            + attribute_to_text(
                timeseries[i], attribute_pool[i], generate_values=False,
                include_attributes=list(include),
            ).rstrip().rstrip(".")
            + "; "
        )
    return result[:-1]


def trend_attribute_prompt(timeseries, attribute_pool, metrics, idx, *_):
    return _per_series("trend", ["trend"], timeseries, attribute_pool, metrics, idx)


def seasonal_attribute_prompt(timeseries, attribute_pool, metrics, idx, *_):
    return _per_series(
        "seasonal", ["periodicity", "frequency"], timeseries, attribute_pool,
        metrics, idx,
    )


def noise_attribute_prompt(timeseries, attribute_pool, metrics, idx, *_):
    return _per_series("noise", ["noise"], timeseries, attribute_pool, metrics, idx)


def local_attribute_prompt(timeseries, attribute_pool, metrics, idx, *_):
    result = "The local change information of some time series are as follows: "
    for i in idx:
        result += (
            f"\n - In {metrics[i]}: "
            + attribute_to_text(
                timeseries[i], attribute_pool[i], generate_values=False,
                include_attributes=["local"],
            ).rstrip().rstrip(".")
        )
    return result


def statistic_attribute_prompt(timeseries, attribute_pool, metrics, idx, *_):
    result = "The statistic information of some time series are as follows: "
    for i in idx:
        st = attribute_pool[i]["statistics"]
        result += (
            f"In {metrics[i]}, the mean value is {round(float(st['mean']), 2)}, "
            f"the minimum value is {round(float(st['min']), 2)} (around point "
            f"{st['min_pos']}), and the maximum value is "
            f"{round(float(st['max']), 2)} (around point {st['max_pos']}); "
        )
    return result[:-1]


def correlation_attribute_prompt(timeseries, attribute_pool, metrics, idx, corr_pool, *_):
    result = "The correlation information of some time series are as follows: "
    lines = []
    for i in idx:
        if i >= len(corr_pool):
            break
        if corr_pool[i] is None:
            continue
        lines.append(" - " + corr_pool[i][1])
    return result + "\n".join(lines)


_FIELD_RENDERERS = {
    "trend": trend_attribute_prompt,
    "seasonal": seasonal_attribute_prompt,
    "noise": noise_attribute_prompt,
    "local": local_attribute_prompt,
    "statistic": statistic_attribute_prompt,
    "correlation": correlation_attribute_prompt,
}


def attribute_prompt(timeseries, attribute_pool, metrics, required_fields, corr_pool):
    """Render the CONTEXT block restricted to unlocked fields
    (reference: evol_attributes.py:83-105)."""
    result = (
        f"There are {len(timeseries)} timeseries with length of "
        f"{len(timeseries[0])}: "
    )
    for i in range(len(timeseries)):
        result += f"the {i + 1}-th timeseries is {metrics[i]}; "
    result = result[:-2] + ".\n"
    for field, idx in required_fields.items():
        result += _FIELD_RENDERERS[field](
            timeseries, attribute_pool, metrics, idx, corr_pool
        ) + "\n"
    return result


# ---------------------------------------------------------------------------
# Mutation prompt builders (reference: evol_prompt.py:22-171)
# ---------------------------------------------------------------------------

DEPTH_INSTRUCTION = """You will act as a Q&A Rewriter for a time series question-answering system.

Objective: Rewrite the provided Q&A into a more complex and nuanced version that challenges advanced AI systems, drawing on the CONTEXT information about the time series. The rewrite must stay logical, readable, and answerable by a human.

Instructions:
- **Time Series Attributes**: Use only facts present in CONTEXT; never invent details beyond it.
- **Non-Text Elements**: Keep any non-text parts of #The Given Q&A# (tables, charts, code) intact.
- **Input Integrity**: Every input appearing in #The Given Q&A# must also appear in the rewrite.

You SHOULD add complexity by:
{}
Keep the #Generated Q&A# within 10-20 extra words over #The Given Q&A#.
Never write the literal phrases '#The Given Q&A#', '#Generated Q&A#', 'given q&a', or 'rewritten q&a' inside #Generated Q&A#."""

BREADTH_INSTRUCTION = """You will act as a Q&A Creator for a time series question-answering system.

Objective: Invent a brand-new Q&A inspired by #Given Q&A# and grounded in the CONTEXT section. Stay in the same domain, but target a rarer, more distinctive aspect of it.

Instructions:
- **Time Series Attributes**: Reference only attributes given in CONTEXT; add nothing that is not explicitly provided.
- **Domain Consistency with Rarity**: Remain in the same domain while highlighting rare scenarios, events, or relationships.

You SHOULD create the Q&A by:
{}
The #Generated Q&A# must be reasonable and human-readable.
Never write the literal phrases '#Given Q&A#', '#Generated Q&A#', 'given q&a', or 'created q&a' inside #Generated Q&A#."""

CONSTRAINTS_INSTRUCTION = """
- **Logical Consistency**: The answer must follow logically from the question and agree with CONTEXT.
- **No time series details in Questions**: Questions speak about the series in general terms only — no specifics like "noise of 0.5" or "spike near position 100". Specifics may appear **only** in the answer, sourced from CONTEXT.
- **Cross-Verification**: Check every detail against CONTEXT for accuracy.
- **No New Features or Names**: Use only attributes and names defined in CONTEXT.
- **One Question, One Answer**: Exactly one question and one answer; keep both clear and concise.
- **Unit and Start Information**: When units or starting values are given, the question must carry them (e.g., unit is days, start time is October 1, 2024, at 15:00).
- **Output Format**: Respond in JSON only: {"question": "your question (strictly following the format in the question format)", "answer": "your answer"}. Do not include task labels like '#Given Q&A#' or '#Generated Q&A#'."""

COMPARISON_INSTRUCTION = """Here are two Instructions to ChatGPT AI, do you think they are equal to each other, which meet any one of the following requirements:
    1. Their questions and answers are almost the same, with only minor modification in terms of the order of the sequences.
    2. The second QA is an simple and obvious inference from the first QA
    3. No difference between the breadths or depths of the two QAs

If you think they are equal, then just answer Equal.
If they are not equal, then do you think it is a valid Q&A that meets all of the below requirements:
    1. All information about the time series in the **second** Q&A can be sourced from the CONTEXT section and not generated without CONTEXT.
    2. The question should not reveal specific time series attributes (e.g., avoid terms like "noise of 0.5" or "spike near position 100"), as these details are intended to appear **only** in the answer based on CONTEXT.


The First Q&A: <FIRST>
The Second Q&A: <SECOND>

Your Judgement (Just answer: Equal/Invalid/Valid. No need to explain the reason.):"""


def create_situation_prompt():
    prompt = BREADTH_INSTRUCTION.format(
        """Building on the CONTEXT time series, set up a virtual scenario with:

Real-World Context: a realistic setting (a specific industry, system, or environment) that fits the data.
Detailed Questions: questions (multiple-choice or open Q&A) about one series or comparing several.

Requirements:
Use only the time series attributes provided in CONTEXT.
Make questions concrete and tied to the scenario.
Output Format: JSON only: {"question": "your question", "answer": "your answer"}

Examples:
E-commerce Holiday Sales:
Question: "The sales data starts from June 7th, and each point represent a day. A E-commerce Holiday Sales is happend every year. During this time, the sales will be higher than the normal times. How many holiday sales peaks are present?"
Answer: "In the timeseries, I've found 3 upward spikes compared to the original timeseries. Therefore, the time series shows 3 additional peaks in May, November, and December."
"""
    )
    question_format = (
        "The question format: a description of the current situation (the "
        "generated virtual scenario, like an event or holiday), specifying its "
        "unit and start point (e.g. The energy usage data starts from Jan 1, "
        "and each point is a day), along with background context relevant to "
        "the question. The question should directly relate to the timeseries, "
        "with all elements included exactly as instructed. It may be a "
        "multiple-choice question (preferred) or a general Q&A with detailed "
        "explanation."
    )
    return prompt, question_format


def create_constraints_prompt():
    prompt = DEPTH_INSTRUCTION.format(
        "Please add one more constraint/requirement into #The Given Q&A# "
        "according to the time series attributes provided in CONTEXT."
    )
    return prompt, (
        "The question format should be like: Your generated condition, the "
        "question about timeseries."
    )


def create_deepen_prompt():
    prompt = DEPTH_INSTRUCTION.format(
        "If #The Given Q&A# contains inquiries about certain issues, the depth "
        "and breadth of the inquiry can be increased."
    )
    return prompt, (
        "The question format should be similar with the given qa, but the "
        "depth and breadth of the inquiry can be increased."
    )


def create_concretizing_prompt():
    prompt = DEPTH_INSTRUCTION.format(
        "Please replace general concepts with more specific concepts."
    )
    return prompt, (
        "The question format should be similar with the given qa, but should "
        "replace general concepts with more specific concepts."
    )


def create_complex_reasoning_prompt():
    prompt = BREADTH_INSTRUCTION.format(
        "If #The Given Q&A# can be solved with just a few simple thinking "
        "processes, you can rewrite it to explicitly request multiple-step "
        "reasoning."
    )
    return prompt, (
        "The question format should be like a hard math problem or other "
        "complex reasoning problem, which may be different from the original "
        "Q&A."
    )


def create_deductive_reasoning_prompt():
    prompt = """
Based on the time series in CONTEXT, create deductive reasoning Q&A. Each question states a condition and asks whether the observed behavior satisfies it. Use Yes/No format and give the reasoning.

Key Points:
- Conditions can be rules (e.g., thresholds), contexts, or patterns.
- Avoid specific details from the time series (e.g., "spike at point X").
- Provide both positive (Yes) and negative (No) examples.

Example:
Question: If CPU usage above 50 is abnormal, should the current usage be treated as abnormal?
Answer: No, because the usage did not exceed the threshold of 50.
"""
    return prompt, """
- Yes/No question based on a condition.
- Avoid specific time series details.
- Answer starts with Yes/No, followed by reasoning.
"""


def create_causal_reasoning_prompt():
    prompt = """
Create causal reasoning Q&A for time series. Questions ask the model to infer causes or effects via multiple choice.

Key Points:
- Categories: Cause Identification, Effect Prediction, Anomaly Explanation, Temporal Correlation.
- Avoid specific details from the time series (e.g., "spike at point X").
- Include detailed reasoning for the answers.

Example:
Question: What likely caused the observed pattern? Choose from: load increase, maintenance, stable operations.
Answer: Load increase. The spikes suggest unexpected surges in system load.
"""
    return prompt, """
- Multiple-choice question about causes or effects.
- Categories: Cause Identification, Effect Prediction, Anomaly Explanation, Temporal Correlation.
- Answer includes choice and reasoning.
"""


MUTATION_BUILDERS = [
    create_situation_prompt,
    create_constraints_prompt,
    create_deepen_prompt,
    create_concretizing_prompt,
    create_complex_reasoning_prompt,
    create_deductive_reasoning_prompt,
    create_causal_reasoning_prompt,
]


def create_comparison_prompt(before: str, after: str) -> str:
    return COMPARISON_INSTRUCTION.replace("<FIRST>", before).replace(
        "<SECOND>", after
    )


# ---------------------------------------------------------------------------
# EvolPrompt state machine (reference: evol_prompt.py:174-261)
# ---------------------------------------------------------------------------


class EvolPrompt:
    def __init__(
        self,
        ts_idx: int,
        seed_q: str,
        seed_a: str,
        seed_fields: Dict[str, List[int]],
        instruction: str,
        timeseries,
        attribute_pool: List[dict],
        metrics: List[str],
        corr_pool: Sequence,
        rng: Optional[np.random.Generator] = None,
    ):
        self.ts_idx = ts_idx
        self.timeseries = timeseries
        self.attribute_pool = attribute_pool
        self.instruction = instruction
        self.metrics = metrics
        self.corr_pool = list(corr_pool)
        self.rng = rng or np.random.default_rng()

        n = len(timeseries)
        self.all_fields = {
            "trend": list(range(n)),
            "seasonal": list(range(n)),
            "noise": list(range(n)),
            "local": list(range(n)),
            "statistic": list(range(n)),
            "correlation": list(range(len(self.corr_pool))),
        }
        self.fields: Dict[str, List[int]] = {
            k: list(v) for k, v in seed_fields.items()
        }
        self.qa_history: List[Tuple[str, str]] = [(seed_q, seed_a)]

    def evol(self) -> None:
        """Unlock one not-yet-covered (field, series) pair
        (reference: evol_prompt.py:187-201)."""
        diff = {}
        for field, candidates in self.all_fields.items():
            if field not in self.fields:
                if candidates:
                    diff[field] = candidates
            else:
                remaining = sorted(set(candidates) - set(self.fields[field]))
                if remaining:
                    diff[field] = remaining
        if diff:
            field = str(self.rng.choice(sorted(diff.keys())))
            self.fields.setdefault(field, [])
            self.fields[field].append(int(self.rng.choice(diff[field])))

    def push(self, q: str, a: str) -> None:
        self.qa_history.append((q, a))
        if len(self.qa_history) > 2:
            self.qa_history.pop(0)

    def generate_prompt(self) -> str:
        builder = MUTATION_BUILDERS[int(self.rng.integers(0, len(MUTATION_BUILDERS)))]
        prompt, question_format = builder()
        given_qa = json.dumps(
            {"question": self.qa_history[-1][0], "answer": self.qa_history[-1][1]}
        )
        context = attribute_prompt(
            self.timeseries, self.attribute_pool, self.metrics, self.fields,
            self.corr_pool,
        )
        return (
            f"{prompt}\n\n#Context#\n{context}\n\n#Constraints#\n"
            f"{CONSTRAINTS_INSTRUCTION}\n\n#The Given Q&A#\n{given_qa}\n\n"
            f"#Question Format#\n{question_format}\n\n#Generated Q&A#:"
        )

    def generate_comparison_prompt(self, q: str, a: str) -> str:
        given_qa = json.dumps(
            {"question": self.qa_history[-1][0], "answer": self.qa_history[-1][1]}
        )
        generated_qa = json.dumps({"question": q, "answer": a})
        context = attribute_prompt(
            self.timeseries, self.attribute_pool, self.metrics, self.fields,
            self.corr_pool,
        )
        return (
            f"#Context#\n{context}\n\n#Your Task#\n"
            f"{create_comparison_prompt(given_qa, generated_qa)}"
        )

    def to_dataset(self) -> dict:
        ts = self.timeseries
        if isinstance(ts, np.ndarray):
            ts = ts.tolist()
        return {
            "input": self.instruction + " " + self.qa_history[-1][0],
            "output": self.qa_history[-1][1],
            "timeseries": ts,
            "ts_idx": self.ts_idx,
            "fields": sorted(self.fields),
        }

    def clone(self) -> "EvolPrompt":
        import copy

        new = EvolPrompt(
            self.ts_idx,
            self.qa_history[0][0],
            self.qa_history[0][1],
            {},
            self.instruction,
            self.timeseries,
            self.attribute_pool,
            self.metrics,
            self.corr_pool,
            rng=self.rng,
        )
        new.fields = copy.deepcopy(self.fields)
        new.qa_history = list(self.qa_history)
        return new
