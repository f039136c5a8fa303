"""The answer-correctness judge driven over REAL HTTP (VERDICT r1 item 9).

A localhost stdlib server implements /v1/chat/completions with a
deterministic keyword-LLM behavior, and the judge client
(:mod:`chatts_tpu.eval.ragas_judge` via :mod:`chatts_tpu.eval.openai_client`)
talks to it exactly as it would to the reference's judge endpoint
(reference: evaluation/ragas/metric.py:204-249, score.py:22-42).  Covers
keyword extraction, the difflib-0.6 fuzzy match, the persisted cache, the
error->0.0 fallback, and reason scores flowing through the full eval loop.
"""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


def _keyword_llm(prompt: str) -> str:
    """Deterministic stand-in for the judge LLM: extract the first few words
    of the ground truth as the keyword; report overlaps by substring."""
    if '"gt_keywords"' in prompt and "ground_truth:" in prompt:
        gt = prompt.rsplit("ground_truth:", 1)[1]
        gt = gt.split("Output only", 1)[0].strip()
        words = gt.replace("\n", " ").split()
        kw = " ".join(words[:4]) if words else ""
        return json.dumps({"gt_keywords": [kw] if kw else []})
    if '"overlapping_keywords"' in prompt and "gt_keywords:" in prompt:
        tail = prompt.rsplit("gt_keywords:", 1)[1]
        kw_json = tail.split("\n", 1)[0].strip()
        answer = tail.split("answer:", 1)[1].split("Output only", 1)[0].strip()
        keywords = json.loads(kw_json)
        overlap = [k for k in keywords if str(k).lower() in answer.lower()]
        return json.dumps({"overlapping_keywords": overlap})
    return "{}"


class _JudgeHandler(BaseHTTPRequestHandler):
    def do_POST(self):
        assert self.path.endswith("/chat/completions")
        length = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(length))
        prompt = payload["messages"][-1]["content"]
        self.server.request_count += 1
        content = _keyword_llm(prompt)
        body = json.dumps(
            {"choices": [{"message": {"content": content}}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # keep pytest output clean
        pass


@pytest.fixture()
def judge_server():
    server = HTTPServer(("127.0.0.1", 0), _JudgeHandler)
    server.request_count = 0
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield server
    finally:
        server.shutdown()
        thread.join(timeout=5)


def _make_judge(server, data_dir):
    from chatts_tpu.eval.openai_client import OpenAIClient
    from chatts_tpu.eval.ragas_judge import AnswerCorrectnessJudge

    client = OpenAIClient(
        base_url=f"http://127.0.0.1:{server.server_port}/v1",
        max_retries=2,
        timeout_s=10.0,
    )
    return AnswerCorrectnessJudge(client, data_dir=str(data_dir))


def test_judge_scores_over_http(judge_server, tmp_path):
    judge = _make_judge(judge_server, tmp_path)
    label = "the cpu usage rises sharply at position 120"
    score, detail = judge("what happens to cpu usage?", label, label)
    assert score == 1.0
    assert detail["num_ok"] == detail["num_all"] == 1
    assert judge_server.request_count == 2  # extraction + overlap

    score, detail = judge("what happens to cpu usage?", "bananas", label)
    assert score == 0.0
    # extraction was served from the persisted cache: only +1 request
    assert judge_server.request_count == 3


def test_judge_cache_persists_across_instances(judge_server, tmp_path):
    judge = _make_judge(judge_server, tmp_path)
    label = "a sudden decrease happens near the end"
    judge("question?", label, label)
    n = judge_server.request_count
    judge2 = _make_judge(judge_server, tmp_path)
    judge2("question?", label, label)
    assert judge_server.request_count == n + 1  # only the overlap call


def test_judge_fuzzy_match_over_http(judge_server, tmp_path):
    """The overlap endpoint may echo a near-miss keyword; difflib >= 0.6
    accepts it (reference: ragas/metric.py:245-249)."""
    from chatts_tpu.eval.ragas_judge import AnswerCorrectnessJudge

    class NearMissClient:
        def __init__(self, real):
            self.real = real

        def __call__(self, prompt):
            out = self.real(prompt)
            if "overlapping_keywords" in out:
                # perturb the reported keyword slightly
                parsed = json.loads(out)
                parsed["overlapping_keywords"] = [
                    k + " indeed" for k in parsed["overlapping_keywords"]
                ]
                return json.dumps(parsed)
            return out

    from chatts_tpu.eval.openai_client import OpenAIClient

    client = OpenAIClient(
        base_url=f"http://127.0.0.1:{judge_server.server_port}/v1",
        max_retries=2, timeout_s=10.0,
    )
    judge = AnswerCorrectnessJudge(NearMissClient(client), data_dir=str(tmp_path))
    label = "the series keeps a steady upward trend"
    score, _ = judge("trend?", label, label)
    assert score == 1.0


def test_judge_http_error_falls_back_to_zero(tmp_path):
    from chatts_tpu.eval.openai_client import OpenAIClient
    from chatts_tpu.eval.ragas_judge import AnswerCorrectnessJudge

    client = OpenAIClient(
        base_url="http://127.0.0.1:9/v1",  # closed port
        max_retries=1, timeout_s=0.5,
    )
    judge = AnswerCorrectnessJudge(client, data_dir=str(tmp_path))
    score, detail = judge("q", "r", "label")
    assert score == 0.0
    assert "error" in detail


def test_load_judge_from_env_url(judge_server, tmp_path, monkeypatch):
    """CHATTS_JUDGE_URL wires the endpoint without a TOML file
    (parity with the reference's CONFIG_PATH env override)."""
    monkeypatch.setenv(
        "CHATTS_JUDGE_URL", f"http://127.0.0.1:{judge_server.server_port}/v1"
    )
    monkeypatch.setenv("CONFIG_PATH", str(tmp_path / "missing.toml"))
    monkeypatch.chdir(tmp_path)
    from chatts_tpu.eval.judge_config import load_judge

    judge = load_judge()
    assert judge is not None
    label = "noise level is high throughout"
    score, _ = judge("noise?", label, label)
    assert score == 1.0


def test_reason_scores_flow_through_eval_loop(judge_server, tmp_path):
    """Full loop: inductive abilities get their reason third from the HTTP
    judge, not a mock callable (VERDICT weak item 5)."""
    from chatts_tpu.eval.inference import evaluate_experiment, run_inference
    from chatts_tpu.eval.make_eval_dataset import build_mts_dataset

    samples = build_mts_dataset(3, seed=4, seq_len=128)

    class Oracle:
        def __init__(self, dataset):
            self.by_prompt = {x["question"]: x["answer"] for x in dataset}

        def llm_batch_generate(self, prompts, ts_lists=None, **kw):
            out = []
            for p in prompts:
                body = p.split("<|im_start|>user\n", 1)[1].rsplit("<|im_end|>", 1)[0]
                out.append(self.by_prompt[body])
            return out

    run_inference(samples, Oracle(samples), "judge_exp", exp_root=str(tmp_path))
    judge = _make_judge(judge_server, tmp_path / "judge_data")
    summary = evaluate_experiment(samples, "judge_exp", exp_root=str(tmp_path),
                                  num_workers=1, judge=judge)
    assert judge_server.request_count > 0
    assert summary["overall_reason"] >= 0.9
    assert summary["overall_categorical"] >= 0.99
