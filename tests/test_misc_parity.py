"""Misc parity components: judge config loader, distributed helpers."""
import numpy as np

from chatts_tpu.eval.judge_config import load_config, load_judge
from chatts_tpu.parallel.distributed import process_info, shard_indices


def test_judge_config_missing_file(tmp_path, monkeypatch):
    monkeypatch.setenv("CONFIG_PATH", str(tmp_path / "nope.toml"))
    assert load_config() == {}
    monkeypatch.delenv("CHATTS_JUDGE_URL", raising=False)
    assert load_judge() is None


def test_judge_config_toml(tmp_path, monkeypatch):
    cfg_file = tmp_path / "judge.toml"
    cfg_file.write_text(
        '[llm]\nmodel = "test-model"\napi_base = "http://localhost:9/v1"\n'
        '[data]\ndata_dir = "%s"\n' % tmp_path
    )
    monkeypatch.setenv("CONFIG_PATH", str(cfg_file))
    cfg = load_config()
    assert cfg["llm"]["model"] == "test-model"
    judge = load_judge()
    assert judge is not None
    judge.llm.max_retries = 1  # keep the dead-endpoint probe fast
    # endpoint is dead -> judge degrades to 0.0 like the reference
    score, detail = judge("q", "resp", "label")
    assert score == 0.0 and "error" in detail


def test_shard_indices():
    assert shard_indices(10, rank=0, world=2) == [0, 2, 4, 6, 8]
    assert shard_indices(10, rank=1, world=2) == [1, 3, 5, 7, 9]
    rank, world = process_info()
    assert world >= 1
    # union over ranks covers everything exactly once
    all_idx = sorted(sum((list(shard_indices(7, r, 3)) for r in range(3)), []))
    assert all_idx == list(range(7))
