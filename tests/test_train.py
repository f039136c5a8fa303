"""Training tests: loss masking, LoRA adapters, SFT loop with resume,
merged export round trip."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.train import data as data_lib
from chatts_tpu.train.lora import (
    LoRAConfig,
    apply_lora,
    init_lora,
    lora_param_count,
    merge_lora,
)
from chatts_tpu.train.sft_driver import export_merged, train_lora_sft
from tests.helpers import FakeTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    return cfg, params, proc


def make_rows(n=8):
    rng = np.random.default_rng(0)
    return [
        {
            "input": f"analyze series number {i} <ts><ts/> now",
            "output": f"the trend is increasing case {i}",
            "timeseries": [rng.normal(0, 1, 16).tolist()],
        }
        for i in range(n)
    ]


def test_build_sft_batch_loss_mask(setup):
    cfg, params, proc = setup
    rows = make_rows(2)
    batch = data_lib.build_sft_batch(proc, rows)
    b, t = batch["input_ids"].shape
    assert b == 2
    for i in range(b):
        mask = batch["loss_mask"][i]
        attn = batch["attention_mask"][i]
        # loss only within attended region
        assert np.all(mask <= attn)
        assert mask.sum() > 0
        # targets at masked positions equal the next input token
        pos = np.where(mask > 0)[0]
        np.testing.assert_array_equal(
            batch["targets"][i, pos], batch["input_ids"][i, pos + 1]
        )


def test_lora_zero_init_is_identity(setup):
    cfg, params, proc = setup
    lcfg = LoRAConfig(rank=4)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(1))
    assert lora_param_count(lora) > 0
    eff = apply_lora(params, lora, lcfg)
    # B initialized to zero -> effective weights identical
    np.testing.assert_allclose(
        np.asarray(eff["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]),
        np.asarray(params["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]),
        rtol=1e-6,
    )


def test_lora_sft_reduces_loss(setup):
    cfg, params, proc = setup
    rows = make_rows(8)
    from chatts_tpu.train.train_step import TrainConfig

    result = train_lora_sft(
        params, cfg, proc, rows,
        lora_cfg=LoRAConfig(rank=8, alpha=16.0),
        train_cfg=TrainConfig(learning_rate=3e-2),
        batch_size=4, num_epochs=30, max_steps=30, seed=0,
    )
    assert result.steps == 30
    first = np.mean(result.losses[:3])
    last = np.mean(result.losses[-3:])
    assert last < first * 0.9, f"loss did not drop: {first} -> {last}"


def test_lora_grads_do_not_touch_base(setup):
    cfg, params, proc = setup
    rows = make_rows(4)
    base_before = np.asarray(
        params["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]
    ).copy()
    train_lora_sft(params, cfg, proc, rows, batch_size=4, max_steps=2)
    np.testing.assert_array_equal(
        base_before,
        np.asarray(params["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]),
    )


def test_checkpoint_resume(setup, tmp_path):
    cfg, params, proc = setup
    rows = make_rows(8)
    ckpt = tmp_path / "ckpts"
    r1 = train_lora_sft(
        params, cfg, proc, rows, batch_size=4, max_steps=4, num_epochs=10,
        checkpoint_dir=str(ckpt), checkpoint_every=2,
    )
    assert r1.steps == 4
    # Resume: should pick up from step 4 and run 2 more
    r2 = train_lora_sft(
        params, cfg, proc, rows, batch_size=4, max_steps=2, num_epochs=10,
        checkpoint_dir=str(ckpt), checkpoint_every=2,
    )
    assert r2.steps == 6


def test_merged_export_round_trip(setup, tmp_path):
    cfg, params, proc = setup
    lcfg = LoRAConfig(rank=4)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(2))
    # give B nonzero values so the merge changes weights
    lora["layers"][0]["q_proj"]["b"] = (
        jnp.ones_like(lora["layers"][0]["q_proj"]["b"]) * 0.01
    )
    merged = merge_lora(params, lora, lcfg)
    q_orig = np.asarray(params["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"])
    q_merged = np.asarray(merged["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"])
    assert np.abs(q_merged - q_orig).max() > 0

    export_merged(params, lora, cfg, lcfg, str(tmp_path / "merged"))
    from chatts_tpu.models import weights

    cfg2, params2 = weights.load_checkpoint(str(tmp_path / "merged"), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params2["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]),
        q_merged, rtol=1e-5,
    )


def test_seed_template_qa(tmp_path):
    from chatts_tpu.datagen.seed_template_qa import main as seed_main

    n = seed_main(str(tmp_path / "seed.jsonl"), str(tmp_path / "labels.json"),
                  num_data=10, seed=0, seq_len=128)
    assert n == 10
    rows = [json.loads(l) for l in (tmp_path / "seed.jsonl").read_text().splitlines()]
    assert all("fields" in r for r in rows)
    labels = json.loads((tmp_path / "labels.json").read_text())
    assert all("attribute_pool" in l for l in labels)


def test_stream_qa_helpers():
    from chatts_tpu.serve.stream_qa import build_chat_prompt, extract_and_remove_ts

    cleaned, series = extract_and_remove_ts("look at <ts>[1, 2, 3]</ts> now")
    assert cleaned == "look at <ts><ts/> now"
    np.testing.assert_array_equal(series[0], [1.0, 2.0, 3.0])

    prompt = build_chat_prompt([("q1", "a1")], "q2")
    assert "<|im_start|>user\nq1<|im_end|>" in prompt
    assert prompt.endswith("<|im_start|>assistant\n")


def test_peft_adapter_round_trip(setup, tmp_path):
    """Our adapter -> PEFT layout -> reload -> identical merge effect
    (demo_lora load+merge parity)."""
    cfg, params, proc = setup
    from chatts_tpu.train.peft_io import load_peft_adapter, save_peft_adapter

    lcfg = LoRAConfig(rank=4, alpha=8.0)
    lora = init_lora(params, lcfg, jax.random.PRNGKey(9))
    lora["layers"][1]["v_proj"]["b"] = (
        jnp.ones_like(lora["layers"][1]["v_proj"]["b"]) * 0.02
    )
    save_peft_adapter(str(tmp_path / "adapter"), lcfg, lora)
    assert (tmp_path / "adapter" / "adapter_model.safetensors").exists()
    assert (tmp_path / "adapter" / "adapter_config.json").exists()

    lcfg2, lora2 = load_peft_adapter(str(tmp_path / "adapter"))
    assert lcfg2.rank == 4 and lcfg2.alpha == 8.0
    m1 = merge_lora(params, lora, lcfg)
    m2 = merge_lora(params, lora2, lcfg2)
    np.testing.assert_allclose(
        np.asarray(m1["llm"]["layers"][1]["self_attn"]["v_proj"]["kernel"]),
        np.asarray(m2["llm"]["layers"][1]["self_attn"]["v_proj"]["kernel"]),
        rtol=1e-6,
    )


def test_lora_sft_on_tp_mesh_matches_single_device(setup):
    """LoRA SFT with a TP-sharded base model (adapters replicated) follows
    the single-device loss trajectory — the multi-chip fine-tuning path."""
    from chatts_tpu.parallel import mesh as mesh_lib
    from chatts_tpu.parallel import sharding
    from chatts_tpu.train.train_step import TrainConfig

    cfg, params, proc = setup
    rows = make_rows(8)
    kwargs = dict(
        lora_cfg=LoRAConfig(rank=4, alpha=8.0),
        train_cfg=TrainConfig(learning_rate=1e-2),
        batch_size=4, num_epochs=4, max_steps=8, seed=0,
    )
    ref = train_lora_sft(params, cfg, proc, rows, **kwargs)

    mesh = mesh_lib.create_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sharded = sharding.place_params(mesh, cfg, params)
    got = train_lora_sft(sharded, cfg, proc, rows, **kwargs)

    np.testing.assert_allclose(got.losses, ref.losses, rtol=2e-3, atol=2e-4)
