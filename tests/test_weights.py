"""Checkpoint round-trip tests: save -> load -> identical logits; tied
embedding detection; sharded load on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts, weights


def test_save_load_round_trip(tmp_path):
    cfg = tiny_config(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, patch_size=4,
                      max_sequence_length=32, ts_token_start_index=120)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)

    cfg2, params2 = weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg2.llm.hidden_size == 32
    assert cfg2.ts.patch_size == 4
    assert not cfg2.llm.tie_word_embeddings

    ids = np.arange(10)[None] % 128
    positions = np.arange(10)[None]

    def logits_of(p, c):
        hidden, _ = chatts.forward(p, c, jnp.asarray(ids), jnp.asarray(positions),
                                   attn_impl="xla")
        return np.asarray(chatts.compute_logits(p, c, hidden))

    np.testing.assert_allclose(
        logits_of(params, cfg), logits_of(params2, cfg2), rtol=1e-5, atol=1e-5
    )


def test_tied_embeddings_detected(tmp_path):
    cfg = tiny_config(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, tie_word_embeddings=True)
    )
    params = chatts.init_params(cfg, jax.random.PRNGKey(1), dtype=jnp.float32)
    assert "lm_head" not in params["llm"]
    weights.save_checkpoint(str(tmp_path), cfg, params)
    cfg2, params2 = weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg2.llm.tie_word_embeddings
    assert "lm_head" not in params2["llm"]


def test_qwen3_round_trip(tmp_path):
    cfg = tiny_config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60,
                      qwen3=True)
    params = chatts.init_params(cfg, jax.random.PRNGKey(2), dtype=jnp.float32)
    assert "q_norm" in params["llm"]["layers"][0]["self_attn"]
    weights.save_checkpoint(str(tmp_path), cfg, params)
    cfg2, params2 = weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg2.llm.qk_norm
    np.testing.assert_allclose(
        np.asarray(params2["llm"]["layers"][0]["self_attn"]["q_norm"]),
        np.asarray(params["llm"]["layers"][0]["self_attn"]["q_norm"]),
        rtol=1e-6,
    )


def test_sharded_load_on_mesh(tmp_path):
    cfg = tiny_config(vocab_size=128, hidden_size=64, intermediate_size=64,
                      num_hidden_layers=1, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=120)
    params = chatts.init_params(cfg, jax.random.PRNGKey(3), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)

    from chatts_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh(dp=1, tp=2, devices=jax.devices()[:2])
    cfg2, params2 = weights.load_checkpoint(
        str(tmp_path), dtype=jnp.float32, mesh=mesh
    )
    q_kernel = params2["llm"]["layers"][0]["self_attn"]["q_proj"]["kernel"]
    # Column-sharded over tp: spread across both tp devices.
    assert len(q_kernel.sharding.device_set) == 2
    # Sharded and unsharded params produce identical logits.
    ids = np.arange(8)[None] % 128
    pos = np.arange(8)[None]
    with jax.set_mesh(mesh):
        hidden, _ = chatts.forward(params2, cfg2, jnp.asarray(ids),
                                   jnp.asarray(pos), attn_impl="xla")
        logits_sharded = np.asarray(chatts.compute_logits(params2, cfg2, hidden))
    hidden, _ = chatts.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pos),
                               attn_impl="xla")
    logits_ref = np.asarray(chatts.compute_logits(params, cfg, hidden))
    np.testing.assert_allclose(logits_sharded, logits_ref, rtol=2e-4, atol=2e-4)


def _rewrite_keys(path, mapper):
    """Rewrite tensor names in a single-file checkpoint through ``mapper``."""
    from safetensors import safe_open
    from safetensors.numpy import save_file

    fname = str(path) + "/model.safetensors"
    tensors = {}
    with safe_open(fname, framework="np") as f:
        for k in f.keys():
            tensors[mapper(k)] = np.ascontiguousarray(f.get_tensor(k))
    save_file(tensors, fname)


@pytest.mark.parametrize("scheme", ["model_ts", "language_model"])
def test_prefix_variant_checkpoints_load(tmp_path, scheme):
    """Real exports may prefix ts_encoder under model. or wrap the LLM under
    language_model. (reference mapper: chatts_vllm.py:467-470)."""
    cfg = tiny_config(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=32, ts_token_start_index=120)
    params = chatts.init_params(cfg, jax.random.PRNGKey(5), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)

    if scheme == "model_ts":
        mapper = lambda k: ("model." + k) if k.startswith("ts_encoder.") else k
    else:
        mapper = lambda k: ("language_model." + k) if k.startswith(("model.", "lm_head.")) else k
    _rewrite_keys(tmp_path, mapper)

    cfg2, params2 = weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert not cfg2.llm.tie_word_embeddings
    ids = np.arange(8)[None] % 128
    pos = np.arange(8)[None]

    def logits_of(p, c):
        hidden, _ = chatts.forward(p, c, jnp.asarray(ids), jnp.asarray(pos),
                                   attn_impl="xla")
        return np.asarray(chatts.compute_logits(p, c, hidden))

    np.testing.assert_allclose(logits_of(params, cfg), logits_of(params2, cfg2),
                               rtol=1e-5, atol=1e-5)


def test_lint_clean_checkpoint(tmp_path):
    cfg = tiny_config(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60)
    params = chatts.init_params(cfg, jax.random.PRNGKey(6), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)
    report = weights.lint_checkpoint(str(tmp_path))
    assert report.ok
    assert report.missing == ()
    assert report.unused == ()
    assert not report.tied_embeddings
    assert "clean" in report.summary()


def test_lint_reports_missing_and_unused(tmp_path):
    cfg = tiny_config(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60)
    params = chatts.init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)

    def mapper(k):
        # Drop o_proj (missing) and misname norm (missing + unused).
        if k == "model.norm.weight":
            return "model.final_norm.weight"
        return k
    _rewrite_keys(tmp_path, mapper)
    report = weights.lint_checkpoint(str(tmp_path))
    assert not report.ok
    assert "model.norm.weight" in report.missing
    assert "model.final_norm.weight" in report.unused
    assert "MISSING" in report.summary()


def test_qwen25_14b_config_parses():
    """ChatTS-14B rides Qwen2.5-14B-Instruct (reference README.md:260-263)."""
    from chatts_tpu.core.config import ChatTSConfig

    hf = {
        "architectures": ["Qwen2TSForCausalLM"],
        "model_type": "chatts",
        "vocab_size": 152064,
        "hidden_size": 5120,
        "intermediate_size": 13824,
        "num_hidden_layers": 48,
        "num_attention_heads": 40,
        "num_key_value_heads": 8,
        "rms_norm_eps": 1e-5,
        "rope_theta": 1000000.0,
        "max_position_embeddings": 32768,
        "tie_word_embeddings": False,
        "ts": {"patch_size": 16, "num_layers": 5, "hidden_size": 5120,
               "num_features": 2, "max_length": 4096},
        "ts_token_start_index": 151666,
    }
    cfg = ChatTSConfig.from_hf_dict(hf)
    assert cfg.llm.hidden_size == 5120
    assert cfg.llm.num_hidden_layers == 48
    assert cfg.llm.num_kv_groups == 5
    assert cfg.llm.head_dim == 128
    assert cfg.llm.attention_bias and not cfg.llm.qk_norm
    assert cfg.ts.max_sequence_length == 4096  # old max_length alias
    assert cfg.ts.hidden_size == 5120


def test_ts_dot_naming_and_old_max_length_config(tmp_path):
    """Old-style exports: TS encoder tensors under ``ts.*`` (the config
    sub-dict's name) and the length cap spelled ``max_length``
    (reference: chatts_vllm.py:245 reads both)."""
    import json
    import os

    cfg = tiny_config(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=32, ts_token_start_index=120)
    params = chatts.init_params(cfg, jax.random.PRNGKey(8), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)
    _rewrite_keys(tmp_path, lambda k: ("ts." + k[len("ts_encoder."):])
                  if k.startswith("ts_encoder.") else k)
    cfg_path = os.path.join(str(tmp_path), "config.json")
    with open(cfg_path) as f:
        hf = json.load(f)
    hf["ts"]["max_length"] = hf["ts"].pop("max_sequence_length")
    with open(cfg_path, "w") as f:
        json.dump(hf, f)

    report = weights.diagnose(str(tmp_path))
    assert report.ok, report.summary()
    cfg2, params2 = weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
    assert cfg2.ts.max_sequence_length == 32
    np.testing.assert_allclose(
        np.asarray(params2["ts_encoder"]["mlp"][0]["kernel"]),
        np.asarray(params["ts_encoder"]["mlp"][0]["kernel"]),
        rtol=1e-6, atol=1e-6)


def test_diagnose_reports_shape_mismatch(tmp_path):
    """A checkpoint whose tensor shapes disagree with config.json must be
    caught from header metadata, before any tensor data loads."""
    cfg = tiny_config(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60)
    params = chatts.init_params(cfg, jax.random.PRNGKey(9), dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)

    from safetensors import safe_open
    from safetensors.numpy import save_file

    fname = str(tmp_path) + "/model.safetensors"
    tensors = {}
    with safe_open(fname, framework="np") as f:
        for k in f.keys():
            tensors[k] = np.ascontiguousarray(f.get_tensor(k))
    tensors["model.norm.weight"] = np.zeros(17, np.float32)  # wrong width
    save_file(tensors, fname)

    report = weights.diagnose(str(tmp_path))
    assert not report.ok
    assert any(k == "model.norm.weight" and exp == (16,) and got == (17,)
               for k, exp, got in report.shape_mismatches)
    assert "SHAPE MISMATCHES" in report.summary()
    with pytest.raises(ValueError, match="SHAPE MISMATCHES"):
        weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)


def test_diagnose_suggests_near_miss_names(tmp_path):
    cfg = tiny_config(vocab_size=64, hidden_size=16, intermediate_size=32,
                      num_hidden_layers=1, patch_size=4,
                      max_sequence_length=16, ts_token_start_index=60)
    params = chatts.init_params(cfg, jax.random.PRNGKey(10),
                                dtype=jnp.float32)
    weights.save_checkpoint(str(tmp_path), cfg, params)
    _rewrite_keys(tmp_path, lambda k: "model.final_norm.weight"
                  if k == "model.norm.weight" else k)
    report = weights.diagnose(str(tmp_path))
    assert "model.norm.weight" in report.missing
    assert "model.final_norm.weight" in report.suggestions.get(
        "model.norm.weight", ())
    assert "closest in checkpoint" in report.summary()
    with pytest.raises(ValueError, match="does not match the loader"):
        weights.load_checkpoint(str(tmp_path), dtype=jnp.float32)
