"""Pipeline parallelism (SURVEY §2.5: reference declares SupportsPP only —
this is a working GPipe implementation): stage-sharded forward equals the
single-device stack, and the PP train step's loss/grads drive learning."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts, qwen
from chatts_tpu.parallel import pipeline


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=4, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _batchify(cfg, seed=0, b=4, t=16):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 200, size=(b, t)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "positions": jnp.asarray(np.tile(np.arange(t, dtype=np.int32), (b, 1))),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "targets": jnp.asarray(np.roll(ids, -1, axis=1)),
        "loss_mask": jnp.ones((b, t), jnp.float32),
    }


def test_pp_forward_matches_single_device(setup):
    cfg, params = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    batch = _batchify(cfg)
    llm = params["llm"]

    embeds = qwen.embed_tokens(llm, batch["input_ids"])
    ref, _ = qwen.forward(
        llm, cfg.llm, embeds, batch["positions"],
        kv_valid=batch["attention_mask"].astype(bool),
        kv_positions=batch["positions"], attn_impl="xla",
    )

    mesh = pipeline.create_pp_mesh(4)
    stacked = pipeline.place_stacked(mesh, pipeline.stack_layers(llm))
    m, mb, t = 2, 2, batch["input_ids"].shape[1]
    hidden = pipeline.pipeline_forward(
        stacked, cfg.llm,
        embeds.reshape(m, mb, t, -1),
        batch["positions"].reshape(m, mb, t),
        batch["attention_mask"].astype(bool).reshape(m, mb, t),
        mesh=mesh,
    ).reshape(4, t, -1)
    np.testing.assert_allclose(np.asarray(hidden), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pp_train_step_learns(setup):
    cfg, params = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    mesh = pipeline.create_pp_mesh(2)
    stacked = pipeline.place_stacked(mesh, pipeline.stack_layers(params["llm"]))
    step, optimizer = pipeline.make_pp_train_step(
        cfg.llm, mesh, pipeline.PipelineTrainConfig(learning_rate=1e-2,
                                                    microbatches=2)
    )
    opt_state = optimizer.init(stacked)
    batch = _batchify(cfg, seed=1)
    losses = []
    p = stacked
    for _ in range(5):
        p, opt_state, metrics = step(p, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses  # memorizes the tiny batch


def test_pp_loss_matches_nonpp(setup):
    """Same params, same batch: the PP pipeline's loss equals the plain
    forward's loss (GPipe is math-equivalent, not approximate)."""
    cfg, params = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    batch = _batchify(cfg, seed=2)
    llm = params["llm"]
    # plain
    embeds = qwen.embed_tokens(llm, batch["input_ids"])
    hidden, _ = qwen.forward(
        llm, cfg.llm, embeds, batch["positions"],
        kv_valid=batch["attention_mask"].astype(bool),
        kv_positions=batch["positions"], attn_impl="xla",
    )
    logits = qwen.compute_logits(llm, cfg.llm, hidden)
    from chatts_tpu.train.loss import cross_entropy

    ref_loss, _ = cross_entropy(logits, batch["targets"], batch["loss_mask"])

    mesh = pipeline.create_pp_mesh(4)
    stacked = pipeline.place_stacked(mesh, pipeline.stack_layers(llm))
    step, optimizer = pipeline.make_pp_train_step(
        cfg.llm, mesh, pipeline.PipelineTrainConfig(microbatches=2)
    )
    opt_state = optimizer.init(stacked)
    _, _, metrics = step(stacked, opt_state, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss),
                               rtol=1e-4)
