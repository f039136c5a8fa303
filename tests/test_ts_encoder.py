"""TS patch encoder: vectorized JAX vs a straightforward per-sample numpy
oracle implementing the documented semantics (pad-with-last-value, patchify,
MLP with erf-GELU), across all three position-feature variants."""
import jax
import numpy as np
import pytest
from scipy.special import erf

from chatts_tpu.core.config import TSEncoderConfig
from chatts_tpu.models import ts_encoder


def gelu_exact(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def numpy_oracle(params, values_list, cfg: TSEncoderConfig, batch_max_vl=None):
    """Per-sample reference computation, mirrors chatts_vllm.py:93-193."""
    outs = []
    if batch_max_vl is None:
        batch_max_vl = max(len(v) for v in values_list)
    for vals in values_list:
        vl = len(vals)
        pc = -(-vl // cfg.patch_size)
        total = pc * cfg.patch_size
        padded = np.concatenate([vals, np.full(total - vl, vals[-1])])
        patches = padded.reshape(pc, cfg.patch_size)
        if cfg.use_position_embedding:
            pos = np.arange(total)
            pos[vl:] = cfg.padding_idx
            table = np.asarray(params["position_embedding"], np.float64)
            emb = table[pos].reshape(pc, cfg.patch_size * cfg.embedding_dim)
            x = np.concatenate([patches, emb], axis=1)
        elif cfg.use_position_idx:
            pos = np.arange(total, dtype=np.float64) / max(1, batch_max_vl - 1)
            pos[vl:] = -1.0
            x = np.stack([padded, pos], axis=-1).reshape(pc, 2 * cfg.patch_size)
        else:
            x = patches
        for i, layer in enumerate(params["mlp"]):
            x = x @ np.asarray(layer["kernel"], np.float64) + np.asarray(
                layer["bias"], np.float64
            )
            if i < len(params["mlp"]) - 1:
                x = gelu_exact(x)
        outs.append(x)
    return outs


def build_batch(values_list, lmax):
    n = len(values_list)
    values = np.zeros((n, lmax), np.float32)
    mask = np.zeros((n, lmax), np.float32)
    for i, v in enumerate(values_list):
        values[i, : len(v)] = v
        mask[i, : len(v)] = 1.0
    return values, mask


@pytest.mark.parametrize(
    "variant", ["plain", "position_embedding", "position_idx"]
)
def test_encoder_matches_oracle(variant):
    cfg = TSEncoderConfig(
        patch_size=4,
        num_layers=3,
        hidden_size=32,
        max_sequence_length=64,
        use_position_embedding=variant == "position_embedding",
        use_position_idx=variant == "position_idx",
        embedding_dim=8,
    )
    params = ts_encoder.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    lengths = [5, 16, 23, 64]
    values_list = [rng.normal(0, 1, l) for l in lengths]
    values, mask = build_batch(values_list, 64)

    emb, patch_cnt, patch_mask = jax.jit(
        ts_encoder.forward, static_argnums=3
    )(params, values, mask, cfg)
    emb = np.asarray(emb)

    expected_pc = [-(-l // cfg.patch_size) for l in lengths]
    np.testing.assert_array_equal(np.asarray(patch_cnt), expected_pc)
    for i, pc in enumerate(expected_pc):
        assert np.all(np.asarray(patch_mask)[i, :pc])
        assert not np.any(np.asarray(patch_mask)[i, pc:])

    oracle = numpy_oracle(params, values_list, cfg)
    for i, exp in enumerate(oracle):
        got = emb[i, : expected_pc[i]]
        np.testing.assert_allclose(got, exp, rtol=2e-5, atol=2e-5)


def test_encoder_zero_length_series_padding_row():
    """A fully-masked padding row must yield patch_cnt 0 and no valid patches
    (prefix-caching consistency analog of chatts_vllm.py:553-559)."""
    cfg = TSEncoderConfig(patch_size=4, num_layers=2, hidden_size=16,
                          max_sequence_length=32)
    params = ts_encoder.init_params(cfg, jax.random.PRNGKey(1))
    values = np.zeros((2, 8), np.float32)
    mask = np.zeros((2, 8), np.float32)
    mask[0, :6] = 1.0
    values[0, :6] = np.arange(6)
    _, patch_cnt, patch_mask = ts_encoder.forward(params, values, mask, cfg)
    assert list(np.asarray(patch_cnt)) == [2, 0]
    assert not np.any(np.asarray(patch_mask)[1])


def test_unpack_interleaved_round_trip():
    rng = np.random.default_rng(2)
    from chatts_tpu.core.encoding import sp_encoding

    ts = rng.normal(0, 50, 10)
    enc, _, _ = sp_encoding(ts)
    batch = enc[np.newaxis].astype(np.float32)  # (1, 2L, 1)
    vals, mask = ts_encoder.unpack_interleaved(batch)
    assert vals.shape == (1, 10)
    np.testing.assert_allclose(np.asarray(mask), 1.0)
    np.testing.assert_allclose(
        np.asarray(vals)[0], enc.reshape(-1, 2)[:, 0], rtol=1e-6
    )


def test_pad_with_last_value():
    import jax.numpy as jnp

    values = jnp.asarray(np.array([[1.0, 2.0, 3.0, 0.0], [5.0, 0.0, 0.0, 0.0]]))
    out = ts_encoder.pad_with_last_value(values, jnp.asarray([3, 1]))
    np.testing.assert_array_equal(
        np.asarray(out), [[1, 2, 3, 3], [5, 5, 5, 5]]
    )


def test_torch_state_dict_conversion():
    """Conversion from torch Linear layout (out,in) to our (in,out) kernels."""
    cfg = TSEncoderConfig(patch_size=4, num_layers=2, hidden_size=8,
                          max_sequence_length=16, use_position_embedding=True,
                          embedding_dim=4)
    rng = np.random.default_rng(3)
    sd = {
        "ts_encoder.mlp.0.weight": rng.normal(size=(8, cfg.mlp_input_size)),
        "ts_encoder.mlp.0.bias": rng.normal(size=(8,)),
        "ts_encoder.mlp.2.weight": rng.normal(size=(8, 8)),
        "ts_encoder.mlp.2.bias": rng.normal(size=(8,)),
        "ts_encoder.position_embedding.weight": rng.normal(size=(17, 4)),
    }
    params = ts_encoder.load_torch_state_dict(sd, cfg)
    np.testing.assert_allclose(
        np.asarray(params["mlp"][0]["kernel"]),
        sd["ts_encoder.mlp.0.weight"].T,
        rtol=1e-6,
    )
    assert params["position_embedding"].shape == (17, 4)
