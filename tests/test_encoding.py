"""Unit tests for the value-preserved encoding layer (SURVEY §4 prescription:
sp round-trip invertibility, patch-count contract)."""
import numpy as np
import pytest

from chatts_tpu.core import encoding


def test_sp_encoding_shape_and_interleave():
    ts = np.array([1.0, 2.0, 3.0, 4.0])
    enc, prompt, meta = encoding.sp_encoding(ts)
    assert enc.shape == (8, 1)
    flat = enc.reshape(-1, 2)
    # channel 1 is the all-ones valid flag
    assert np.all(flat[:, 1] == 1.0)
    assert "[Value Offset:" in prompt and prompt.endswith("<ts><ts/>")


def test_sp_encoding_no_scale_when_small():
    ts = np.array([0.0, 1.0, 2.0])  # mean 1.0, max |x - mean| = 1 < 3
    enc, _, meta = encoding.sp_encoding(ts)
    assert meta["scale_factor"] == 1.0
    np.testing.assert_allclose(enc.reshape(-1, 2)[:, 0], [-1.0, 0.0, 1.0])


def test_sp_encoding_scales_to_3():
    ts = np.array([0.0, 0.0, 30.0])
    enc, _, meta = encoding.sp_encoding(ts)
    vals = enc.reshape(-1, 2)[:, 0]
    assert np.max(np.abs(vals)) == pytest.approx(3.0)
    assert meta["scale_factor"] == pytest.approx(np.max(np.abs(ts - ts.mean())) / 3.0)


@pytest.mark.parametrize("length", [5, 64, 257, 1024, 4096])
def test_sp_round_trip(length):
    rng = np.random.default_rng(length)
    ts = rng.normal(0, 1000.0, length).cumsum()
    enc, _, meta = encoding.sp_encoding(ts)
    rec = encoding.sp_decode(enc, meta)
    np.testing.assert_allclose(rec, ts, rtol=1e-9, atol=1e-6)


def test_minmax_and_no_encoding():
    ts = np.arange(10.0)
    enc, prompt, meta = encoding.minmax_scale_encoding(ts)
    assert enc.shape == (10, 1)
    assert prompt.startswith("[Offset:")
    enc2, prompt2, meta2 = encoding.no_encoding(ts)
    np.testing.assert_array_equal(enc2, ts)
    assert prompt2 == "<ts><ts/>"
    assert meta2 == {}


def test_timeseries_encoding_dispatch():
    ts = np.arange(4.0)
    for method in ("sp", "minmax_scale", "no"):
        encoding.timeseries_encoding(ts, method)
    with pytest.raises(NotImplementedError):
        encoding.timeseries_encoding(ts, "bogus")


def test_eval_prompt_to_encoding_pads_batch():
    prompt = "a <ts><ts/> b <ts><ts/> c"
    ts = [np.arange(4.0), np.arange(8.0) * 100]
    out_prompt, batch = encoding.eval_prompt_to_encoding(prompt, ts, "sp")
    # sp gives (2L, 1); padded to the max 2L across series
    assert batch.shape == (2, 16, 1)
    # first series zero-padded beyond 8
    assert np.all(batch[0, 8:] == 0)
    assert out_prompt.count("[Value Offset:") == 2
    assert out_prompt.count("<ts><ts/>") == 2


@pytest.mark.parametrize(
    "length,patch,expected",
    [(64, 16, 4), (65, 16, 5), (5, 16, 1), (1024, 16, 64), (16, 16, 1)],
)
def test_patch_count_contract(length, patch, expected):
    assert encoding.num_patches(length, patch) == expected
    # from the (2L,1) interleave, the //2 undoes the interleave
    assert encoding.num_patches_from_encoded(2 * length, patch) == expected


def test_timeseries_to_list_rounds():
    out = encoding.timeseries_to_list(np.array([1.23456789, 2.0]))
    assert out == [1.234568, 2.0]
    nested = encoding.timeseries_to_list([[1.23456789], [2.987654321]])
    assert nested == [[1.234568], [2.987654]]


def test_timeseries_prompt_inlines_values():
    out = encoding.timeseries_prompt("x <ts><ts/> y", [[[1.23456, 2.0]]])
    assert "<ts>[[1.235, 2.0]]<ts/>" in out
