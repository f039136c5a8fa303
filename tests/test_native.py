"""Native C++ host packer: build, parity with the numpy path, fallback."""
import numpy as np
import pytest

from chatts_tpu.core import encoding
from chatts_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native host_pack library unavailable (no g++?)")
    return lib


def test_sp_encode_pack_matches_numpy(lib):
    rng = np.random.default_rng(0)
    series = [rng.normal(0, 50, l).cumsum() for l in (5, 64, 100, 256)]
    n_pad, lmax, patch = 8, 256, 16
    out = native.sp_encode_pack(series, n_pad, lmax, patch)
    assert out is not None
    values, mask, patch_cnt, offsets, scales = out
    assert values.shape == (n_pad, lmax)
    for i, ts in enumerate(series):
        enc, _, meta = encoding.sp_encoding(ts)
        ref_vals = enc.reshape(-1, 2)[:, 0]
        np.testing.assert_allclose(values[i, : len(ts)], ref_vals, rtol=1e-6, atol=1e-6)
        assert np.all(values[i, len(ts):] == 0)
        assert np.all(mask[i, : len(ts)] == 1.0)
        assert np.all(mask[i, len(ts):] == 0.0)
        assert offsets[i] == pytest.approx(meta["offset"], rel=1e-9)
        assert scales[i] == pytest.approx(meta["scale_factor"], rel=1e-9)
        assert patch_cnt[i] == encoding.num_patches(len(ts), patch)
    # padding rows zeroed
    assert np.all(patch_cnt[len(series):] == 0)


def test_sp_encode_pack_rejects_bad_args(lib):
    assert native.sp_encode_pack([np.arange(10.0)], 1, 15, 4) is None  # lmax % patch


def test_build_scatter_map_matches_numpy(lib):
    patch_cnt = np.asarray([3, 1, 0], np.int32)
    seq_of = np.asarray([0, 1, 1], np.int32)
    starts = np.asarray([5, 2, 9], np.int32)
    out = native.build_scatter_map(patch_cnt, seq_of, starts, 4, 4, 99, 999)
    assert out is not None
    sseq, stok = out
    np.testing.assert_array_equal(sseq[0], [0, 0, 0, 99])
    np.testing.assert_array_equal(stok[0], [5, 6, 7, 999])
    np.testing.assert_array_equal(sseq[1], [1, 99, 99, 99])
    np.testing.assert_array_equal(stok[1], [2, 999, 999, 999])
    np.testing.assert_array_equal(sseq[2], [99] * 4)  # pc=0
    np.testing.assert_array_equal(sseq[3], [99] * 4)  # padding row


def test_processor_native_matches_fallback():
    from chatts_tpu.core.config import tiny_config
    from chatts_tpu.processor.processor import ChatTSProcessor
    from tests.helpers import FakeTokenizer

    cfg = tiny_config(ts_token_start_index=500, patch_size=4)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    ts = [np.arange(10.0), np.sin(np.arange(30)) * 10]
    prompts = ["a <ts><ts/> b <ts><ts/> c"]
    b1 = proc(prompts, ts, use_native=True)
    b2 = proc(prompts, ts, use_native=False)
    np.testing.assert_array_equal(b1.scatter_seq, b2.scatter_seq)
    np.testing.assert_array_equal(b1.scatter_tok, b2.scatter_tok)
    np.testing.assert_array_equal(b1.input_ids, b2.input_ids)
    np.testing.assert_allclose(b1.ts_values, b2.ts_values)
