"""Processor tests: placeholder expansion contract, bucketing, scatter map."""
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.processor.processor import (
    ChatTSProcessor,
    bucket_count,
    bucket_series_len,
    bucket_tokens,
)
from tests.helpers import FakeTokenizer


@pytest.fixture
def proc():
    cfg = tiny_config(ts_token_start_index=500, patch_size=4)
    return ChatTSProcessor(FakeTokenizer(), cfg)


def test_buckets():
    assert bucket_series_len(5) == 64
    assert bucket_series_len(64) == 64
    assert bucket_series_len(65) == 128
    assert bucket_series_len(5000) == 8192
    assert bucket_count(0) == 1
    assert bucket_count(3) == 4
    assert bucket_tokens(1) == 128
    assert bucket_tokens(129) == 256


def test_placeholder_expansion(proc):
    ts = np.arange(10.0)  # 10 points, patch 4 -> 3 patches
    batch = proc(["hello <ts><ts/> world"], [ts])
    ids = batch.input_ids[0]
    ph = proc.config.ts_token_start_index
    assert (ids == ph).sum() == 3
    # the ts-end token follows the placeholder run
    run_end = int(np.where(ids == ph)[0][-1])
    assert ids[run_end + 1] == proc.config.ts_end_token_index
    assert batch.patch_cnt[0] == 3
    # sp echo text inserted into encoded prompt
    assert "[Value Offset:" in batch.encoded_prompts[0]


def test_scatter_map_points_at_placeholders(proc):
    ts1, ts2 = np.arange(8.0), np.arange(6.0) * 3
    batch = proc(["a <ts><ts/> b <ts><ts/> c"], [ts1, ts2])
    ph = proc.config.ts_token_start_index
    ids = batch.input_ids[0]
    ph_positions = np.where(ids == ph)[0]
    # 2 + 2 patches
    assert len(ph_positions) == 4
    valid = batch.scatter_tok[batch.scatter_tok < batch.input_ids.shape[1]]
    np.testing.assert_array_equal(np.sort(valid), np.sort(ph_positions))
    # all valid scatter rows map to sequence 0
    valid_seq = batch.scatter_seq[batch.scatter_tok < batch.input_ids.shape[1]]
    assert np.all(valid_seq == 0)


def test_batch_of_two_with_uneven_series(proc):
    batch = proc(
        ["one <ts><ts/> series", "no series here"],
        [np.arange(12.0)],
    )
    assert batch.input_ids.shape[0] == 2
    assert batch.seq_lens[1] > 0
    # series rows are padded to a power-of-two bucket (1 -> 1)
    assert batch.ts_values.shape[0] == 1
    assert batch.num_ts_tokens == 3


def test_series_count_mismatch_raises(proc):
    with pytest.raises(ValueError):
        proc(["x <ts><ts/>"], [])
    with pytest.raises(ValueError):
        proc(["no holes"], [np.arange(4.0)])


def test_series_too_long_raises(proc):
    too_long = np.arange(proc.config.ts.max_sequence_length + 1, dtype=float)
    with pytest.raises(ValueError):
        proc(["x <ts><ts/>"], [too_long])


def test_values_are_sp_scaled(proc):
    ts = np.array([0.0, 0.0, 30.0, 0.0])
    batch = proc(["x <ts><ts/>"], [ts])
    row = batch.ts_values[0][batch.ts_mask[0] > 0]
    assert np.max(np.abs(row)) == pytest.approx(3.0, rel=1e-5)


def test_no_encoding_method():
    cfg = tiny_config(ts_token_start_index=500, patch_size=4)
    proc = ChatTSProcessor(FakeTokenizer(), cfg, encoding_method="no")
    ts = np.array([5.0, 6.0, 7.0, 8.0])
    batch = proc(["x <ts><ts/>"], [ts])
    row = batch.ts_values[0][batch.ts_mask[0] > 0]
    np.testing.assert_allclose(row, ts)
    assert "[Value Offset:" not in batch.encoded_prompts[0]


def test_token_bucket_padding(proc):
    batch = proc(["short <ts><ts/>"], [np.arange(4.0)])
    assert batch.input_ids.shape[1] % 128 == 0
    # padding positions are masked out
    ln = batch.seq_lens[0]
    assert np.all(batch.attention_mask[0, :ln] == 1)
    assert np.all(batch.attention_mask[0, ln:] == 0)


def test_series_len_floor_canonicalizes_shape():
    """series_len_floor pins the padded series-length bucket (one compiled
    admission-embed shape for open traffic); token expansion still uses the
    TRUE series length, and padded points stay masked."""
    cfg = tiny_config(ts_token_start_index=500, patch_size=4,
                      max_sequence_length=128)
    base = ChatTSProcessor(FakeTokenizer(), cfg)
    floored = ChatTSProcessor(FakeTokenizer(), cfg, series_len_floor=128)
    ts = np.arange(8.0)
    b0 = base(["x <ts><ts/>"], [ts])
    b1 = floored(["x <ts><ts/>"], [ts])
    assert b1.ts_values.shape[1] == 128
    assert b1.ts_values.shape[1] > b0.ts_values.shape[1]
    # identical token stream and mask semantics
    np.testing.assert_array_equal(b0.input_ids, b1.input_ids)
    assert b1.ts_mask[0, 8:].sum() == 0
    np.testing.assert_allclose(b1.ts_values[0, :8], b0.ts_values[0, :8])
