"""End-to-end slice (BASELINE config[0] analog): tiny-random ChatTS ->
processor -> prefill -> greedy decode, plus merge-correctness checks."""
import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import GenerationConfig, tiny_config
from chatts_tpu.models import chatts, qwen, ts_encoder
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.runtime.engine import InferenceEngine
from tests.helpers import FakeTokenizer


def make_model(seed=0, **kw):
    cfg = tiny_config(**kw)
    params = chatts.init_params(cfg, jax.random.PRNGKey(seed), dtype=jnp.float32)
    return cfg, params


def test_merge_places_patch_embeddings():
    cfg, params = make_model()
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    ts = np.arange(10.0)
    batch = proc(["look <ts><ts/> now"], [ts])

    embeds = chatts.input_embeddings(
        params, cfg,
        jnp.asarray(batch.input_ids),
        jnp.asarray(batch.ts_values),
        jnp.asarray(batch.ts_mask),
        jnp.asarray(batch.scatter_seq),
        jnp.asarray(batch.scatter_tok),
    )
    # Compute what the encoder alone produces.
    patch_embeds, patch_cnt, _ = ts_encoder.forward(
        params["ts_encoder"],
        jnp.asarray(batch.ts_values),
        jnp.asarray(batch.ts_mask),
        cfg.ts,
    )
    ph_positions = np.where(batch.input_ids[0] == cfg.ts_token_start_index)[0]
    assert len(ph_positions) == int(patch_cnt[0])
    for p, tok_pos in enumerate(ph_positions):
        np.testing.assert_allclose(
            np.asarray(embeds)[0, tok_pos],
            np.asarray(patch_embeds)[0, p].astype(np.asarray(embeds).dtype),
            rtol=1e-5,
        )
    # Non-placeholder positions keep token embeddings.
    plain = qwen.embed_tokens(params["llm"], jnp.asarray(batch.input_ids))
    non_ph = [
        i for i in range(batch.seq_lens[0]) if i not in set(ph_positions.tolist())
    ]
    np.testing.assert_allclose(
        np.asarray(embeds)[0, non_ph], np.asarray(plain)[0, non_ph], rtol=1e-6
    )


def test_greedy_generate_deterministic():
    cfg, params = make_model()
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32, attn_impl="xla")
    batch = proc(
        ["analyze <ts><ts/> please", "and <ts><ts/> this <ts><ts/> too"],
        [np.arange(16.0), np.sin(np.arange(32)) * 10, np.arange(8.0)],
    )
    gen = GenerationConfig(max_new_tokens=8, greedy=True)
    r1 = engine.generate(batch, gen)
    r2 = engine.generate(batch, gen)
    assert r1.token_ids == r2.token_ids
    assert all(len(t) == 8 for t in r1.token_ids)
    assert r1.ttft_s > 0 and r1.total_s >= r1.ttft_s


def test_generate_respects_eos():
    cfg, params = make_model(seed=3)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32, attn_impl="xla")
    batch = proc(["hello <ts><ts/>"], [np.arange(8.0)])
    # Find what greedy emits first, then declare it EOS: output must be empty.
    first = engine.generate(batch, GenerationConfig(max_new_tokens=2, greedy=True))
    eos = first.token_ids[0][0]
    r = engine.generate(
        batch, GenerationConfig(max_new_tokens=8, greedy=True, eos_token_ids=(eos,))
    )
    assert r.token_ids[0] == []


def test_sampled_generation_runs():
    cfg, params = make_model(seed=4)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32, attn_impl="xla")
    batch = proc(["sample <ts><ts/>"], [np.arange(12.0)])
    r = engine.generate(
        batch,
        GenerationConfig(max_new_tokens=5, temperature=0.7, top_p=0.9, top_k=10),
        rng=jax.random.PRNGKey(7),
    )
    assert len(r.token_ids[0]) == 5
    assert all(0 <= t < cfg.llm.vocab_size for t in r.token_ids[0])


def test_decode_consistent_with_full_forward_through_engine():
    """Greedy continuation via the engine must match teacher-forced argmax on a
    single big forward pass."""
    cfg, params = make_model(seed=5)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32, attn_impl="xla")
    batch = proc(["check <ts><ts/> tokens"], [np.arange(8.0)])
    n_new = 4
    result = engine.generate(batch, GenerationConfig(max_new_tokens=n_new, greedy=True))
    gen_ids = result.token_ids[0]

    # Teacher-forced: run prompt + generated prefix, check next-token argmax.
    ln = int(batch.seq_lens[0])
    for step in range(n_new):
        ids = np.concatenate(
            [batch.input_ids[0][:ln], np.asarray(gen_ids[:step], np.int32)]
        ).astype(np.int32)[None]
        positions = np.arange(ids.shape[1])[None]
        embeds = chatts.input_embeddings(
            params, cfg, jnp.asarray(ids),
            jnp.asarray(batch.ts_values), jnp.asarray(batch.ts_mask),
            jnp.asarray(batch.scatter_seq), jnp.asarray(batch.scatter_tok),
        )
        hidden, _ = qwen.forward(
            params["llm"], cfg.llm, embeds, jnp.asarray(positions), attn_impl="xla"
        )
        logits = chatts.compute_logits(params, cfg, hidden)
        assert int(np.argmax(np.asarray(logits)[0, -1])) == gen_ids[step]


def test_recent_kv_decode_matches_scatter_path():
    """The batch engine's recent-KV decode scan (chunk-local K/V buffer +
    one span-window merge per chunk) must be token-exact vs the per-step
    scatter path, across chunk boundaries (chunk 4, 10 new tokens), for
    f32-like and int8 KV caches, with uneven row lengths."""
    cfg, params = make_model(seed=6)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    batch = proc(
        ["compare <ts><ts/> paths", "short <ts><ts/>"],
        [np.arange(24.0), np.sin(np.arange(16.0)) * 3],
    )
    gen = GenerationConfig(max_new_tokens=10, greedy=True)
    for dtype in (jnp.float32, jnp.int8):
        ref = InferenceEngine(params, cfg, cache_dtype=dtype,
                              attn_impl="xla", decode_chunk=4,
                              decode_recent_kv=False)
        rec = InferenceEngine(params, cfg, cache_dtype=dtype,
                              attn_impl="xla", decode_chunk=4,
                              decode_recent_kv=True)
        r_ref = ref.generate(batch, gen)
        r_rec = rec.generate(batch, gen)
        assert r_rec.token_ids == r_ref.token_ids, dtype


def test_chunked_prefill_matches_monolithic():
    """Long-prompt chunked prefill must be token-exact vs one-block prefill,
    in bf16-like f32 caches and in int8 KV mode, uneven row lengths included."""
    cfg, params = make_model(seed=5)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    # Two rows with very different lengths so chunk boundaries straddle both
    # a mid-chunk row end and padded tail chunks.
    long_text = " ".join(["point"] * 60)
    batch = proc(
        [f"analyze <ts><ts/> {long_text}", "short <ts><ts/> row"],
        [np.sin(np.arange(64.0)) * 4.0, np.arange(16.0)],
    )
    gen = GenerationConfig(max_new_tokens=6, greedy=True)

    base = InferenceEngine(params, cfg, cache_dtype=jnp.float32, attn_impl="xla")
    expected = base.generate(batch, gen)

    for chunk in (16, 32):
        eng = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                              attn_impl="xla", prefill_chunk=chunk)
        got = eng.generate(batch, gen)
        assert got.token_ids == expected.token_ids, f"chunk={chunk}"

    # int8 KV-cache mode: chunked and monolithic must agree with each other.
    base_i8 = InferenceEngine(params, cfg, cache_dtype=jnp.int8, attn_impl="xla")
    eng_i8 = InferenceEngine(params, cfg, cache_dtype=jnp.int8,
                             attn_impl="xla", prefill_chunk=16)
    assert (eng_i8.generate(batch, gen).token_ids
            == base_i8.generate(batch, gen).token_ids)


def test_short_prompt_skips_chunking():
    cfg, params = make_model(seed=6)
    proc = ChatTSProcessor(FakeTokenizer(), cfg)
    eng = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                          attn_impl="xla", prefill_chunk=4096)
    batch = proc(["tiny <ts><ts/>"], [np.arange(8.0)])
    r = eng.generate(batch, GenerationConfig(max_new_tokens=4, greedy=True))
    assert all(len(t) == 4 for t in r.token_ids)
