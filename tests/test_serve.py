"""Continuous-batching engine + OpenAI-compatible server tests (tiny model,
CPU).  The multi-request interleaving here is the analog of the reference's
informal batch probe (demo_vllm.py:55-59) made into a real test."""
import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chatts_tpu.core.config import tiny_config
from chatts_tpu.models import chatts
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine
from chatts_tpu.serve.server import ChatTSServer, apply_qwen_chat_template
from tests.helpers import FakeTokenizer


@pytest.fixture(scope="module")
def engine_setup():
    cfg = tiny_config(vocab_size=256, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, patch_size=4,
                      max_sequence_length=64, ts_token_start_index=240)
    params = chatts.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    proc = ChatTSProcessor(FakeTokenizer(vocab_limit=200), cfg)
    return cfg, params, proc


def make_engine(engine_setup, **kw):
    cfg, params, proc = engine_setup
    kw.setdefault("max_batch_size", 4)
    kw.setdefault("max_model_len", 512)
    kw.setdefault("cache_dtype", jnp.float32)
    kw.setdefault("attn_impl", "xla")
    kw.setdefault("decode_chunk", 4)
    return ServeEngine(params, cfg, proc, **kw)


def test_single_request(engine_setup):
    with make_engine(engine_setup) as eng:
        req = eng.generate_sync(
            "hello <ts><ts/> world", [np.arange(8.0)],
            SamplingParams(max_tokens=6, temperature=0.0),
        )
    assert len(req.output_tokens) == 6
    assert req.finish_reason == "length"
    assert req.ttft_s is not None and req.ttft_s > 0
    assert req.prompt_tokens > 0


def test_concurrent_requests_interleave(engine_setup):
    with make_engine(engine_setup) as eng:
        reqs = [
            Request(f"req {i} <ts><ts/>", [np.arange(8.0) * (i + 1)],
                    SamplingParams(max_tokens=5, temperature=0.0))
            for i in range(6)  # more than max_batch_size=4
        ]
        for r in reqs:
            eng.submit(r)
        import time

        deadline = time.time() + 120
        while any(r.finished_s is None and r.error is None for r in reqs):
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.01)
    for r in reqs:
        assert r.error is None
        assert len(r.output_tokens) == 5
    assert eng.stats()["total_requests"] == 6


def test_determinism_matches_batch_engine(engine_setup):
    """Greedy decode through the serving engine must match the batch engine."""
    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    prompt = "check <ts><ts/> parity"
    ts = [np.arange(12.0)]
    batch_engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                                   attn_impl="xla")
    expected = batch_engine.generate(
        proc([prompt], ts), GenerationConfig(max_new_tokens=6, greedy=True)
    ).token_ids[0]

    with make_engine(engine_setup) as eng:
        req = eng.generate_sync(prompt, ts, SamplingParams(max_tokens=6, temperature=0.0))
    assert req.output_tokens == expected


def test_request_too_long_rejected(engine_setup):
    with make_engine(engine_setup, max_model_len=128) as eng:
        req = Request("x " * 100 + "<ts><ts/>", [np.arange(8.0)],
                      SamplingParams(max_tokens=200))
        eng.submit(req)
        import time

        deadline = time.time() + 30
        while req.error is None and req.finished_s is None:
            assert time.time() < deadline
            time.sleep(0.01)
    assert req.error is not None and "max_model_len" in req.error


def test_eos_stops_generation(engine_setup):
    cfg, params, proc = engine_setup
    with make_engine(engine_setup) as eng:
        probe = eng.generate_sync("stop <ts><ts/> now", [np.arange(8.0)],
                                  SamplingParams(max_tokens=4, temperature=0.0))
        eos = probe.output_tokens[1]
    with make_engine(engine_setup, eos_token_ids=(eos,)) as eng:
        req = eng.generate_sync("stop <ts><ts/> now", [np.arange(8.0)],
                                SamplingParams(max_tokens=10, temperature=0.0))
    assert req.output_tokens == probe.output_tokens[:1]
    assert req.finish_reason == "stop"


def test_chat_template_collects_series():
    messages = [
        {"role": "user", "content": [
            {"type": "text", "text": "look at "},
            {"timeseries": [1.0, 2.0, 3.0]},
            {"type": "text", "text": " and "},
            {"timeseries": [4.0, 5.0]},
        ]},
    ]
    prompt, series = apply_qwen_chat_template(messages)
    assert prompt.count("<ts><ts/>") == 2
    assert prompt.startswith("<|im_start|>system")
    assert prompt.endswith("<|im_start|>assistant\n")
    assert len(series) == 2
    np.testing.assert_array_equal(series[1], [4.0, 5.0])


def test_http_server_end_to_end(engine_setup):
    cfg, params, proc = engine_setup
    eng = make_engine(engine_setup)
    server = ChatTSServer(eng, FakeTokenizer(vocab_limit=200), port=0)

    # Bind on an ephemeral port.
    from http.server import ThreadingHTTPServer

    server.engine.start()
    httpd = None

    def run():
        nonlocal httpd
        server.port = 0
        server.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time

    deadline = time.time() + 10
    while server._httpd is None and time.time() < deadline:
        time.sleep(0.05)
    assert server._httpd is not None
    port = server._httpd.server_address[1]

    try:
        # /health
        with urllib.request.urlopen(f"http://localhost:{port}/health") as r:
            assert json.loads(r.read())["status"] == "ok"
        # /v1/models
        with urllib.request.urlopen(f"http://localhost:{port}/v1/models") as r:
            assert json.loads(r.read())["data"][0]["id"] == "chatts"
        # chat completion with a timeseries content part
        body = json.dumps({
            "model": "chatts",
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "analyze "},
                {"timeseries": list(np.sin(np.arange(8)))},
            ]}],
            "max_tokens": 5,
            "temperature": 0.0,
        }).encode()
        req = urllib.request.Request(
            f"http://localhost:{port}/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            data = json.loads(r.read())
        assert data["choices"][0]["message"]["content"]
        assert data["usage"]["completion_tokens"] == 5
        # streaming
        body2 = json.loads(body)
        body2["stream"] = True
        req2 = urllib.request.Request(
            f"http://localhost:{port}/v1/chat/completions",
            data=json.dumps(body2).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=120) as r:
            events = r.read().decode()
        assert "data: [DONE]" in events
        assert events.count("data:") >= 2
        # malformed JSON
        bad = urllib.request.Request(
            f"http://localhost:{port}/v1/chat/completions", data=b"{oops",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "should have failed"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_request_cancellation(engine_setup):
    import time

    with make_engine(engine_setup) as eng:
        req = Request("cancel me <ts><ts/>", [np.arange(8.0)],
                      SamplingParams(max_tokens=200, temperature=0.0))
        eng.submit(req)
        # let it start decoding, then cancel
        while req.first_token_s is None and req.error is None:
            time.sleep(0.01)
        req.cancel()
        deadline = time.time() + 60
        while req.finished_s is None and req.error is None:
            assert time.time() < deadline
            time.sleep(0.01)
        assert req.finish_reason == "cancelled"
        assert len(req.output_tokens) < 200


def test_series_limit_enforced(engine_setup):
    cfg, params, proc = engine_setup
    import dataclasses

    small_cfg = dataclasses.replace(cfg, max_timeseries_per_prompt=2)
    from chatts_tpu.processor.processor import ChatTSProcessor
    from tests.helpers import FakeTokenizer

    p2 = ChatTSProcessor(FakeTokenizer(vocab_limit=200), small_cfg)
    with pytest.raises(ValueError, match="per-prompt limit"):
        p2(["a <ts><ts/> b <ts><ts/> c <ts><ts/>"],
           [np.arange(8.0)] * 3)


def test_int8_kv_serving_matches_batch_engine(engine_setup):
    """Serving with an int8-quantized KV cache (4-tuple caches with per-token
    scales) must follow the same numerics as the batch engine in int8 mode."""
    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    prompt = "int8 <ts><ts/> serving"
    ts = [np.arange(12.0)]
    batch_engine = InferenceEngine(params, cfg, cache_dtype=jnp.int8,
                                   attn_impl="xla")
    expected = batch_engine.generate(
        proc([prompt], ts), GenerationConfig(max_new_tokens=6, greedy=True)
    ).token_ids[0]

    with make_engine(engine_setup, cache_dtype=jnp.int8) as eng:
        req = eng.generate_sync(prompt, ts,
                                SamplingParams(max_tokens=6, temperature=0.0))
    assert req.output_tokens == expected


def test_sample_per_slot_semantics():
    """Per-slot sampling: greedy rows take argmax; sampled rows stay inside
    the top-K candidate set; tiny top_p collapses to the argmax."""
    import jax

    from chatts_tpu.runtime.sampling import TOP_K_CAP, sample_per_slot

    rng = np.random.default_rng(0)
    v = 1000
    logits = jnp.asarray(rng.normal(0, 1, (4, v)).astype(np.float32))
    # Row 2 gets a dominant token well outside index order.
    logits = logits.at[2, 777].add(50.0)
    temperature = jnp.asarray([0.0, 1.0, 0.8, 1.5], jnp.float32)
    top_p = jnp.asarray([1.0, 1.0, 0.01, 1.0], jnp.float32)

    argmax = np.argmax(np.asarray(logits), axis=-1)
    topk_sets = [
        set(np.argsort(np.asarray(logits)[i])[::-1][:TOP_K_CAP].tolist())
        for i in range(4)
    ]
    for seed in range(5):
        toks = np.asarray(sample_per_slot(
            logits, jax.random.PRNGKey(seed), temperature, top_p
        ))
        assert toks[0] == argmax[0]  # greedy row
        assert toks[2] == 777  # tiny top_p -> argmax (the spiked token)
        for i in range(4):
            assert int(toks[i]) in topk_sets[i]


def test_block_admission_int8_kv_token_exact(engine_setup):
    """Block-mode admission with an int8 KV cache: the admission's K/V AND
    per-token scale buffers span-scatter into the 4-tuple caches; greedy
    output must match the batch engine in int8 mode."""
    import time

    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    be = InferenceEngine(params, cfg, cache_dtype=jnp.int8, attn_impl="xla",
                         fuse=False)

    def expected(prompt, ts, n):
        return be.generate(
            proc([prompt], ts), GenerationConfig(max_new_tokens=n, greedy=True)
        ).token_ids[0]

    p1, t1 = "runner <ts><ts/> int8 kv", [np.arange(12.0)]
    p2, t2 = "joins <ts><ts/> int8 kv", [np.sin(np.arange(8.0))]

    with make_engine(engine_setup, cache_dtype=jnp.int8) as eng:
        r1 = Request(p1, t1, SamplingParams(max_tokens=24, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        r2 = Request(p2, t2, SamplingParams(max_tokens=6, temperature=0.0))
        eng.submit(r2)
        while any(r.finished_s is None and r.error is None for r in (r1, r2)):
            assert time.time() < deadline
            time.sleep(0.002)
    assert r1.error is None and r2.error is None
    assert eng.mixed_rounds_run > 0  # block round ran
    assert r1.output_tokens == expected(p1, t1, 24)
    assert r2.output_tokens == expected(p2, t2, 6)


def test_block_admission_decodes_in_its_own_round(engine_setup):
    """Admit-then-decode: a block-mode admission's request must stream
    1 + decode_chunk tokens the moment its admission round completes —
    the scan runs AFTER the prompt block with the new rows live, so the
    slot never idles its admission round (the old scan-first design left
    it at exactly 1 token until the NEXT round).  Pinned via the stream
    queue: the admission round delivers [first] then its own scan chunk."""
    import time

    with make_engine(engine_setup, decode_chunk=4) as eng:
        anchor = Request("anchor <ts><ts/> decodes", [np.arange(8.0)],
                         SamplingParams(max_tokens=40, temperature=0.0))
        eng.submit(anchor)
        deadline = time.time() + 60
        while not anchor.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        newcomer = Request("newcomer <ts><ts/> joins", [np.arange(8.0)],
                           SamplingParams(max_tokens=30, temperature=0.0))
        eng.submit(newcomer)
        first_delivery = newcomer.stream_queue.get(timeout=30)
        second_delivery = newcomer.stream_queue.get(timeout=30)
        while newcomer.finished_s is None and newcomer.error is None:
            assert time.time() < deadline
            time.sleep(0.002)
        anchor.cancel()
    assert newcomer.error is None
    assert first_delivery == newcomer.output_tokens[:1]
    # The second delivery is the admission round's OWN scan output — a
    # full 4-token chunk, not the next round's.
    assert second_delivery == newcomer.output_tokens[1:5]
    assert len(newcomer.output_tokens) == 30


def test_wide_admission_bucket_rungs_token_exact(engine_setup):
    """admission_bucket above 8 engages the {10, 12} block-family rungs
    (high-concurrency configs where churn exceeds 8 rows/round) and caps
    each wave at the bucket: 13 requests admitted while a slot decodes
    must land as a 12-row block wave plus a requeued follow-up, all
    token-exact vs the batch engine."""
    import time

    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    be = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                         attn_impl="xla")

    def expected(prompt, ts, n):
        return be.generate(
            proc([prompt], ts), GenerationConfig(max_new_tokens=n, greedy=True)
        ).token_ids[0]

    with make_engine(engine_setup, max_batch_size=16,
                     admission_bucket=12) as eng:
        assert eng._a_bucket == 12
        anchor = Request("anchor <ts><ts/> runs", [np.arange(12.0)],
                         SamplingParams(max_tokens=40, temperature=0.0))
        eng.submit(anchor)
        deadline = time.time() + 120
        while not anchor.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        wave = [
            Request(f"wave {i} <ts><ts/> joins", [np.arange(8.0) + i],
                    SamplingParams(max_tokens=5, temperature=0.0))
            for i in range(13)
        ]
        for r in wave:
            eng.submit(r)
        while any(r.finished_s is None and r.error is None
                  for r in wave + [anchor]):
            assert time.time() < deadline, "wave did not finish"
            time.sleep(0.002)
    for i, r in enumerate(wave):
        assert r.error is None, r.error
        assert r.output_tokens == expected(
            f"wave {i} <ts><ts/> joins", [np.arange(8.0) + i], 5), i
    assert anchor.output_tokens == expected(
        "anchor <ts><ts/> runs", [np.arange(12.0)], 40)


def test_chunked_admission_matches_monolithic(engine_setup):
    """Long prompts admitted in chunks must produce identical greedy output
    to the monolithic admission path (bf16-like and int8 KV)."""
    prompt = "analyze <ts><ts/> " + "tok " * 200
    ts = [np.arange(24.0)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)
    for dtype in (jnp.float32, jnp.int8):
        with make_engine(engine_setup, max_model_len=512,
                         cache_dtype=dtype) as eng:
            base = eng.generate_sync(prompt, ts, sp)
        with make_engine(engine_setup, max_model_len=512, cache_dtype=dtype,
                         prefill_chunk=64) as eng:
            got = eng.generate_sync(prompt, ts, sp)
        assert got.output_tokens == base.output_tokens, dtype
        assert len(got.output_tokens) == 6


def test_chunked_admission_fragmented_slots(engine_setup):
    """Chunked admission with occupied slots and mixed-length rows: short
    requests hold slots (monolithic path) while long ones admit chunked into
    the free slots; outputs must match the all-monolithic engine."""
    import time

    long_prompt = "analyze <ts><ts/> " + "tok " * 180
    short_prompt = "short <ts><ts/> prompt"
    sp = SamplingParams(max_tokens=5, temperature=0.0)

    def run(**kw):
        with make_engine(engine_setup, max_model_len=512, **kw) as eng:
            # occupy slots with short requests first (fragment the free list)
            shorts = [Request(short_prompt, [np.arange(8.0) * (i + 1)], 
                              SamplingParams(max_tokens=12, temperature=0.0))
                      for i in range(2)]
            for r in shorts:
                eng.submit(r)
            while not eng.live_host.any():
                time.sleep(0.005)
            longs = [Request(long_prompt, [np.arange(24.0) + i], sp)
                     for i in range(2)]
            for r in longs:
                eng.submit(r)
            deadline = time.time() + 300
            while any(r.finished_s is None and r.error is None
                      for r in shorts + longs):
                assert time.time() < deadline
                time.sleep(0.01)
        for r in shorts + longs:
            assert r.error is None, r.error
        return [r.output_tokens for r in longs]

    base = run()
    got = run(prefill_chunk=64)
    assert got == base


def test_decode_interleaves_with_chunked_admission(engine_setup):
    """While a long prompt admits chunk-by-chunk, live slots must keep
    emitting tokens (the admission must not starve decode)."""
    import time

    with make_engine(engine_setup, max_model_len=512, prefill_chunk=32) as eng:
        short = Request("keep <ts><ts/> going", [np.arange(8.0)],
                        SamplingParams(max_tokens=120, temperature=0.0))
        eng.submit(short)
        while short.first_token_s is None:
            time.sleep(0.005)
        n_before = len(short.output_tokens)
        long_req = Request("analyze <ts><ts/> " + "tok " * 200,
                           [np.arange(24.0)],
                           SamplingParams(max_tokens=4, temperature=0.0))
        eng.submit(long_req)
        while long_req.first_token_s is None and long_req.error is None:
            time.sleep(0.005)
        assert long_req.error is None
        # tokens emitted by the short request between the long submit and the
        # long request's first token => decode ran during admission
        n_during = len(short.output_tokens)
        deadline = time.time() + 120
        while any(r.finished_s is None and r.error is None
                  for r in (short, long_req)):
            assert time.time() < deadline
            time.sleep(0.01)
    assert n_during > n_before, "decode made no progress during admission"
    assert len(long_req.output_tokens) == 4
    assert len(short.output_tokens) == 120


def test_stop_during_chunked_admission(engine_setup):
    """Stopping the engine mid-admission must not hang; the pending request
    simply never completes (engine shut down) and no exception leaks."""
    import time

    eng = make_engine(engine_setup, max_model_len=512, prefill_chunk=32)
    eng.start()
    req = Request("analyze <ts><ts/> " + "tok " * 220, [np.arange(16.0)],
                  SamplingParams(max_tokens=8, temperature=0.0))
    eng.submit(req)
    # stop quickly, likely mid-admission
    time.sleep(0.2)
    eng.stop()
    assert eng._thread is None  # joined cleanly


def test_mixed_admission_while_decoding_token_exact(engine_setup):
    """Admissions that arrive while slots are decoding route through the
    fused mixed prefill+decode step (no monolithic stall) and must be
    token-exact vs the batch engine, and must not perturb the in-flight
    request's tokens."""
    import time

    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    batch_engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                                   attn_impl="xla")

    def expected(prompt, ts, n):
        return batch_engine.generate(
            proc([prompt], ts), GenerationConfig(max_new_tokens=n, greedy=True)
        ).token_ids[0]

    p1, t1 = "first long runner <ts><ts/> keeps decoding", [np.arange(12.0)]
    p2, t2 = "second arrives <ts><ts/> mid decode", [np.sin(np.arange(8.0))]
    p3, t3 = "third also <ts><ts/> arrives", [np.arange(8.0) * 0.5]

    with make_engine(engine_setup) as eng:
        r1 = Request(p1, t1, SamplingParams(max_tokens=40, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:  # wait until r1 is live and decoding
            assert time.time() < deadline
            time.sleep(0.005)
        r2 = Request(p2, t2, SamplingParams(max_tokens=6, temperature=0.0))
        r3 = Request(p3, t3, SamplingParams(max_tokens=6, temperature=0.0))
        eng.submit(r2)
        eng.submit(r3)
        saw_mixed = False
        while any(r.finished_s is None and r.error is None
                  for r in (r1, r2, r3)):
            saw_mixed = saw_mixed or eng._pending_mixed is not None
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.002)
    for r in (r1, r2, r3):
        assert r.error is None, r.error
    assert saw_mixed, "admission did not take the mixed path"
    assert r1.output_tokens == expected(p1, t1, 40)
    assert r2.output_tokens == expected(p2, t2, 6)
    assert r3.output_tokens == expected(p3, t3, 6)


def test_scan_sliced_mixed_admission_token_exact(engine_setup):
    """The scan-sliced mixed step (long-prompt mode) stays token-exact when
    block mode is disabled — admissions consume the prompt in npt-token
    slices inside the decode scan."""
    import time

    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    batch_engine = InferenceEngine(params, cfg, cache_dtype=jnp.float32,
                                   attn_impl="xla")

    def expected(prompt, ts, n):
        return batch_engine.generate(
            proc([prompt], ts), GenerationConfig(max_new_tokens=n, greedy=True)
        ).token_ids[0]

    p1, t1 = "first long runner <ts><ts/> keeps decoding", [np.arange(12.0)]
    p2, t2 = "second arrives <ts><ts/> mid decode", [np.sin(np.arange(8.0))]

    with make_engine(engine_setup) as eng:
        eng.block_token_budget = 0  # force the scan-sliced path
        r1 = Request(p1, t1, SamplingParams(max_tokens=30, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        r2 = Request(p2, t2, SamplingParams(max_tokens=6, temperature=0.0))
        eng.submit(r2)
        while any(r.finished_s is None and r.error is None for r in (r1, r2)):
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.002)
    assert r1.error is None and r2.error is None
    assert eng.mixed_rounds_run > 0
    assert r1.output_tokens == expected(p1, t1, 30)
    assert r2.output_tokens == expected(p2, t2, 6)


def test_mixed_admission_overlong_cobatch_isolated(engine_setup):
    """An over-length request co-batched into a MIXED admission must be
    rejected alone: the valid requests in the wave still admit and finish.
    Regression (ADVICE r2 high): the admission family was sized from the
    admitted count while the processed batch still carried the rejected
    row, so the row copy raised and errored out the whole wave."""
    import time

    with make_engine(engine_setup, max_model_len=128) as eng:
        r1 = Request("runner <ts><ts/> decodes", [np.arange(12.0)],
                     SamplingParams(max_tokens=40, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        good = Request("short one <ts><ts/>", [np.arange(8.0)],
                       SamplingParams(max_tokens=4, temperature=0.0))
        bad = Request("x " * 100 + "<ts><ts/>", [np.arange(8.0)],
                      SamplingParams(max_tokens=200))
        good2 = Request("short two <ts><ts/>", [np.sin(np.arange(8.0))],
                        SamplingParams(max_tokens=4, temperature=0.0))
        # One submit burst so they land in one candidate wave.
        for r in (good, bad, good2):
            eng.submit(r)
        while any(r.finished_s is None and r.error is None
                  for r in (r1, good, bad, good2)):
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.005)
    assert bad.error is not None and "max_model_len" in bad.error
    for r in (r1, good, good2):
        assert r.error is None, r.error
    assert len(good.output_tokens) == 4
    assert len(good2.output_tokens) == 4


def test_warmup_compiles_mixed_step_under_small_cap(engine_setup):
    """Warmup must exercise the fused mixed prefill+decode step even when
    max_model_len is small: the warmup runner's token budget has to fit the
    (prompt + max_tokens) admission check.  Regression for the r2 bench,
    where a 4096-token runner was rejected by a 1024-cap engine and the
    mixed shapes compiled (30-60 s each) inside the measurement window."""
    with make_engine(engine_setup, max_model_len=256) as eng:
        eng.warmup(prefill_buckets=(64,), series_per_request=1,
                   series_len=16)
        assert eng.mixed_rounds_run > 0, (
            "warmup never ran the mixed prefill+decode step"
        )


def test_mixed_plan_right_sizes_admissions(engine_setup):
    """_mixed_plan picks the smallest row family covering the admission and
    an exact npt (whole prompt in one round) unless capped to keep packed
    matmul rows within the int4 kernel's single 512-row block — padded rows
    and tokens COMPUTE, so sizing is a throughput invariant (BENCHMARKS r2:
    wrong-sized steps saturated serving at ~370 tok/s)."""
    with make_engine(engine_setup, max_batch_size=32,
                     max_model_len=4096) as eng:
        chunk = eng.decode_chunk
        # trickle: singles get the 1-row family (steady-state replacements
        # are mostly singles; pad rows COMPUTE), pairs the 2-row family;
        # npt exact up to the config/row caps
        a, npt, c, t_pad = eng._mixed_plan(1, 640)
        exact = -(-640 // chunk)
        cap = min(eng.mixed_npt, max(8, (512 - eng.max_batch_size) // 1))
        assert a == 1 and npt == min(exact, cap)
        assert t_pad % c == 0 and t_pad >= 640
        a, npt, c, t_pad = eng._mixed_plan(2, 640)
        assert a == 2
        # mid burst -> 4-row family
        a, npt, c, t_pad = eng._mixed_plan(3, 640)
        assert a == 4
        # full burst -> full family
        a, *_ = eng._mixed_plan(7, 640)
        assert a == eng._a_bucket
        # long prompt: npt capped so B + a*npt <= 512 (single row block)
        a, npt, c, t_pad = eng._mixed_plan(8, 4096)
        assert eng.max_batch_size + a * npt <= 512
        assert t_pad >= 4096 and t_pad % c == 0


@pytest.mark.parametrize("cache_dtype", ["f32", "int8"])
def test_recent_kv_decode_matches_per_step_scatter(engine_setup, monkeypatch,
                                                   cache_dtype):
    """The recent-KV decode mode (chunk-local K/V buffer + two-piece
    attention + one span-window merge per chunk) must be token-exact
    against the per-step element-scatter path — across chunk boundaries,
    staggered finishes, and int8 KV quantization.  Tokens beyond the first
    chunk read the merged cache, so agreement here pins the merge too."""
    from chatts_tpu.serve import scheduler as sched_mod

    cfg, params, proc = engine_setup
    dt = jnp.float32 if cache_dtype == "f32" else jnp.int8
    prompts = [(f"req {i} <ts><ts/>", [np.arange(8.0) * (i + 1)],
                SamplingParams(max_tokens=3 + 3 * i, temperature=0.0))
               for i in range(4)]

    def run(force_recent):
        monkeypatch.setattr(sched_mod, "_recent_mode_ok",
                            lambda *a: force_recent)
        with make_engine(engine_setup, cache_dtype=dt) as eng:
            reqs = [Request(p, ts, sp) for p, ts, sp in prompts]
            for r in reqs:
                eng.submit(r)
            deadline = time.time() + 120
            while (any(r.finished_s is None and r.error is None
                       for r in reqs) and time.time() < deadline):
                time.sleep(0.02)
            assert all(r.error is None for r in reqs)
            return [r.output_tokens for r in reqs]

    assert run(True) == run(False)


# -- length-classed admission (r4) -----------------------------------------


def test_wait_queue_semantics():
    from chatts_tpu.serve.scheduler import _WaitQueue

    q = _WaitQueue()
    assert q.empty() and q.qsize() == 0
    a, b, c = object(), object(), object()
    q.put(a), q.put(b), q.put(c)
    assert q.qsize() == 3 and q.snapshot() == [a, b, c]
    assert q.get_nowait() is a
    q.remove([c])
    assert q.snapshot() == [b]
    q.requeue([a, c])  # requeue prepends, preserving order
    assert q.snapshot() == [a, c, b]
    import queue as _q

    q.remove([a, b, c])
    with pytest.raises(_q.Empty):
        q.get_nowait()


def test_count_tokens_matches_processor(engine_setup):
    cfg, params, proc = engine_setup
    prompt = "look at <ts><ts/> and tell me about <ts><ts/> please"
    series = [np.arange(12.0), np.arange(24.0) * 0.5]
    n = proc.count_tokens(prompt, series)
    batch = proc([prompt], series, pad_to_bucket=False)
    assert n == int(batch.seq_lens[0])


def _mk(prompt, series=(), max_tokens=4):
    return Request(prompt, [np.asarray(s) for s in series],
                   SamplingParams(max_tokens=max_tokens, temperature=0.0))


def test_select_candidates_groups_by_length_class(engine_setup):
    eng = make_engine(engine_setup)  # loop not started
    try:
        long_text = " ".join(f"tok{i}" for i in range(300))  # class 512
        s1, l1, s2, l2 = (_mk("short one"), _mk(long_text),
                          _mk("short two"), _mk(long_text + " more"))
        for r in (s1, l1, s2, l2):
            eng.submit(r)
        wave1 = eng._select_candidates(4)
        assert wave1 == [s1, s2]  # oldest request's class, oldest-first
        assert eng.waiting.snapshot() == [l1, l2]
        wave2 = eng._select_candidates(4)
        assert wave2 == [l1, l2]
        assert eng.waiting.empty()
        # Classes were cached on the requests.
        assert s1.token_class == 256 and l1.token_class == 512
    finally:
        eng.stop()


def test_select_candidates_binning_off_is_fifo(engine_setup):
    eng = make_engine(engine_setup, admission_binning=False)
    try:
        long_text = " ".join(f"tok{i}" for i in range(300))
        s1, l1 = _mk("short one"), _mk(long_text)
        eng.submit(s1), eng.submit(l1)
        assert eng._select_candidates(4) == [s1, l1]
    finally:
        eng.stop()


def test_select_candidates_isolates_malformed(engine_setup):
    eng = make_engine(engine_setup)
    try:
        bad = _mk("has a hole <ts><ts/> but no series")  # encode raises
        ok = _mk("fine prompt")
        eng.submit(bad), eng.submit(ok)
        wave = eng._select_candidates(4)
        assert wave == [bad] and bad.token_class == -1
        assert eng._select_candidates(4) == [ok]
    finally:
        eng.stop()


def test_select_candidates_purges_cancelled(engine_setup):
    eng = make_engine(engine_setup)
    try:
        r1, r2 = _mk("one"), _mk("two")
        eng.submit(r1), eng.submit(r2)
        r1.cancel()
        assert eng._select_candidates(4) == [r2]
        assert r1.finish_reason == "cancelled" and r1.finished_s is not None
    finally:
        eng.stop()


def test_mixed_length_requests_complete_with_binning(engine_setup):
    """End-to-end: a heterogeneous backlog (two length classes) is served to
    completion through class-grouped admission waves."""
    with make_engine(engine_setup) as eng:
        long_text = " ".join(f"tok{i}" for i in range(220))  # class 512
        reqs = [_mk("short <ts><ts/>", [np.arange(8.0)], 5),
                _mk(long_text, (), 5),
                _mk("another short one", (), 5),
                _mk(long_text + " extended", (), 5)]
        for r in reqs:
            eng.submit(r)
        deadline = time.time() + 120
        while any(r.finished_s is None and r.error is None for r in reqs):
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.01)
    for r in reqs:
        assert r.error is None
        assert len(r.output_tokens) == 5


def test_block_early_emit_token_exact(engine_setup):
    """block_early_emit: the admission runs as a prefill-only round (first
    tokens stream before any decode chunk) and the admitted rows decode in
    the next pure-decode round — greedy output must match the batch engine
    exactly (same prompt block, same K/V, same state merge)."""
    cfg, params, proc = engine_setup
    from chatts_tpu.core.config import GenerationConfig
    from chatts_tpu.runtime.engine import InferenceEngine

    be = InferenceEngine(params, cfg, attn_impl="xla", fuse=False,
                         cache_dtype=jnp.float32)

    def expected(prompt, ts, n):
        return be.generate(
            proc([prompt], ts), GenerationConfig(max_new_tokens=n, greedy=True)
        ).token_ids[0]

    p1, t1 = "runner <ts><ts/> early", [np.arange(12.0)]
    p2, t2 = "joins <ts><ts/> early", [np.sin(np.arange(8.0))]

    with make_engine(engine_setup, block_early_emit=True) as eng:
        r1 = Request(p1, t1, SamplingParams(max_tokens=24, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        r2 = Request(p2, t2, SamplingParams(max_tokens=6, temperature=0.0))
        eng.submit(r2)
        while any(r.finished_s is None and r.error is None for r in (r1, r2)):
            assert time.time() < deadline
            time.sleep(0.002)
        kinds = {r["kind"] for r in eng.round_snapshot()}
    assert r1.error is None and r2.error is None
    assert "block_pre" in kinds  # the early-emit path actually ran
    assert "block" not in kinds  # and replaced the fused block round
    assert r1.output_tokens == expected(p1, t1, 24)
    assert r2.output_tokens == expected(p2, t2, 6)


def test_block_early_emit_streams_first_token_alone(engine_setup):
    """The early-emit admission delivers exactly [first] on the stream
    before any scan chunk arrives (the fused round delivers [first] then
    its own chunk in one completion)."""
    cfg, params, proc = engine_setup
    with make_engine(engine_setup, block_early_emit=True) as eng:
        r1 = Request("runner <ts><ts/>", [np.arange(12.0)],
                     SamplingParams(max_tokens=40, temperature=0.0))
        eng.submit(r1)
        deadline = time.time() + 60
        while not r1.output_tokens:
            assert time.time() < deadline
            time.sleep(0.005)
        r2 = Request("late <ts><ts/>", [np.arange(8.0)],
                     SamplingParams(max_tokens=6, temperature=0.0))
        eng.submit(r2)
        chunks = []
        while True:
            item = r2.stream_queue.get(timeout=60)
            if item is None:
                break
            chunks.append(list(item))
    assert len(chunks[0]) == 1  # first token arrived alone (prefill round)
    assert sum(len(c) for c in chunks) == 6


def test_pad_to_class_clamps_to_cap(engine_setup):
    """A prompt longer than cap/2 has a pow2 class wider than max_model_len
    (class 512 at cap 384); the admission wave must clamp its padded width
    to the cap — no admission path can place a wider block."""
    with make_engine(engine_setup, admission_pad_to_class=True,
                     max_model_len=384) as eng:
        long_prompt = " ".join(f"tok{i}" for i in range(300))
        assert eng.processor.count_tokens(long_prompt, []) > 256  # class 512
        r = _mk(long_prompt, (), 5)
        eng.submit(r)
        deadline = time.time() + 120
        while r.finished_s is None and r.error is None:
            assert time.time() < deadline, "request did not finish"
            time.sleep(0.01)
    assert r.error is None and len(r.output_tokens) == 5


def test_processor_pad_tokens_to(engine_setup):
    cfg, params, proc = engine_setup
    batch = proc(["short prompt"], [], pad_tokens_to=256)
    assert batch.input_ids.shape[1] == 256
    with pytest.raises(ValueError, match="pad_tokens_to"):
        proc([" ".join(f"t{i}" for i in range(40))], [], pad_tokens_to=8)


def test_pad_to_class_serving_completes(engine_setup):
    """admission_pad_to_class: waves pad to their pow2 length class (one
    compiled admission shape per class) and still serve correctly."""
    with make_engine(engine_setup, admission_pad_to_class=True) as eng:
        reqs = [_mk("short <ts><ts/>", [np.arange(8.0)], 5),
                _mk(" ".join(f"tok{i}" for i in range(220)), (), 5)]
        for r in reqs:
            eng.submit(r)
        deadline = time.time() + 120
        while any(r.finished_s is None and r.error is None for r in reqs):
            assert time.time() < deadline, "requests did not finish"
            time.sleep(0.01)
    for r in reqs:
        assert r.error is None and len(r.output_tokens) == 5
