"""Diagnose block-mode round cost under saturation (r3).

Bench r3b measured block rounds at 4.4 s MEAN with 2.5 s/admission of
admit-host time — 10x the physics estimate.  This drives the bench
engine configuration through warmup + a short saturated window and dumps
the RAW round log (per round: kind, admit_host_s, round_s, live, a, t,
emitted) to separate steady-state cost from compile storms.

Run:  python scripts/experiments/expt_block_round.py
"""
import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from chatts_tpu.core.config import (ChatTSConfig, QwenConfig,
                                        TSEncoderConfig)
    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine

    vocab = 152064
    cfg = ChatTSConfig(
        llm=QwenConfig(
            vocab_size=vocab, hidden_size=3584, intermediate_size=18944,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, head_dim=128, rope_theta=1e6,
            attention_bias=True, dtype="bfloat16",
        ),
        ts=TSEncoderConfig(patch_size=16, num_layers=5, hidden_size=3584,
                           max_sequence_length=4096),
        ts_token_start_index=vocab - 10,
    )

    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            return [10 + (sum(w.encode()) * 31 + len(w)) % (vocab - 100)
                    for w in text.split()]

    t0 = time.perf_counter()
    params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                            fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    proc = ChatTSProcessor(_Tok(), cfg)
    engine = ServeEngine(
        params, cfg, proc, max_batch_size=32, max_model_len=1024,
        cache_dtype=jnp.bfloat16, decode_chunk=32, fuse=False,
    )
    rng = np.random.default_rng(0)
    filler = " ".join(f"word{i}" for i in range(400))
    prompt = (
        f"system: you are a helpful assistant. user: here are two metrics "
        f"<ts><ts/> and <ts><ts/>. {filler} analyze their local changes."
    )

    def mkreq():
        series = [rng.normal(0, 50, 256).cumsum(),
                  rng.normal(0, 5, 512).cumsum()]
        n = int(rng.integers(80, 177))
        return Request(prompt, series,
                       SamplingParams(max_tokens=n, temperature=0.0))

    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(512,), series_per_request=2,
                  series_len=512)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # workload-shape warmup incl. every block family
    t0 = time.perf_counter()
    pre = [mkreq() for _ in range(32)]
    for r in pre:
        engine.submit(r)
    dl = time.time() + 900
    while not any(r.output_tokens for r in pre):
        if time.time() > dl:
            break
        time.sleep(0.05)
    extra = []
    for n_b in (8, 4, 2, 1):
        batch2 = [mkreq() for _ in range(n_b)]
        for r in batch2:
            engine.submit(r)
        extra += batch2
        time.sleep(3)
    while any(r.finished_s is None and r.error is None for r in pre + extra):
        if time.time() > dl:
            break
        time.sleep(0.05)
    print(f"workload warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    # saturated window with full round dump
    stop = threading.Event()

    def loadgen():
        inflight = [mkreq() for _ in range(32)]
        for r in inflight:
            engine.submit(r)
        while not stop.is_set():
            for i, r in enumerate(inflight):
                if r.finished_s is not None or r.error is not None:
                    nr = mkreq()
                    engine.submit(nr)
                    inflight[i] = nr
            time.sleep(0.002)

    gen = threading.Thread(target=loadgen, daemon=True)
    gen.start()
    time.sleep(20)
    engine.round_log.clear()
    base = engine.streamed_tokens
    w0 = time.perf_counter()
    time.sleep(40)
    elapsed = time.perf_counter() - w0
    toks = engine.streamed_tokens - base
    rl = engine.round_snapshot()
    stop.set()
    gen.join(timeout=10)
    print(f"window: {toks} streamed tokens in {elapsed:.1f}s -> "
          f"{toks / elapsed:.0f} tok/s", flush=True)
    print("rounds (kind, admit_ms, round_ms, live, a, t, emitted, fresh, "
          "gap_ms):")
    for r in rl:
        print(f"  {r['kind']:6s} admit={r['admit_s'] * 1e3:7.1f} "
              f"round={r['round_s'] * 1e3:7.1f} live={r['live']:2d} "
              f"a={r['a']} t={r['npt']} emitted={r['emitted']} "
              f"fresh={int(r['fresh'])} gap={r['gap_s'] * 1e3:6.1f}",
              flush=True)
    engine.stop()


if __name__ == "__main__":
    main()
