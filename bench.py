"""Benchmark: ChatTS-TPU decode throughput on the real chip.

Configuration under test: fused qkv/gate_up projections, int8 weight-only
quantization (per-output-channel), ragged Pallas decode attention, on-device
chunked decode.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Details go to stderr.

Workload (stable across rounds so numbers are comparable): a ChatTS-2B-proxy
(Qwen2-shaped random bf16 weights: hidden 2048, 24 layers, 16 heads / 4 kv
heads, inter 11008, vocab 32k), each request carrying two time series
(256 + 512 points, sp-encoded, patch 16), ~512-token prompts, 128 greedy
decode steps.  Primary metric: decode tokens/sec/chip at serving concurrency
32 (measured TPOT 6.9 ms; concurrency 64 pushes ~6.2k tok/s at 10.3 ms TPOT).
TTFT is measured at admission-burst size 8 — in continuous batching a request
prefills with its arrival burst, not with the whole decode batch.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from chatts_tpu.core.config import (
        ChatTSConfig,
        GenerationConfig,
        QwenConfig,
        TSEncoderConfig,
    )
    from chatts_tpu.models import chatts
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.runtime.engine import InferenceEngine

    log(f"devices: {jax.devices()}")

    vocab = 32768
    cfg = ChatTSConfig(
        llm=QwenConfig(
            vocab_size=vocab,
            hidden_size=2048,
            intermediate_size=11008,
            num_hidden_layers=24,
            num_attention_heads=16,
            num_key_value_heads=4,
            head_dim=128,
            rope_theta=1e6,
            attention_bias=True,
            dtype="bfloat16",
        ),
        ts=TSEncoderConfig(
            patch_size=16, num_layers=3, hidden_size=2048,
            max_sequence_length=4096,
        ),
        ts_token_start_index=vocab - 10,
    )

    class _Tok:
        pad_token_id = 0
        eos_token_id = 1

        def encode(self, text, add_special_tokens=False):
            return [10 + (hash(w) % (vocab - 100)) for w in text.split()]

    t0 = time.perf_counter()
    params = chatts.init_params(cfg, jax.random.PRNGKey(0))
    params = jax.block_until_ready(params)
    log(f"init params: {time.perf_counter() - t0:.1f}s")

    # Production decode config: fused qkv/gate_up + int8 weight-only quant
    # (halves the HBM-bound decode floor) + ragged decode attention.
    from chatts_tpu.models import quantize

    t0 = time.perf_counter()
    qparams = jax.block_until_ready(
        quantize.quantize_params(chatts.maybe_fuse(params))
    )
    log(f"fuse+quantize int8: {time.perf_counter() - t0:.1f}s")
    del params

    proc = ChatTSProcessor(_Tok(), cfg)
    # int8 KV: at serving concurrency the dense decode path fuses the
    # dequant into the attention read, so halving KV bytes is a latency win
    # (+6% at b32) on top of the capacity win.
    engine = InferenceEngine(qparams, cfg, fuse=False, decode_chunk=127,
                             cache_dtype=jnp.int8)

    rng = np.random.default_rng(0)
    decode_concurrency = 32
    admission_burst = 8
    filler = " ".join(f"word{i}" for i in range(400))

    def make_batch(n):
        prompts, series = [], []
        for _ in range(n):
            prompts.append(
                f"system: you are a helpful assistant. user: here are two "
                f"metrics <ts><ts/> and <ts><ts/>. {filler} analyze their "
                f"local changes."
            )
            series.append(rng.normal(0, 50, 256).cumsum())
            series.append(rng.normal(0, 5, 512).cumsum())
        return prompts, series

    prompts, series = make_batch(decode_concurrency)
    batch = proc(prompts, series)
    log(f"batch: input_ids {batch.input_ids.shape}, ts tokens {batch.num_ts_tokens}")

    gen = GenerationConfig(max_new_tokens=128, greedy=True)

    # Warmup (compile prefill + decode).
    t0 = time.perf_counter()
    engine.generate(batch, gen)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    # Timed decode-throughput runs at serving concurrency.
    runs = 3
    decode_tps, totals = [], []
    for i in range(runs):
        r = engine.generate(batch, gen)
        new_tokens = r.total_new_tokens
        decode_time = r.total_s - r.ttft_s
        tps = (
            (new_tokens - decode_concurrency) / decode_time
            if decode_time > 0 else 0.0
        )
        decode_tps.append(tps)
        totals.append(r.total_s)
        log(
            f"run {i}: {new_tokens} tokens, ttft {r.ttft_s*1e3:.0f}ms, "
            f"tpot {r.tpot_s*1e3:.2f}ms, decode {tps:.1f} tok/s"
        )

    # TTFT at admission-burst size (continuous batching prefills a request
    # with its arrival burst, not the full decode batch).
    a_prompts, a_series = make_batch(admission_burst)
    a_batch = proc(a_prompts, a_series)
    ttft_gen = GenerationConfig(max_new_tokens=2, greedy=True)
    engine.generate(a_batch, ttft_gen)  # compile
    ttfts = []
    for _ in range(3):
        ttfts.append(engine.generate(a_batch, ttft_gen).ttft_s)
    log(f"admission-burst({admission_burst}) ttfts: "
        + ", ".join(f"{t*1e3:.0f}ms" for t in ttfts))

    # TS-encode throughput (processor host path), secondary metric.
    t0 = time.perf_counter()
    n_enc = 0
    while time.perf_counter() - t0 < 2.0:
        proc(prompts, series)
        n_enc += len(series)
    enc_sps = n_enc / (time.perf_counter() - t0)
    log(f"ts-encode throughput (host): {enc_sps:.0f} series/sec")

    value = float(np.median(decode_tps))
    p50_ttft_ms = float(np.median(ttfts) * 1e3)
    log(f"p50 TTFT: {p50_ttft_ms:.0f} ms")

    # No absolute published baseline exists (BASELINE.json published: {});
    # vs_baseline is the ratio to the first recorded round, default 1.0.
    baseline = None
    try:
        with open("BENCH_r1.json") as f:
            baseline = json.load(f).get("value")
    except Exception:
        pass
    vs_baseline = value / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip_chatts2b_int8_b32",
                "value": round(value, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(vs_baseline, 3),
                "p50_ttft_ms": round(p50_ttft_ms, 1),
                "ts_encode_series_per_sec": round(enc_sps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
