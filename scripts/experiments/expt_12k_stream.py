"""12k-context streaming QA served end-to-end (VERDICT r3 item 7 / missing #4).

The reference streams chat at max_model_len 12000 (reference:
chatts/utils/vllm_stream_qa.py:31).  This runs the serving engine at cap
12288 on one v5e chip (8B int4, int8 KV — c8 x 12288 int8 KV = 2.8 GB +
scales beside 5.05 GB weights; bf16 would be 5.6 GB and still fit at c8,
but int8 is the serving configuration) and measures the long-context
envelope end-to-end:

  1. ONE ~10k-token prompt (40 series x 4096 points — the generator's
     long-tail series length, within the 50-series processor limit) on an
     idle engine —
     takes the monolithic flash-attention prefill (the engine's idle-path
     dispatch; the flash kernel is the only prefill that runs at T 10240,
     BENCHMARKS.md dispatch table), then ragged int8 decode at ~10k
     context.  Run TWICE: cold (compiles) and warm; warm TTFT/TPOT are
     the record.
  2. While the long request decodes, a second ~2k prompt admits through
     the scan-sliced mixed path (block-ineligible at this length) —
     long-context serving stays concurrent, not single-user.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/expt_12k_stream.py
Env:  STREAM_TINY=1 CPU smoke shape.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from chatts_tpu.utils import compile_cache


def main():
    tiny = os.environ.get("STREAM_TINY") == "1"
    if tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()

    import jax
    import jax.numpy as jnp

    from chatts_tpu.core import encoding
    from chatts_tpu.core.config import (ChatTSConfig, QwenConfig,
                                        TSEncoderConfig)
    from chatts_tpu.models import quantize
    from chatts_tpu.processor.processor import ChatTSProcessor
    from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine

    vocab = 512 if tiny else 152064
    if tiny:
        llm = QwenConfig(vocab_size=vocab, hidden_size=128,
                         intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         head_dim=32, rope_theta=1e6, attention_bias=True,
                         dtype="float32")
    else:
        llm = QwenConfig(vocab_size=vocab, hidden_size=3584,
                         intermediate_size=18944, num_hidden_layers=28,
                         num_attention_heads=28, num_key_value_heads=4,
                         head_dim=128, rope_theta=1e6, attention_bias=True,
                         dtype="bfloat16")
    cfg = ChatTSConfig(
        llm=llm,
        ts=TSEncoderConfig(patch_size=16, num_layers=2 if tiny else 5,
                           hidden_size=llm.hidden_size,
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
    if tiny:
        from chatts_tpu.models import chatts

        params = quantize.quantize_params(
            chatts.init_params(cfg, jax.random.PRNGKey(0),
                               dtype=jnp.float32), bits=4)
    else:
        params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                                fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    proc = ChatTSProcessor(_Tok(), cfg)
    cap = 1024 if tiny else 12288
    engine = ServeEngine(
        params, cfg, proc,
        max_batch_size=4 if tiny else 8,
        max_model_len=cap,
        cache_dtype=jnp.float32 if tiny else jnp.int8,
        decode_chunk=4 if tiny else 32,
        fuse=False,
        attn_impl="xla" if tiny else "auto",
    )
    engine.start()
    rng = np.random.default_rng(0)

    def long_req(max_tokens):
        # 40 x 4096-pt series = 10,240 patch tokens (+ text/fragments):
        # ~10.4k-token prompt, inside the 50-series per-prompt limit
        # (reference: chatts_vllm.py:220) and the 4096-pt generator tail.
        n_series, slen = (8, 64) if tiny else (40, 4096)
        series = [rng.normal(0, 3, slen).cumsum() for _ in range(n_series)]
        holes = " ".join(encoding.TS_PAIR for _ in series)
        prompt = (f"system: you are a time-series analyst. user: a long "
                  f"monitoring session follows with {n_series} metrics "
                  f"{holes} — summarize regimes, anomalies and correlations.")
        n_tok = proc.count_tokens(prompt, series)
        return Request(prompt, series, SamplingParams(
            max_tokens=max_tokens, temperature=0.2)), n_tok

    def drain(reqs, deadline_s):
        deadline = time.time() + deadline_s
        while any(r.finished_s is None and r.error is None for r in reqs):
            if time.time() > deadline:
                print("TIMEOUT", flush=True)
                for r in reqs:
                    print("  state:", len(r.output_tokens), r.error, flush=True)
                return False
            time.sleep(0.02)
        return True

    # Pass 1: cold (compiles — monolithic long-bucket prefill + decode
    # families at this cap).
    r, n_tok = long_req(32)
    print(f"long prompt: {n_tok} tokens (cap {cap})", flush=True)
    t0 = time.perf_counter()
    engine.submit(r)
    ok = drain([r], 3600 if not tiny else 600)
    print(f"cold pass: {time.perf_counter() - t0:.1f}s ok={ok} "
          f"err={r.error}", flush=True)

    # Pass 2: warm — the measured long-context record.
    out_budget = 16 if tiny else 256
    r2, _ = long_req(out_budget)
    t0 = time.perf_counter()
    engine.submit(r2)
    ok = drain([r2], 600)
    wall = time.perf_counter() - t0
    ttft = r2.ttft_s
    n_out = len(r2.output_tokens)
    tpot = (wall - ttft) / max(n_out - 1, 1) if ttft else float("nan")
    print(f"WARM 12K: prompt {n_tok} tok, TTFT {ttft * 1e3:.0f} ms, "
          f"{n_out} tokens in {wall:.1f}s -> TPOT {tpot * 1e3:.1f} ms "
          f"({1.0 / tpot:.1f} tok/s single-stream)", flush=True)

    # Pass 3 (x2): concurrency at 12k — a second (shorter) request admits
    # while the long one decodes (mixed path; block-ineligible at this
    # length).  Run twice: the first short admission compiles the
    # scan-sliced mixed executable at this cap (~35 s one-time); the
    # second iteration's short TTFT is the warm record.
    for label in ("cold", "warm"):
        r3, n3 = long_req(out_budget)
        short_series = [rng.normal(0, 3, 64 if tiny else 1024).cumsum()
                        for _ in range(2)]
        holes = " ".join(encoding.TS_PAIR for _ in short_series)
        r4 = Request(f"user: quick check of {holes} please.", short_series,
                     SamplingParams(max_tokens=out_budget, temperature=0.2))
        t0 = time.perf_counter()
        engine.submit(r3)
        while not r3.output_tokens and r3.error is None:
            time.sleep(0.01)  # long request is decoding...
        engine.submit(r4)     # ...now admit a short one beside it
        ok = drain([r3, r4], 1200)
        print(f"CONCURRENT[{label}]: long({n3} tok) + short admitted "
              f"mid-decode in {time.perf_counter() - t0:.1f}s ok={ok}; "
              f"short TTFT {r4.ttft_s * 1e3:.0f} ms "
              f"errs=({r3.error}, {r4.error})", flush=True)
    engine.stop()


if __name__ == "__main__":
    main()
