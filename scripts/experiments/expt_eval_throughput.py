"""Batch-evaluation throughput (configs[2] analog) on the modern engine.

The reference evaluates dataset_a with 4xTP2 A100 vLLM replicas at
max_tokens 512 / temperature 0.2 (reference: chatts/utils/
inference_tsmllm_vllm.py:38-46).  This experiment measures the same
envelope on ONE v5e chip at the ChatTS-8B shape (int4 weights, serving
engine with admit-then-decode block rounds + recent-KV decode): synthetic
schema-faithful samples from eval.make_eval_dataset, chat-templated like
eval.inference.run_inference, submitted through continuous batching.

Prints samples/min/chip and aggregate output tok/s.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/expt_eval_throughput.py
Env:  EVAL_N (default 48), EVAL_TINY=1 for the CPU smoke shape.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.eval.inference import CHAT_TEMPLATE
from chatts_tpu.eval.make_eval_dataset import build_dataset
from chatts_tpu.models import quantize
from chatts_tpu.processor.processor import ChatTSProcessor
from chatts_tpu.serve.scheduler import Request, SamplingParams, ServeEngine
from chatts_tpu.utils import compile_cache


def main():
    tiny = os.environ.get("EVAL_TINY") == "1"
    if tiny:
        # Platform BEFORE enable(): the cache dir is keyed by platform.
        jax.config.update("jax_platforms", "cpu")
    compile_cache.enable()
    n_samples = int(os.environ.get("EVAL_N", "48"))
    vocab = 512 if tiny else 152064
    if tiny:
        cfg = ChatTSConfig(
            llm=QwenConfig(vocab_size=vocab, hidden_size=128,
                           intermediate_size=256, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           head_dim=32, rope_theta=1e6, attention_bias=True,
                           dtype="float32"),
            ts=TSEncoderConfig(patch_size=16, num_layers=2, hidden_size=128,
                               max_sequence_length=4096),
            ts_token_start_index=vocab - 10,
        )
    else:
        cfg = ChatTSConfig(
            llm=QwenConfig(vocab_size=vocab, hidden_size=3584,
                           intermediate_size=18944, num_hidden_layers=28,
                           num_attention_heads=28, num_key_value_heads=4,
                           head_dim=128, rope_theta=1e6, attention_bias=True,
                           dtype="bfloat16"),
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
    # Reference eval envelope: max_tokens 512, temperature 0.2.  Cap 1536
    # covers eval prompts (~200-700 tokens) + 512 outputs; bf16 KV at c32
    # = 2.8 GB beside 5 GB of weights.
    engine = ServeEngine(
        params, cfg, proc, max_batch_size=16 if tiny else 32,
        max_model_len=512 if tiny else 1536,
        cache_dtype=jnp.float32 if tiny else jnp.bfloat16,
        decode_chunk=32, fuse=False,
        attn_impl="xla" if tiny else "auto",
    )
    samples = build_dataset(n_samples, seed=7)
    reqs = []
    for s in samples:
        prompt = CHAT_TEMPLATE.format(prompt=s["question"])
        series = [np.asarray(t) for t in (s.get("timeseries") or [])]
        reqs.append(Request(prompt, series, SamplingParams(
            max_tokens=64 if tiny else 512, temperature=0.2)))

    t0 = time.perf_counter()
    engine.warmup(prefill_buckets=(256, 512) if not tiny else (128,),
                  series_per_request=2, series_len=256)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for r in reqs:
        engine.submit(r)
    deadline = time.time() + (600 if tiny else 3000)
    while any(r.finished_s is None and r.error is None for r in reqs):
        if time.time() > deadline:
            print("TIMEOUT", flush=True)
            break
        time.sleep(0.05)
    wall = time.perf_counter() - t0
    done = sum(1 for r in reqs if r.finished_s is not None)
    toks = sum(len(r.output_tokens) for r in reqs)
    errs = [r.error for r in reqs if r.error]
    print(f"eval throughput: {done} samples in {wall:.1f}s -> "
          f"{done / wall * 60:.1f} samples/min/chip, "
          f"{toks / wall:.0f} output tok/s (max_tokens 512, temp 0.2); "
          f"errors={len(errs)}{' first=' + errs[0][:120] if errs else ''}",
          flush=True)
    engine.stop()


if __name__ == "__main__":
    main()
