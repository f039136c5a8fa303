"""A/B the serving decode scan: recent-KV mode vs per-step element scatter.

Per-(row, head, pos) element scatters into the big KV cache serialize at
~0.16 us each on v5e (BENCHMARKS.md "Serving-round anatomy") — a b32 8B
step pays ~1.1 ms across 28 layers.  Recent-KV mode writes each step's K/V
into a chunk-local (B, KVH, chunk, D) buffer at a uniform step index (one
dynamic_update_slice), runs two-piece attention over cache + recent, and
merges the buffers back once per chunk as span windows.

This script times `scheduler._decode_scan` (the real serving scan, incl.
per-slot sampling and EOS/budget bookkeeping) both ways at the bench
configuration: 8B int4, b32, cap 1024, chunk 32 and 64.

Run:  python scripts/experiments/expt_recent_kv.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import quantize
from chatts_tpu.runtime import kv_cache
from chatts_tpu.serve import scheduler as sched


def main():
    vocab = 152064
    qcfg = QwenConfig(
        vocab_size=vocab, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28,
        num_key_value_heads=4, head_dim=128, rope_theta=1e6,
        attention_bias=True, dtype="bfloat16",
    )
    cfg = ChatTSConfig(
        llm=qcfg,
        ts=TSEncoderConfig(patch_size=16, num_layers=5, hidden_size=3584,
                           max_sequence_length=4096),
        ts_token_start_index=vocab - 10,
    )
    t0 = time.perf_counter()
    params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                            fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    b, cap = 32, 1024
    eos = jnp.full((4,), -1, jnp.int32)  # no EOS hits: full-chunk work

    def make_step(recent, chunk_size, cache_dtype=jnp.bfloat16):
        def step(params, caches, tokens, cur_lens, budget, rng):
            active = jnp.ones((b,), bool)
            temp = jnp.zeros((b,), jnp.float32)
            topp = jnp.ones((b,), jnp.float32)
            caches, tokens, cur_lens, budget, rng, emitted, live = (
                sched._decode_scan(
                    params, cfg, "xla", chunk_size, caches, tokens,
                    cur_lens, active, temp, topp, eos, budget, rng))
            return caches, tokens, cur_lens, budget, rng, emitted

        return jax.jit(step, donate_argnames=("caches",))

    rng0 = jax.random.PRNGKey(0)

    def run(label, recent, chunk_size, cache_dtype=jnp.bfloat16):
        orig = sched._recent_mode_ok
        sched._recent_mode_ok = lambda *a: recent
        try:
            caches = kv_cache.allocate(cfg.llm, b, cap, cache_dtype)
            tokens = jnp.full((b,), 11, jnp.int32)
            cur_lens = jnp.full((b,), 512, jnp.int32)
            budget = jnp.full((b,), 10_000, jnp.int32)
            step = make_step(recent, chunk_size, cache_dtype)
            rng = rng0
            caches, tokens, cur_lens, budget, rng, em = step(
                params, caches, tokens, cur_lens, budget, rng)
            _ = np.asarray(em[-1])  # sync through the tunnel
            t1 = time.perf_counter()
            n = 0
            for _ in range(4):
                caches, tokens, cur_lens, budget, rng, em = step(
                    params, caches, tokens, cur_lens, budget, rng)
                _ = np.asarray(em[-1])
                n += chunk_size
            dt = (time.perf_counter() - t1) / n
            print(f"{label}: {dt * 1e3:.2f} ms/step ({b / dt:.0f} tok/s)",
                  flush=True)
            del caches
        finally:
            sched._recent_mode_ok = orig

    for chunk in (32, 64):
        run(f"scatter bf16kv chunk{chunk}", False, chunk)
        run(f"recent  bf16kv chunk{chunk}", True, chunk)
    run("scatter int8kv chunk32", False, 32, jnp.int8)
    run("recent  int8kv chunk32", True, 32, jnp.int8)


if __name__ == "__main__":
    main()
