"""Decode A/B at the reference serving envelope capacity (cap 6144).

The reference serves max_model_len 6000 (reference:
scripts/start_vllm_server.sh:6).  On a 16 GB v5e the 8B int4 weights
(5.05 GB) leave ~11 GB: bf16 KV at cap 6144 costs 352 MB/slot (c16 max),
int8 KV costs 176 MB/slot + scales (c32 fits) — so the envelope's
concurrency hinges on whether the int8 ragged read is competitive.

r3 measured int8 ragged SLOWER than bf16 (2.2 vs 1.6 ms TPOT on a
12-layer model) with the in-kernel dequant multiplying every (BLOCK, D)
tile; the kernel now factors per-token scales out of the d-contraction
(ops/ragged_decode_attention.py::_kernel_int8).  This re-measures the
full 8B-shape engine-style decode scan (real token fetch, chunk 32) at
cap 6144:

  A. b16 bf16 KV  (ragged auto)   — the r3-style baseline
  B. b16 int8 KV  (ragged auto)   — same batch, post-fix kernel
  C. b32 int8 KV  (ragged auto)   — the capacity play bf16 cannot board

Context mix: per-slot lengths staggered 1024..5888 (serving-like ragged
read; the kernel's bandwidth scales with actual context).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/experiments/expt_cap6144.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import chatts, quantize, qwen
from chatts_tpu.runtime import kv_cache, sampling
from chatts_tpu.utils import compile_cache


def main():
    compile_cache.enable()
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
    t0 = time.perf_counter()
    params = quantize.init_quantized_params(cfg, jax.random.PRNGKey(0),
                                            fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

    cap, chunk = 6144, 32

    def make_step(b, attn_impl):
        def step(params, caches, tokens, cur_lens, rng):
            kv_positions = jnp.tile(
                jnp.arange(cap, dtype=jnp.int32)[None], (b, 1))

            def body(carry, _):
                caches, tokens, cur_lens, rng = carry
                rng, key = jax.random.split(rng)
                positions = cur_lens[:, None].astype(jnp.int32)
                embeds = qwen.embed_tokens(params["llm"], tokens[:, None])
                kv_valid = kv_positions <= cur_lens[:, None]
                kv_lengths = (cur_lens + 1).astype(jnp.int32)
                hidden, caches = qwen.forward(
                    params["llm"], cfg.llm, embeds, positions,
                    kv_caches=caches, write_pos=positions,
                    kv_valid=kv_valid, kv_positions=kv_positions,
                    attn_impl=attn_impl, kv_lengths=kv_lengths,
                )
                logits = chatts.compute_logits(params, cfg, hidden)[:, 0]
                nxt = sampling.sample_per_slot(
                    logits, key,
                    jnp.zeros((b,), jnp.float32),
                    jnp.ones((b,), jnp.float32))
                return (caches, nxt, cur_lens + 1, rng), nxt

            (caches, tokens, cur_lens, rng), emitted = jax.lax.scan(
                body, (caches, tokens, cur_lens, rng), None, length=chunk)
            return caches, tokens, cur_lens, rng, emitted

        return jax.jit(step, donate_argnames=("caches",))

    rng0 = jax.random.PRNGKey(0)

    def run(label, b, dtype, attn_impl="auto", reps=4):
        caches = kv_cache.allocate(cfg.llm, b, cap, dtype)
        tokens = jnp.full((b,), 11, jnp.int32)
        # Serving-like ragged mix: slots spread across 1024..5888 context.
        lens = np.linspace(1024, 5888, b).astype(np.int32)
        cur_lens = jnp.asarray(lens)
        step = make_step(b, attn_impl)
        rng = rng0
        caches, tokens, cur_lens, rng, em = step(params, caches, tokens,
                                                 cur_lens, rng)
        _ = np.asarray(em[-1])  # compile + sync
        t1 = time.perf_counter()
        n = 0
        for _ in range(reps):
            caches, tokens, cur_lens, rng, em = step(
                params, caches, tokens, cur_lens, rng)
            _ = np.asarray(em[-1])
            n += chunk
        dt = (time.perf_counter() - t1) / n
        print(f"{label}: {dt * 1e3:.2f} ms/step ({b / dt:.0f} tok/s)",
              flush=True)
        del caches

    run("A b16 bf16-KV ragged cap6144", 16, jnp.bfloat16)
    run("B b16 int8-KV ragged cap6144", 16, jnp.int8)
    run("C b32 int8-KV ragged cap6144", 32, jnp.int8)


if __name__ == "__main__":
    main()
