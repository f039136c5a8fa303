"""Decompose the block-admission round cost (r3).

Times, on the 8B int4 shape at b32/cap1024:
  1. the decode scan alone (chunk 32),
  2. the full block round (scan + (A,512) prompt block + span scatter +
     first-token sampling),
  3. the prompt block forward alone (no scan, no scatter),
  4. the block round with the span scatters REPLACED by a no-op select
     (isolates scatter cost).

Run:  python scripts/experiments/expt_block_decomp.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import quantize, qwen, chatts
from chatts_tpu.runtime import kv_cache, sampling
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

    b, cap, chunk, a, t = 32, 1024, 32, 8, 512
    hdim = qcfg.hidden_size
    eos = jnp.asarray([-1], jnp.int32)

    def fresh_state():
        caches = kv_cache.allocate(qcfg, b, cap, jnp.bfloat16)
        tokens = jnp.full((b,), 11, jnp.int32)
        cur_lens = jnp.full((b,), 512, jnp.int32)
        active = jnp.ones((b,), bool)
        temp = jnp.zeros((b,), jnp.float32)
        topp = jnp.ones((b,), jnp.float32)
        budget = jnp.full((b,), 500, jnp.int32)
        return caches, tokens, cur_lens, active, temp, topp, budget

    emb = (jax.random.normal(jax.random.PRNGKey(2), (a, t, hdim))
           * 0.02).astype(jnp.bfloat16)
    wr = jnp.arange(a, dtype=jnp.int32)
    seq = jnp.full((a,), t - 3, jnp.int32)
    atemp = jnp.zeros((a,), jnp.float32)
    atopp = jnp.ones((a,), jnp.float32)

    scan_jit = jax.jit(
        sched._decode_scan,
        static_argnames=("cfg", "attn_impl", "chunk_size", "mesh"),
        donate_argnames=("caches",),
    )
    block_jit = jax.jit(
        sched._block_admission_round,
        static_argnames=("cfg", "attn_impl", "act_int8", "chunk_size",
                         "mesh"),
        donate_argnames=("caches",),
    )

    def prompt_block_only(params, emb):
        positions = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (a, 1))
        kv_valid = positions < seq[:, None]
        small = [
            (jnp.zeros((a, qcfg.num_key_value_heads, t, qcfg.head_dim),
                       jnp.bfloat16),
             jnp.zeros((a, qcfg.num_key_value_heads, t, qcfg.head_dim),
                       jnp.bfloat16))
            for _ in range(qcfg.num_hidden_layers)
        ]
        hidden, small = qwen.forward(
            params["llm"], qcfg, emb, positions, kv_caches=small,
            write_pos=None, kv_valid=kv_valid, kv_positions=positions,
            attn_impl="auto",
        )
        return hidden, small

    pb_jit = jax.jit(prompt_block_only)

    def run(label, fn, n=4):
        out = fn()
        t1 = time.perf_counter()
        for _ in range(n):
            out = fn()
        dt = (time.perf_counter() - t1) / n
        print(f"{label}: {dt * 1e3:.1f} ms", flush=True)

    # 1. scan alone
    st = [fresh_state()]

    def scan_once():
        caches, tokens, cur_lens, active, temp, topp, budget = st[0]
        caches, tokens, cur_lens, budget, rng, em, live = scan_jit(
            params, cfg, "auto", chunk, caches, tokens, cur_lens, active,
            temp, topp, eos, budget, jax.random.PRNGKey(0))
        st[0] = (caches, tokens, cur_lens, active, temp, topp, budget)
        return float(jnp.asarray(em[-1][0]))

    run("decode scan alone (b32 chunk32)", scan_once)

    # 2. full block round
    st2 = [fresh_state()]

    abudget = jnp.full((a,), 400, jnp.int32)

    def block_once():
        caches, tokens, cur_lens, active, temp, topp, budget = st2[0]
        (caches, tokens, cur_lens, budget, temp, topp, rng,
         packed) = block_jit(
            params, cfg, "auto", False, chunk, caches, tokens, cur_lens,
            active, temp, topp, eos, budget, wr, emb, seq, atemp, atopp,
            abudget, jax.random.PRNGKey(0))
        st2[0] = (caches, tokens, cur_lens, active, temp, topp, budget)
        return float(jnp.asarray(packed[0, 0]))

    run("full block round (scan + (8,512) block)", block_once)

    # 3. prompt block forward alone
    def pb_once():
        hidden, _ = pb_jit(params, emb)
        return float(jnp.asarray(hidden[0, 0, 0]))

    run("prompt block forward alone (8,512)", pb_once)


if __name__ == "__main__":
    main()
