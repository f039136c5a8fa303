"""A/B the mixed-round prompt attention dispatch (VERDICT r2 item 7).

The fused mixed prefill+decode step's prompt phase runs an (A, npt,
kv_limit) masked attention per layer per scan step; r2 hard-forced XLA
einsum without measurement.  This times one full mixed round (28-layer 8B
shape, B=32 decode + a x npt prompt) with CHATTS_MIXED_PROMPT_ATTN=xla vs
=flash at kv_limit in {512, 1024, 4096}.

Run each arm in a FRESH process (the env var is read at trace time):
  CHATTS_MIXED_PROMPT_ATTN=xla   python scripts/experiments/expt_mixed_attn.py
  CHATTS_MIXED_PROMPT_ATTN=flash python scripts/experiments/expt_mixed_attn.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import quantize, qwen
from chatts_tpu.runtime import kv_cache


def main():
    impl = os.environ.get("CHATTS_MIXED_PROMPT_ATTN", "xla")
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
    print(f"init: {time.perf_counter() - t0:.1f}s  impl={impl}", flush=True)
    llm = params["llm"]
    b, a, npt, chunk = 32, 8, 64, 4  # chunk small: isolates per-step cost

    for cap in (512, 1024, 2048):
        caches = kv_cache.allocate(cfg.llm, b, cap, jnp.bfloat16)
        hdim = cfg.llm.hidden_size
        kv_positions = jnp.tile(jnp.arange(cap, dtype=jnp.int32)[None], (b, 1))
        dec_kv_valid = kv_positions <= 256
        dec_kv_lengths = jnp.full((b,), 257, jnp.int32)
        write_rows = jnp.concatenate([
            jnp.arange(b, dtype=jnp.int32),
            jnp.repeat(jnp.arange(a, dtype=jnp.int32), npt),
        ])
        adm_slots = jnp.arange(a, dtype=jnp.int32)
        adm_seq_lens = jnp.full((a,), min(cap - 8, a * npt), jnp.int32)

        @functools.partial(jax.jit, donate_argnames=('caches',))
        def round_fn(llm, caches, x_pack, positions):
            h, caches = qwen.forward_mixed(
                llm, cfg.llm, x_pack, positions, b=b, a=a, npt=npt,
                write_rows=write_rows, adm_slots=adm_slots,
                adm_seq_lens=adm_seq_lens, kv_caches=caches,
                dec_kv_valid=dec_kv_valid, kv_positions=kv_positions,
                dec_kv_lengths=dec_kv_lengths, kv_limit=cap,
                attn_impl="auto",
            )
            return h, caches

        tp = b + a * npt
        x = (jax.random.normal(jax.random.PRNGKey(1), (1, tp, hdim))
             * 0.02).astype(jnp.bfloat16)
        pos = jnp.concatenate([
            jnp.full((b,), 256, jnp.int32),
            jnp.tile(jnp.arange(npt, dtype=jnp.int32) + 128, a),
        ])[None]
        h, caches = round_fn(llm, caches, x, pos)
        _ = float(jnp.asarray(h[0, 0, 0]))
        t1 = time.perf_counter()
        reps = 6
        for _ in range(reps):
            h, caches = round_fn(llm, caches, x, pos)
            _ = float(jnp.asarray(h[0, 0, 0]))
        dt = (time.perf_counter() - t1) / reps
        print(f"kv_limit={cap} impl={impl}: {dt * 1e3:.1f} ms per mixed "
              f"step (B{b} + {a}x{npt} prompt)", flush=True)
        del caches


if __name__ == "__main__":
    main()
