"""Hunt the missing ~4 ms in the b32 8B decode step (VERDICT r2 item 4).

Measured r2: 13.6 ms/step at b32/cap1024 vs ~9 ms roofline (weights 4.5 +
dense KV ~4.6).  A/B on chip:
  1. dense XLA vs forced-ragged attention at b32/cap1024 (the auto gate
     only engages ragged at cap>=2048 — validated at b8, never b32);
  2. step WITHOUT the lm_head logits matmul + sampling (hidden argmax
     proxy) to price the logits+sampling tail;
  3. chunk 32 vs 64 (dispatch amortization).

Run:  python scripts/experiments/expt_decode_b32.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import quantize, qwen, chatts
from chatts_tpu.runtime import kv_cache, sampling


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

    b, cap, chunk = 32, 1024, 32

    def make_step(attn_impl, with_logits=True, chunk_size=chunk):
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
                if with_logits:
                    logits = chatts.compute_logits(params, cfg, hidden)[:, 0]
                    nxt = sampling.sample_per_slot(
                        logits, key,
                        jnp.zeros((b,), jnp.float32),
                        jnp.ones((b,), jnp.float32))
                else:
                    # hidden argmax proxy: prices the decoder without the
                    # 152k-vocab lm_head + sampling tail
                    nxt = jnp.argmax(hidden[:, 0, :vocab % 3584 + 100],
                                     axis=-1).astype(jnp.int32) + 10
                return (caches, nxt, cur_lens + 1, rng), nxt

            (caches, tokens, cur_lens, rng), emitted = jax.lax.scan(
                body, (caches, tokens, cur_lens, rng), None,
                length=chunk_size)
            return caches, tokens, cur_lens, rng, emitted

        return jax.jit(step, donate_argnames=("caches",))  # params = arg 0

    rng0 = jax.random.PRNGKey(0)

    def run(label, attn_impl, with_logits=True, chunk_size=chunk):
        caches = kv_cache.allocate(cfg.llm, b, cap, jnp.bfloat16)
        tokens = jnp.full((b,), 11, jnp.int32)
        cur_lens = jnp.full((b,), 512, jnp.int32)
        step = make_step(attn_impl, with_logits, chunk_size)
        rng = rng0
        caches, tokens, cur_lens, rng, em = step(params, caches, tokens,
                                                 cur_lens, rng)
        _ = np.asarray(em[-1])  # sync
        t1 = time.perf_counter()
        n = 0
        reps = 4
        for _ in range(reps):
            caches, tokens, cur_lens, rng, em = step(
                params, caches, tokens, cur_lens, rng)
            _ = np.asarray(em[-1])
            n += chunk_size
        dt = (time.perf_counter() - t1) / n
        print(f"{label}: {dt * 1e3:.2f} ms/step "
              f"({b / dt:.0f} tok/s)", flush=True)
        del caches

    run("dense  cap1024 chunk32 full", "xla")
    run("ragged cap1024 chunk32 full", "ragged")
    run("dense  cap1024 chunk32 NO-logits", "xla", with_logits=False)
    run("dense  cap1024 chunk64 full", "xla", chunk_size=64)
    run("ragged cap1024 chunk64 full", "ragged", chunk_size=64)


if __name__ == "__main__":
    main()
