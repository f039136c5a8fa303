"""A/B the int8-activation prefill path on the real chip (VERDICT r2 item 2).

Measures the full 28-layer 8B-shape forward at prefill shapes with
act_int8 off/on, with a real data fetch (per-op microtimings are
dispatch-dominated on this tunnel), and checks logits agreement.

Run:  python scripts/experiments/expt_a8_prefill.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import ChatTSConfig, QwenConfig, TSEncoderConfig
from chatts_tpu.models import quantize, qwen


def main():
    vocab = 152064
    cfg = QwenConfig(
        vocab_size=vocab, hidden_size=3584, intermediate_size=18944,
        num_hidden_layers=28, num_attention_heads=28,
        num_key_value_heads=4, head_dim=128, rope_theta=1e6,
        attention_bias=True, dtype="bfloat16",
    )
    full = ChatTSConfig(
        llm=cfg,
        ts=TSEncoderConfig(patch_size=16, num_layers=5, hidden_size=3584,
                           max_sequence_length=4096),
        ts_token_start_index=vocab - 10,
    )
    t0 = time.perf_counter()
    params = quantize.init_quantized_params(full, jax.random.PRNGKey(0),
                                            fused=True, bits=4)
    params = jax.block_until_ready(params)
    print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)
    llm = params["llm"]

    # params passed as ARGUMENTS (a closure would bake 3.5 GB of weights
    # into the executable as captured constants).
    @functools.partial(jax.jit, static_argnames=("act_int8",))
    def fwd(llm, emb, pos, act_int8):
        h, _ = qwen.forward(llm, cfg, emb, pos, attn_impl="auto",
                            act_int8=act_int8)
        return h

    def fwd_a8(emb, pos):
        return fwd(llm, emb, pos, True)

    def fwd_bf(emb, pos):
        return fwd(llm, emb, pos, False)

    for b, t in ((1, 640), (2, 640), (8, 640), (32, 512)):
        key = jax.random.PRNGKey(b * 1000 + t)
        emb = (jax.random.normal(key, (b, t, cfg.hidden_size))
               * 0.02).astype(jnp.bfloat16)
        pos = jnp.tile(jnp.arange(t, dtype=jnp.int32)[None], (b, 1))
        for name, fn in (("bf16", fwd_bf), ("a8", fwd_a8)):
            try:
                out = fn(emb, pos)
                v = float(jnp.asarray(out[0, -1, 0]))  # force fetch
                t1 = time.perf_counter()
                reps = 3
                for _ in range(reps):
                    out = fn(emb, pos)
                    v = float(jnp.asarray(out[0, -1, 0]))
                dt = (time.perf_counter() - t1) / reps
                print(f"B{b} T{t} {name}: {dt * 1e3:.1f} ms", flush=True)
            except Exception as err:
                print(f"B{b} T{t} {name}: FAILED {type(err).__name__}: "
                      f"{str(err)[:300]}", flush=True)
        # agreement
        try:
            h_ref = np.asarray(fwd_bf(emb, pos), np.float32)
            h_a8 = np.asarray(fwd_a8(emb, pos), np.float32)
            rel = np.linalg.norm(h_a8 - h_ref) / np.linalg.norm(h_ref)
            print(f"B{b} T{t} rel-err: {rel:.4f}", flush=True)
        except Exception as err:
            print(f"B{b} T{t} agreement: FAILED {err}", flush=True)


if __name__ == "__main__":
    main()
