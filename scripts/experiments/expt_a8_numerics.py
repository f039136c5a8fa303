"""a8 (int8-activation prefill) numerics on STRUCTURED weights (VERDICT r3
weak #4): the r3 gate was a 90% first-greedy-token agreement on a tiny
random model; this experiment grades the recipe on HF-initialized Qwen2
weights (transformers' init: scaled-normal projections, proper layernorm
gains — the closest available stand-in for real checkpoints in a zero-egress
environment) across batch 1..32, reporting

  - greedy first-token agreement (per-row, vs the weight-only path)
  - top-5 logit-set overlap at the last position
  - final-logit relative L2 error

for BOTH quantized weight layouts that can carry int8 activations:
  w8a8 (per-channel int8 weights) and w4a8 (Pallas int4 kernel, interpret
  mode on CPU).

Run: python scripts/experiments/expt_a8_numerics.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np


def build_hf(seed=0, hidden=256, layers=4, heads=8, kv=2, inter=512,
             vocab=512):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from chatts_tpu.core.config import QwenConfig

    torch.manual_seed(seed)
    hf_cfg = Qwen2Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, max_position_embeddings=2048,
        rope_theta=1e4, tie_word_embeddings=False, use_sliding_window=False,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = QwenConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, head_dim=hidden // heads, rope_theta=1e4,
        attention_bias=True, qk_norm=False, dtype="float32",
    )
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, cfg


def grade(params, cfg, bits, batch_sizes=(1, 2, 4, 8, 16, 32), t=48,
          interpret=False):
    from chatts_tpu.models import qwen
    from chatts_tpu.ops import int4_matmul as i4

    ctx = i4.force_interpret() if interpret and hasattr(i4, "force_interpret") \
        else None
    rng = np.random.default_rng(0)
    rows = []
    for b in batch_sizes:
        ids = rng.integers(0, cfg.vocab_size, size=(b, t))
        pos = np.tile(np.arange(t), (b, 1))
        emb = qwen.embed_tokens(params, jnp.asarray(ids))
        h_ref, _ = qwen.forward(params, cfg, emb, jnp.asarray(pos),
                                attn_impl="xla")
        h_a8, _ = qwen.forward(params, cfg, emb, jnp.asarray(pos),
                               attn_impl="xla", act_int8=True)
        lg_ref = np.asarray(
            qwen.compute_logits(params, cfg, h_ref[:, -1:, :]))[:, 0]
        lg_a8 = np.asarray(
            qwen.compute_logits(params, cfg, h_a8[:, -1:, :]))[:, 0]
        agree = float(np.mean(lg_ref.argmax(-1) == lg_a8.argmax(-1)))
        top5_ref = np.argsort(-lg_ref, axis=-1)[:, :5]
        top5_a8 = np.argsort(-lg_a8, axis=-1)[:, :5]
        overlap = float(np.mean([
            len(set(top5_ref[i]) & set(top5_a8[i])) / 5.0 for i in range(b)
        ]))
        rel = float(np.linalg.norm(lg_a8 - lg_ref)
                    / np.linalg.norm(lg_ref))
        rows.append((b, agree, overlap, rel))
    if ctx is not None:
        ctx.__exit__(None, None, None)
    return rows


def main():
    from chatts_tpu.models import quantize, qwen

    sd, cfg = build_hf()
    params = qwen.load_torch_state_dict(sd, cfg, dtype=jnp.float32)
    print("HF-initialized Qwen2: hidden 256, 4L, 8H/2KV, vocab 512, t=48")
    for bits in (8, 4):
        q = quantize.quantize_llm(params, bits=bits)
        name = f"w{bits}a8"
        print(f"\n{name} (vs w{bits} weight-only, same quantized weights):")
        print(f"{'batch':>6} {'first-tok agree':>16} {'top5 overlap':>13} "
              f"{'logit rel-err':>14}")
        interpret = bits == 4
        if interpret:
            from chatts_tpu.ops import int4_matmul as i4

            if not hasattr(i4, "force_interpret"):
                # CPU path: enable pallas interpret via env knob if present
                import os

                os.environ["CHATTS_INT4_INTERPRET"] = "1"
        for b, agree, overlap, rel in grade(q, cfg, bits,
                                            interpret=interpret):
            print(f"{b:>6} {agree:>16.3f} {overlap:>13.3f} {rel:>14.4f}")


if __name__ == "__main__":
    main()
