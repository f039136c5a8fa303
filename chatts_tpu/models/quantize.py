"""Weight-only int8 / int4 quantization for decode throughput and memory.

Parity role: the reference ships GPTQ-Int4 checkpoint variants
(reference: README.md:260-263) and relies on vLLM's quant kernels; here
both tiers are first-party.  Decode is HBM-bound — halving weight bytes
roughly halves the per-token floor — int8 lets ChatTS-8B fit a single
16 GB v5e chip; int4 halves the floor again and is the GPTQ-Int4 serving
analog.

int8 layout: ``kernel_q`` (in, out) int8 + ``scales`` (out,) float32 with
``W ≈ kernel_q * scales``; the matmul runs ``dot(x, kernel_q.astype(bf16))
* scales`` — XLA fuses the int8->bf16 convert into the dot's HBM read.
Per-output-channel scaling applied after the matmul is mathematically exact.

int4 layout: ``kernel_q4`` (in//2, out) int8 with logical rows (2i, 2i+1)
nibble-packed per byte + ``scales4`` (in//G, out) float32 group scales
(G=128, the GPTQ choice — int4 needs group-wise scales for accuracy).
XLA does NOT fuse nibble-unpacking, so the matmul is the first-party
Pallas kernel :mod:`chatts_tpu.ops.int4_matmul`, which feeds the MXU's
native int4 operand ingest (no unpack work at all).
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

QUANT_TARGETS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "qkv_proj",
    "gate_proj", "up_proj", "down_proj",
    "gate_up_proj",
)


def quantize_dense(layer: Dict[str, Any]) -> Dict[str, Any]:
    """{'kernel': (in, out)} -> {'kernel_q': int8, 'scales': f32 (out,)}.

    Runs on device (jnp) — no host round trip, so quantizing a multi-GB
    model takes milliseconds, not minutes over a device tunnel.
    """
    kernel = jnp.asarray(layer["kernel"]).astype(jnp.float32)
    scales = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    scales = jnp.where(scales == 0, 1.0, scales)
    q = jnp.clip(jnp.round(kernel / scales), -127, 127).astype(jnp.int8)
    out: Dict[str, Any] = {"kernel_q": q, "scales": scales}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def dequantize_dense(layer: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    kernel = (
        jnp.asarray(layer["kernel_q"], jnp.float32) * layer["scales"][None, :]
    ).astype(dtype)
    out = {"kernel": kernel}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def quantize_dense_int4(
    layer: Dict[str, Any], group_size: int = 128
) -> Dict[str, Any]:
    """{'kernel': (in, out)} -> {'kernel_q4': int8 packed, 'scales4': f32}.

    Falls back to int8 when the shape doesn't tile for the Pallas kernel
    (out not a multiple of 256, or in not a multiple of the group)."""
    from chatts_tpu.ops import int4_matmul as i4

    kernel = jnp.asarray(layer["kernel"])
    in_dim, out_dim = kernel.shape
    if not i4.supported(in_dim, out_dim, group_size):
        return quantize_dense(layer)
    packed, scales = i4.pack_int4(kernel.astype(jnp.float32), group_size)
    out: Dict[str, Any] = {"kernel_q4": packed, "scales4": scales}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def dequantize_dense_int4(layer: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    from chatts_tpu.ops import int4_matmul as i4

    out = {"kernel": i4.dequantize(layer["kernel_q4"], layer["scales4"], dtype)}
    if "bias" in layer:
        out["bias"] = layer["bias"]
    return out


def quantize_llm(
    llm_params: Dict[str, Any], quantize_lm_head: bool = True, bits: int = 8
) -> Dict[str, Any]:
    """Quantize all decoder projection layers (norms, embeddings, and the TS
    encoder stay full precision).  bits=8 -> per-channel int8; bits=4 ->
    nibble-packed group-scaled int4 (Pallas matmul)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    qfn = quantize_dense_int4 if bits == 4 else quantize_dense
    new_layers = []
    for layer in llm_params["layers"]:
        new_layer = dict(layer)
        for group_name in ("self_attn", "mlp"):
            group = dict(new_layer[group_name])
            for mod, sub in list(group.items()):
                if mod in QUANT_TARGETS and isinstance(sub, dict) and "kernel" in sub:
                    group[mod] = qfn(sub)
            new_layer[group_name] = group
        new_layers.append(new_layer)
    out = dict(llm_params)
    out["layers"] = new_layers
    if quantize_lm_head and "lm_head" in out:
        out["lm_head_q"] = qfn({"kernel": out.pop("lm_head")})
    return out


def quantize_params(
    params: Dict[str, Any], quantize_lm_head: bool = True, bits: int = 8
) -> Dict[str, Any]:
    return {
        "ts_encoder": params["ts_encoder"],
        "llm": quantize_llm(params["llm"], quantize_lm_head, bits=bits),
    }


def init_quantized_params(cfg, key, fused: bool = True, bits: int = 8):
    """Random-init a ChatTS model directly in the int8/int4 layout (no
    full-size bf16 intermediate — an 8B bf16 tree plus its quantized copy
    would not fit a 16 GB chip during conversion).  For capacity/perf proofs
    and profiling."""
    import jax

    from chatts_tpu.core.config import ChatTSConfig
    from chatts_tpu.models import ts_encoder
    from chatts_tpu.ops import int4_matmul as i4

    assert isinstance(cfg, ChatTSConfig)
    lcfg = cfg.llm
    h, kvh, d, hid = (lcfg.num_attention_heads, lcfg.num_key_value_heads,
                      lcfg.head_dim, lcfg.hidden_size)
    keys = iter(jax.random.split(key, lcfg.num_hidden_layers * 8 + 4))

    def rand_int8(k, shape):
        # 4 int8 per uint32 of entropy: ~4x cheaper than randint (which
        # draws 32 bits per element) — init of an 8B-scale tree drops from
        # minutes to tens of seconds on the device.  Very large draws (the
        # 152k-vocab lm_head at 14B: 389 MB) go in bounded chunks, each
        # synced so its ~3x-size RNG temporaries free before the next —
        # peak transient memory stays ~100 MB instead of ~1.2 GB
        # (RESOURCE_EXHAUSTED observed at 14B init, r3).
        n = int(np.prod(shape))
        chunk_elems = 1 << 26  # 64 MB of int8 per chunk

        def draw(kk, m):
            bits32 = jax.random.bits(kk, ((m + 3) // 4,), jnp.uint32)
            i8 = jax.lax.bitcast_convert_type(bits32, jnp.int8).reshape(-1)
            return i8[:m]

        if n <= chunk_elems:
            return draw(k, n).reshape(shape)
        parts = []
        for i, kk in enumerate(jax.random.split(k, (n + chunk_elems - 1)
                                                // chunk_elems)):
            m = min(chunk_elems, n - i * chunk_elems)
            parts.append(jax.block_until_ready(draw(kk, m)))
        return jnp.concatenate(parts).reshape(shape)

    def qdense(fan_in, fan_out, bias):
        k = next(keys)
        if bits == 4 and i4.supported(fan_in, fan_out):
            out = {
                "kernel_q4": rand_int8(k, (fan_in // 2, fan_out)),
                "scales4": jnp.full(
                    (fan_in // i4.DEFAULT_GROUP, fan_out),
                    1.0 / (7 * np.sqrt(fan_in)), jnp.float32,
                ),
            }
        else:
            q = jnp.maximum(rand_int8(k, (fan_in, fan_out)), jnp.int8(-127))
            out = {
                "kernel_q": q,
                "scales": jnp.full((fan_out,), 1.0 / (127 * np.sqrt(fan_in)), jnp.float32),
            }
        if bias:
            out["bias"] = jnp.zeros((fan_out,), jnp.bfloat16)
        return out

    layers = []
    for _ in range(lcfg.num_hidden_layers):
        layer = {
            "input_layernorm": jnp.ones((hid,), jnp.bfloat16),
            "post_attention_layernorm": jnp.ones((hid,), jnp.bfloat16),
            "self_attn": {},
            "mlp": {},
        }
        if fused:
            layer["self_attn"]["qkv_proj"] = qdense(
                hid, (h + 2 * kvh) * d, lcfg.attention_bias
            )
            layer["mlp"]["gate_up_proj"] = qdense(hid, 2 * lcfg.intermediate_size, False)
        else:
            layer["self_attn"]["q_proj"] = qdense(hid, h * d, lcfg.attention_bias)
            layer["self_attn"]["k_proj"] = qdense(hid, kvh * d, lcfg.attention_bias)
            layer["self_attn"]["v_proj"] = qdense(hid, kvh * d, lcfg.attention_bias)
            layer["mlp"]["gate_proj"] = qdense(hid, lcfg.intermediate_size, False)
            layer["mlp"]["up_proj"] = qdense(hid, lcfg.intermediate_size, False)
        layer["self_attn"]["o_proj"] = qdense(h * d, hid, False)
        layer["mlp"]["down_proj"] = qdense(lcfg.intermediate_size, hid, False)
        if lcfg.qk_norm:
            layer["self_attn"]["q_norm"] = jnp.ones((d,), jnp.bfloat16)
            layer["self_attn"]["k_norm"] = jnp.ones((d,), jnp.bfloat16)
        # Bound in-flight temporaries: async dispatch of a whole 14B-scale
        # tree keeps every layer's RNG intermediates live at once and
        # RESOURCE_EXHAUSTs a 16 GB chip during init (measured r3).
        layer = jax.block_until_ready(layer)
        layers.append(layer)

    llm = {
        "embed_tokens": (
            # bf16 draw directly — an f32 (vocab, hid) temp is 3.1 GB at
            # the 14B shape.
            jax.random.normal(next(keys), (lcfg.vocab_size, hid),
                              dtype=jnp.bfloat16) * jnp.bfloat16(0.02)
        ),
        "layers": layers,
        "norm": jnp.ones((hid,), jnp.bfloat16),
        "lm_head_q": qdense(hid, lcfg.vocab_size, False),
    }
    return {
        "ts_encoder": ts_encoder.init_params(cfg.ts, next(keys)),
        "llm": llm,
    }


def param_bytes(params: Any) -> int:
    import jax

    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(params)
        if hasattr(leaf, "dtype")
    )
