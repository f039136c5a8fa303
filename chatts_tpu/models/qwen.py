"""Qwen2 / Qwen3 dense decoder, functional JAX.

The reference delegates the decoder to vLLM's Qwen2ForCausalLM /
Qwen3ForCausalLM (reference: chatts/vllm/chatts_vllm.py:483-488,664-669).
Here it is a first-party functional implementation: parameters are a plain
pytree so sharding annotations (``chatts_tpu.parallel``), weight streaming,
and Pallas kernel substitution all compose without framework glue.

Architecture per HF Qwen2/Qwen3:
  RMSNorm -> GQA attention (RoPE, qkv-bias for Qwen2 / per-head qk-RMSNorm for
  Qwen3) -> RMSNorm -> SwiGLU MLP, residual around each; final RMSNorm; tied
  or separate lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from chatts_tpu.core.config import QwenConfig
from chatts_tpu.ops.attention import attention

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables at the given positions; (B, T, head_dim) each, float32."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (B, T, half)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (B, T, D)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Rotate-half RoPE (HF/NeoX convention). x: (B, T, H, D)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rf = rotated.astype(jnp.float32)
    out = xf * cos[:, :, None, :] + rf * sin[:, :, None, :]
    return out.astype(x.dtype)


def _quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(…, position) symmetric int8 over the head dim.
    x (B, KVH, T, D) -> (int8 values, float32 scales (B, KVH, T))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _quantize_acts(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token (row) symmetric int8 activation quantization.
    x (..., K) -> (int8 values, float32 scales (...,))."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _dense(x: jnp.ndarray, layer: Dict[str, jnp.ndarray],
           mesh=None, tp_kind: str = "", act_int8: bool = False) -> jnp.ndarray:
    """Quantized-weight-aware dense.  act_int8=True additionally quantizes
    the ACTIVATIONS per token to int8 so the matmul runs on the v5e MXU's
    int8 path (2x bf16 TOPS) — the prefill FLOP-floor lever (VERDICT r2
    item 2).  Decode-side callers leave it off (decode is HBM-bound and
    sensitive to per-step rounding).  Applies to the quantized single-device
    paths; bf16 weights and mesh-sharded layers keep their existing dots."""
    if "kernel_q4" in layer:
        # Weight-only int4 (nibble-packed, group scales): XLA cannot fuse
        # the unpack into a dot, so this routes through the Pallas matmul
        # (ops/int4_matmul.py).  Under a (dp, tp) mesh a bare pallas_call
        # has no GSPMD partitioning rule, so the kernel runs through a
        # shard_map with the layer's Megatron kind (col: out over tp;
        # row: in over tp + psum); shapes that don't divide — or CPU
        # without interpret mode — take the dequant+dot fallback.
        from chatts_tpu.ops import int4_matmul as i4

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if "perm4" in layer:
            # desc_act GPTQ import: weight rows were sorted into contiguous
            # groups at load; activations follow with one column gather.
            x2 = jnp.take(x2, layer["perm4"], axis=1)
        interp = i4.interpret_enabled()
        on_tpu = jax.default_backend() == "tpu"
        in_dim = x2.shape[1]
        out_dim = layer["kernel_q4"].shape[1]
        group = in_dim // layer["scales4"].shape[0]
        if mesh is not None and ("zeros4" in layer or "perm4" in layer):
            # Asym/desc_act under a mesh: plain XLA dequant+dot (GSPMD
            # shards it); the kernel's shard_map wrapper doesn't thread
            # the extras.  Single-device serving stays on the kernel.
            w = i4.dequantize(layer["kernel_q4"], layer["scales4"], x.dtype)
            out = jnp.dot(x2, w, preferred_element_type=jnp.float32)
        elif mesh is None and (on_tpu or interp) and act_int8:
            xq, xs = _quantize_acts(x2)
            y = i4.int4_matmul_a8(xq, xs, layer["kernel_q4"],
                                  layer["scales4"], out_dtype=x.dtype,
                                  interpret=interp)
            out = y.astype(jnp.float32)
        elif mesh is None and on_tpu:
            y = i4.int4_matmul(x2, layer["kernel_q4"], layer["scales4"])
            out = y.astype(jnp.float32)
        elif (mesh is not None and (on_tpu or interp) and tp_kind
              and i4.supported_tp(mesh, in_dim, out_dim, group, tp_kind)):
            y = i4.int4_matmul_tp(
                x2, layer["kernel_q4"], layer["scales4"],
                mesh=mesh, kind=tp_kind, interpret=interp,
            )
            out = y.astype(jnp.float32)
        else:
            w = i4.dequantize(layer["kernel_q4"], layer["scales4"], x.dtype)
            out = jnp.dot(x2, w, preferred_element_type=jnp.float32)
        if "zeros4" in layer:
            # Asymmetric GPTQ zero-points, applied EXACTLY outside the
            # kernel: W = s*(code-8) + s*(8-z), and the second term only
            # needs each group's activation sum — a rank-G matmul
            # ((R, G) @ (G, OUT), G = IN/group ~ 28-148) on top of the
            # signed-symmetric kernel product.
            g = layer["zeros4"].shape[0]
            rs = jnp.sum(
                x2.astype(jnp.float32).reshape(x2.shape[0], g, in_dim // g),
                axis=-1,
            )
            out = out + jnp.dot(rs, layer["zeros4"],
                                preferred_element_type=jnp.float32)
        out = out.reshape(*lead, out.shape[-1])
    elif "kernel_q" in layer:
        if act_int8:
            # int8 x int8 -> int32 on the MXU (native 2x-TOPS path); exact
            # per-output-channel weight scales + per-token act scales after.
            xq, xs = _quantize_acts(x)
            out = (
                jax.lax.dot_general(
                    xq, layer["kernel_q"], (((xq.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                * xs[..., None] * layer["scales"]
            )
        else:
            # Weight-only int8: the int8->bf16 convert fuses into the dot's
            # HBM read; per-output-channel scales applied post-matmul.
            out = jnp.dot(
                x, layer["kernel_q"].astype(x.dtype),
                preferred_element_type=jnp.float32,
            ) * layer["scales"]
    else:
        out = jnp.dot(x, layer["kernel"], preferred_element_type=jnp.float32)
    if "bias" in layer:
        out = out + layer["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Decoder layer
# ---------------------------------------------------------------------------

def _decode_attention_recent(
    q1: jnp.ndarray,  # (B, 1, H, D) single-token queries
    cache,  # big-cache layer tuple (2-tuple bf16/f32 or 4-tuple int8)
    rbuf,  # recent layer tuple, same arity/layout as the big cache
    rec_valid: jnp.ndarray,  # (C,) bool — steps written so far (incl. self)
    base_valid: jnp.ndarray,  # (B, S) bool — cache validity, STATIC per chunk
    cfg: QwenConfig,
) -> jnp.ndarray:
    """Two-piece decode attention for recent-KV mode: scores over the big
    cache (positions < chunk-start length) and over the chunk-local recent
    buffer, softmaxed together over the concatenated axis (numerics match
    ops.attention.mha_reference: f32 scores/softmax, value-dtype prob
    einsum).  The cache piece reads head-major (B, KVH, S, D) directly —
    no swapaxes view.

    int8 caches: the per-(row, head, position) scales FACTOR OUT of the
    d-contraction, so the dots run on the raw int8 buffers (the convert
    fuses into the dot read, like the int4 weight chain) and the scales
    apply to scores / probabilities instead.  Materializing a dequantized
    cache here is a measured 1.4x regression (18.0 vs 13.1 ms/step, b32
    8B int8 KV): the cache is a scan invariant, so the dequant becomes a
    real per-step HBM buffer instead of fusing into the attention read
    the way it does on the non-scan path.  The recent buffer mirrors the
    cache layout (int8 codes + scales when the cache is int8, written by
    the same per-step quantizer), so both pieces see BIT-IDENTICAL values
    to the per-step scatter path."""
    b, _, h, d = q1.shape
    kvh = cfg.num_key_value_heads
    g = h // kvh
    scale = d ** -0.5
    neg_inf = float(np.finfo(np.float32).min)
    int8_kv = len(cache) == 4
    if int8_kv:
        k_full, v_full, k_scale, v_scale = cache
        rk, rv, rk_s, rv_s = rbuf
    else:
        k_full, v_full = cache
        rk, rv = rbuf
        k_scale = v_scale = rk_s = rv_s = None
    qg = q1[:, 0].reshape(b, kvh, g, d)
    s1 = jnp.einsum(
        "bkgd,bksd->bkgs", qg, k_full.astype(q1.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale
    if int8_kv:
        s1 = s1 * k_scale[:, :, None, :]
    s2 = jnp.einsum(
        "bkgd,bkcd->bkgc", qg, rk.astype(q1.dtype),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale
    if int8_kv:
        s2 = s2 * rk_s[:, :, None, :]
    s1 = jnp.where(base_valid[:, None, None, :], s1, neg_inf)
    s2 = jnp.where(rec_valid[None, None, None, :], s2, neg_inf)
    probs = jax.nn.softmax(jnp.concatenate([s1, s2], axis=-1), axis=-1)
    p1, p2 = jnp.split(probs, [s1.shape[-1]], axis=-1)
    if int8_kv:
        p1 = p1 * v_scale[:, :, None, :]
        p2 = p2 * rv_s[:, :, None, :]
    out = jnp.einsum(
        "bkgs,bksd->bkgd", p1.astype(q1.dtype), v_full.astype(q1.dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "bkgc,bkcd->bkgd", p2.astype(q1.dtype), rv.astype(q1.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, 1, h, d).astype(q1.dtype)


def attention_block(
    layer_params: Dict[str, Any],
    x: jnp.ndarray,  # (B, T, hidden)
    positions: jnp.ndarray,  # (B, T)
    cfg: QwenConfig,
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    write_pos: Optional[jnp.ndarray],
    kv_valid: jnp.ndarray,
    kv_positions: jnp.ndarray,
    attn_impl: str,
    kv_lengths: Optional[jnp.ndarray] = None,
    rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    kv_limit: Optional[int] = None,
    mesh=None,
    act_int8: bool = False,
    recent=None,  # (rk, rv, rec_idx, rec_valid) — chunk-local KV mode
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    b, t, _ = x.shape
    h, kvh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    p = layer_params

    if "qkv_proj" in p:
        # Fused qkv: one large HBM-streaming matmul instead of three (the
        # packing the reference delegates to vLLM's packed_modules_mapping,
        # chatts_vllm.py:454-459).  Single-device layout: [q | k | v] along
        # the output dim.
        qkv = _dense(x, p["qkv_proj"], mesh, "col", act_int8)
        q, k, v = jnp.split(qkv, [h * d, h * d + kvh * d], axis=-1)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, kvh, d)
        v = v.reshape(b, t, kvh, d)
    else:
        q = _dense(x, p["q_proj"], mesh, "col", act_int8).reshape(b, t, h, d)
        k = _dense(x, p["k_proj"], mesh, "col", act_int8).reshape(b, t, kvh, d)
        v = _dense(x, p["v_proj"], mesh, "col", act_int8).reshape(b, t, kvh, d)

    if cfg.qk_norm:
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)

    # RoPE tables depend only on positions: computed once per forward pass
    # and threaded through (not rebuilt in all N layers).
    cos, sin = rope if rope is not None else rope_cos_sin(
        positions, d, cfg.rope_theta
    )
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Caches are head-major (B, KVH, S, D) — see runtime/kv_cache.py.
    # A 4-tuple cache is the int8 mode: (k_q, v_q, k_scale, v_scale) with
    # per-(slot, head, position) scales.
    if kv_cache is not None:
        int8_kv = len(kv_cache) == 4
        if int8_kv:
            k_cache, v_cache, k_scale, v_scale = kv_cache
        else:
            k_cache, v_cache = kv_cache
            k_scale = v_scale = None
        kt = jnp.swapaxes(k, 1, 2)  # (B, KVH, T, D)
        vt = jnp.swapaxes(v, 1, 2)
        if recent is not None:
            # Recent-KV decode mode (t == 1): the new token's K/V lands in
            # a chunk-local buffer at a UNIFORM step index (one cheap
            # dynamic_update_slice) instead of a per-(row, head) element
            # scatter into the big cache (~0.16 us per update on v5e —
            # ~1.1 ms of a b32 8B decode step across 28 layers).  The big
            # cache stays untouched during the chunk; the engine merges the
            # recent buffers back as span windows once per chunk
            # (merge_recent_kv).  Attention reads cache + recent two-piece.
            # int8 caches: the buffer stores the SAME per-step codes +
            # scales the scatter path would write, so within-chunk reads
            # and the merged cache are bit-identical to that path.
            rbuf, rec_idx, rec_valid = recent
            if int8_kv:
                kt_q, kt_s = _quantize_kv(kt)
                vt_q, vt_s = _quantize_kv(vt)
                rbuf = (
                    jax.lax.dynamic_update_slice(
                        rbuf[0], kt_q, (0, 0, rec_idx, 0)),
                    jax.lax.dynamic_update_slice(
                        rbuf[1], vt_q, (0, 0, rec_idx, 0)),
                    jax.lax.dynamic_update_slice(
                        rbuf[2], kt_s, (0, 0, rec_idx)),
                    jax.lax.dynamic_update_slice(
                        rbuf[3], vt_s, (0, 0, rec_idx)),
                )
            else:
                rbuf = (
                    jax.lax.dynamic_update_slice(
                        rbuf[0], kt.astype(rbuf[0].dtype), (0, 0, rec_idx, 0)),
                    jax.lax.dynamic_update_slice(
                        rbuf[1], vt.astype(rbuf[1].dtype), (0, 0, rec_idx, 0)),
                )
            out = _decode_attention_recent(
                q, kv_cache, rbuf, rec_valid, kv_valid, cfg)
            out = out.reshape(b, t, h * d)
            return _dense(out, p["o_proj"], mesh, "row", act_int8), rbuf
        if int8_kv:
            kt, kt_s = _quantize_kv(kt)
            vt, vt_s = _quantize_kv(vt)
        else:
            kt = kt.astype(k_cache.dtype)
            vt = vt.astype(v_cache.dtype)
        if write_pos is None:
            # Prefill: write the whole block at offset 0, but attend over the
            # freshly computed T block only — no wasted FLOPs on the unused
            # tail of the cache capacity.
            k_cache = jax.lax.dynamic_update_slice(k_cache, kt, (0, 0, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, vt, (0, 0, 0, 0))
            if int8_kv:
                k_scale = jax.lax.dynamic_update_slice(k_scale, kt_s, (0, 0, 0))
                v_scale = jax.lax.dynamic_update_slice(v_scale, vt_s, (0, 0, 0))
            k_full, v_full = k, v  # (B, T, KVH, D) local block
            attn_kv_valid = kv_valid[:, :t]
            attn_kv_positions = kv_positions[:, :t]
            cache_attend = False
        else:
            # Decode / chunked prefill: per-(row, head) scatter at write_pos.
            # (batch, head, pos) index triplets are unique by construction —
            # the hint keeps XLA from lowering to a serialized general
            # scatter (measured ~20x slower without it on v5e).  NOTE: this
            # beats the all-head span-window form for single-token decode
            # writes — B tiny (1,KVH,1,D) scatter windows measured +9 ms on
            # a b32 8B decode step (windows only pay off for multi-token
            # spans; see _mixed_attention's admission writes).
            batch_idx = jnp.arange(b)[:, None, None]  # (B, 1, 1)
            head_idx = jnp.arange(cfg.num_key_value_heads)[None, :, None]
            pos_idx = write_pos[:, None, :]  # (B, 1, T)
            k_cache = k_cache.at[batch_idx, head_idx, pos_idx].set(
                kt, unique_indices=True)
            v_cache = v_cache.at[batch_idx, head_idx, pos_idx].set(
                vt, unique_indices=True)
            if int8_kv:
                k_scale = k_scale.at[batch_idx, head_idx, pos_idx].set(
                    kt_s, unique_indices=True)
                v_scale = v_scale.at[batch_idx, head_idx, pos_idx].set(
                    vt_s, unique_indices=True)
            k_full, v_full = k_cache, v_cache  # (B, KVH, S, D)
            attn_kv_valid = kv_valid
            attn_kv_positions = kv_positions
            if kv_limit is not None and kv_limit < k_cache.shape[2]:
                # Chunked prefill: attend over only the written-prefix slice
                # of the cache (static bound), not the full capacity — saves
                # HBM reads proportional to the unwritten tail.
                k_full = jax.lax.slice_in_dim(k_cache, 0, kv_limit, axis=2)
                v_full = jax.lax.slice_in_dim(v_cache, 0, kv_limit, axis=2)
                if int8_kv:
                    k_scale_att = jax.lax.slice_in_dim(k_scale, 0, kv_limit, axis=2)
                    v_scale_att = jax.lax.slice_in_dim(v_scale, 0, kv_limit, axis=2)
                attn_kv_valid = kv_valid[:, :kv_limit]
                attn_kv_positions = kv_positions[:, :kv_limit]
            elif int8_kv:
                k_scale_att, v_scale_att = k_scale, v_scale
            cache_attend = True
        new_cache = (
            (k_cache, v_cache, k_scale, v_scale) if int8_kv
            else (k_cache, v_cache)
        )
    else:
        k_full, v_full = k, v
        attn_kv_valid = kv_valid
        attn_kv_positions = kv_positions
        new_cache = None
        cache_attend = False

    if cache_attend:
        # Single-token decode with known per-slot lengths: the ragged Pallas
        # kernel streams only the valid KV prefix (bandwidth ∝ context, not
        # capacity).  Below ~2048 capacity the dense XLA read is small enough
        # that per-layer kernel-launch overhead outweighs the saved bandwidth
        # (measured on v5e), so "auto" only engages on large caches;
        # attn_impl="ragged" forces it, "xla" forces the reference path.
        # Under a (dp, tp) mesh the kernel routes through shard_map over the
        # kv-head/slot axes (a bare pallas_call has no partitioning rule);
        # interpret mode lets the CPU virtual mesh run the same path.
        from chatts_tpu.ops import ragged_decode_attention as rda

        int8_attend = kv_cache is not None and len(kv_cache) == 4
        interp = rda.interpret_enabled()
        use_ragged = (
            t == 1
            and kv_lengths is not None
            and (
                attn_impl == "ragged"
                or (attn_impl == "auto" and k_full.shape[2] >= 2048)
            )
            and (jax.default_backend() == "tpu" or interp)
        )
        tp_mesh = None
        if use_ragged and mesh is not None:
            if rda.supported_tp(mesh, b, kvh, h):
                tp_mesh = mesh
            else:
                use_ragged = False  # mesh does not divide the head/slot grid
        if use_ragged and rda.supported_hm(q[:, 0], k_full, interpret=interp):
            if int8_attend:
                if tp_mesh is not None:
                    out = rda.ragged_decode_attention_int8_tp(
                        q[:, 0].astype(q.dtype),
                        k_full, v_full, k_scale_att, v_scale_att,
                        kv_lengths, mesh=tp_mesh,
                        scale=d ** -0.5, interpret=interp,
                    )[:, None]
                else:
                    out = rda.ragged_decode_attention_int8(
                        q[:, 0].astype(q.dtype),
                        k_full, v_full, k_scale_att, v_scale_att,
                        kv_lengths,
                        scale=d ** -0.5, interpret=interp,
                    )[:, None]
            else:
                if tp_mesh is not None:
                    out = rda.ragged_decode_attention_tp(
                        q[:, 0].astype(q.dtype),
                        k_full.astype(q.dtype),
                        v_full.astype(q.dtype),
                        kv_lengths, mesh=tp_mesh,
                        scale=d ** -0.5, interpret=interp,
                    )[:, None]
                else:
                    out = rda.ragged_decode_attention(
                        q[:, 0].astype(q.dtype),
                        k_full.astype(q.dtype),
                        v_full.astype(q.dtype),
                        kv_lengths,
                        scale=d ** -0.5, interpret=interp,
                    )[:, None]
            out = out.reshape(b, t, h * d)
            return _dense(out, p["o_proj"], mesh, "row", act_int8), new_cache
        # Fallback: einsum reference over the (B, KVH, S, D) cache view,
        # dequantizing first in int8 mode.
        if int8_attend:
            k_deq = k_full.astype(jnp.float32) * k_scale_att[..., None]
            v_deq = v_full.astype(jnp.float32) * v_scale_att[..., None]
            k_attn = jnp.swapaxes(k_deq, 1, 2).astype(q.dtype)
            v_attn = jnp.swapaxes(v_deq, 1, 2).astype(q.dtype)
        else:
            k_attn = jnp.swapaxes(k_full, 1, 2).astype(q.dtype)
            v_attn = jnp.swapaxes(v_full, 1, 2).astype(q.dtype)
    else:
        k_attn = k_full.astype(q.dtype)
        v_attn = v_full.astype(q.dtype)

    out = attention(
        q, k_attn, v_attn,
        q_positions=positions,
        kv_positions=attn_kv_positions,
        kv_valid=attn_kv_valid,
        scale=d ** -0.5,
        impl=attn_impl,
    )
    out = out.reshape(b, t, h * d)
    return _dense(out, p["o_proj"], mesh, "row", act_int8), new_cache


def mlp_block(layer_params: Dict[str, Any], x: jnp.ndarray,
              mesh=None, act_int8: bool = False) -> jnp.ndarray:
    if "gate_up_proj" in layer_params:
        gate_up = _dense(x, layer_params["gate_up_proj"], mesh, "col",
                         act_int8)
        gate, up = jnp.split(gate_up, 2, axis=-1)
    else:
        gate = _dense(x, layer_params["gate_proj"], mesh, "col", act_int8)
        up = _dense(x, layer_params["up_proj"], mesh, "col", act_int8)
    return _dense(jax.nn.silu(gate) * up, layer_params["down_proj"], mesh,
                  "row", act_int8)


def decoder_layer(
    layer_params: Dict[str, Any],
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cfg: QwenConfig,
    kv_cache,
    write_pos,
    kv_valid,
    kv_positions,
    attn_impl: str,
    kv_lengths=None,
    rope=None,
    kv_limit=None,
    mesh=None,
    act_int8: bool = False,
    recent=None,
):
    attn_in = rms_norm(x, layer_params["input_layernorm"], cfg.rms_norm_eps)
    attn_out, new_cache = attention_block(
        layer_params["self_attn"], attn_in, positions, cfg,
        kv_cache, write_pos, kv_valid, kv_positions, attn_impl, kv_lengths,
        rope, kv_limit, mesh, act_int8, recent,
    )
    x = x + attn_out
    mlp_in = rms_norm(x, layer_params["post_attention_layernorm"], cfg.rms_norm_eps)
    x = x + mlp_block(layer_params["mlp"], mlp_in, mesh, act_int8)
    return x, new_cache


# ---------------------------------------------------------------------------
# Mixed prefill+decode layer (continuous batching's fused step)
# ---------------------------------------------------------------------------

def _decode_attend_cache(
    q1: jnp.ndarray,  # (B, 1, H, D) single-token queries
    cache,  # layer cache tuple (2-tuple bf16 or 4-tuple int8)
    kv_valid: jnp.ndarray,  # (B, S)
    kv_positions: jnp.ndarray,  # (B, S)
    q_positions: jnp.ndarray,  # (B, 1)
    kv_lengths: jnp.ndarray,  # (B,)
    cfg: QwenConfig,
    attn_impl: str,
    mesh,
) -> jnp.ndarray:
    """Single-token decode attention against head-major caches with the same
    ragged-kernel dispatch rules as attention_block (kernel at capacity
    >= 2048 on TPU or when forced; dense masked einsum otherwise)."""
    from chatts_tpu.ops import ragged_decode_attention as rda

    b, _, h, d = q1.shape
    kvh = cfg.num_key_value_heads
    int8_kv = len(cache) == 4
    if int8_kv:
        k_full, v_full, k_scale, v_scale = cache
    else:
        k_full, v_full = cache
        k_scale = v_scale = None
    interp = rda.interpret_enabled()
    use_ragged = (
        attn_impl == "ragged"
        or (attn_impl == "auto" and k_full.shape[2] >= 2048)
    ) and (jax.default_backend() == "tpu" or interp)
    tp_mesh = None
    if use_ragged and mesh is not None:
        if rda.supported_tp(mesh, b, kvh, h):
            tp_mesh = mesh
        else:
            use_ragged = False
    if use_ragged and rda.supported_hm(q1[:, 0], k_full, interpret=interp):
        q0 = q1[:, 0]
        if int8_kv:
            fn = (rda.ragged_decode_attention_int8_tp if tp_mesh is not None
                  else rda.ragged_decode_attention_int8)
            kwargs = {"mesh": tp_mesh} if tp_mesh is not None else {}
            out = fn(q0, k_full, v_full, k_scale, v_scale, kv_lengths,
                     scale=d ** -0.5, interpret=interp, **kwargs)
        else:
            fn = (rda.ragged_decode_attention_tp if tp_mesh is not None
                  else rda.ragged_decode_attention)
            kwargs = {"mesh": tp_mesh} if tp_mesh is not None else {}
            out = fn(q0, k_full.astype(q0.dtype), v_full.astype(q0.dtype),
                     kv_lengths, scale=d ** -0.5, interpret=interp, **kwargs)
        return out[:, None].reshape(b, 1, h, d)
    if int8_kv:
        k_attn = jnp.swapaxes(
            k_full.astype(jnp.float32) * k_scale[..., None], 1, 2
        ).astype(q1.dtype)
        v_attn = jnp.swapaxes(
            v_full.astype(jnp.float32) * v_scale[..., None], 1, 2
        ).astype(q1.dtype)
    else:
        k_attn = jnp.swapaxes(k_full, 1, 2).astype(q1.dtype)
        v_attn = jnp.swapaxes(v_full, 1, 2).astype(q1.dtype)
    return attention(
        q1, k_attn, v_attn,
        q_positions=q_positions, kv_positions=kv_positions,
        kv_valid=kv_valid, scale=d ** -0.5, impl="xla",
    )


def _scatter_token_spans(
    cache: jnp.ndarray,  # (B, KVH, S[, D])
    vals: jnp.ndarray,  # (A, KVH, T[, D]) — contiguous token spans
    rows: jnp.ndarray,  # (A,) int32; out-of-bounds rows drop whole windows
    starts: jnp.ndarray,  # (A,) or scalar int32 — span start per row
) -> jnp.ndarray:
    """Write A contiguous all-head token spans: cache[rows[a], :,
    starts[a]:starts[a]+T] = vals[a].

    One XLA scatter whose update unit is a whole (KVH, T[, D]) window, not a
    token: element scatters lower to ~0.16 us per (row, head, pos) update on
    v5e (~180 us for a 288-token admission chunk PER BUFFER PER LAYER, the
    dominant cost of the mixed serving round), while A window updates move
    the same bytes at DMA speed.  Windows falling out of bounds — inactive
    or padded rows routed to rows >= B — are dropped whole by XLA scatter
    semantics, which is exactly the old mode='drop' routing.  Callers
    guarantee starts+T <= S for live rows (capacity checks in the engines).
    """
    a = vals.shape[0]
    upd = vals[:, None].astype(cache.dtype)  # (A, 1, KVH, T[, D])
    starts = jnp.broadcast_to(jnp.asarray(starts, jnp.int32), (a,))
    idx = jnp.stack([rows.astype(jnp.int32), starts], axis=1)  # (A, 2)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=tuple(range(1, 1 + cache.ndim)),
        inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0, 2),
    )
    return jax.lax.scatter(
        cache, idx, upd, dnums,
        indices_are_sorted=False, unique_indices=True,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP,
    )


def _mixed_attention(
    layer_params: Dict[str, Any],
    x: jnp.ndarray,  # (1, Tp, hidden) packed: B decode tokens, then A*npt
    positions: jnp.ndarray,  # (1, Tp)
    cfg: QwenConfig,
    cache,  # big-cache layer tuple
    b: int,
    a: int,
    npt: int,
    write_rows: jnp.ndarray,  # (Tp,) cache row per packed token (OOB = drop)
    adm_slots: jnp.ndarray,  # (A,)
    adm_seq_lens: jnp.ndarray,  # (A,)
    dec_kv_valid: jnp.ndarray,  # (B, S)
    kv_positions: jnp.ndarray,  # (B, S)
    dec_kv_lengths: jnp.ndarray,  # (B,)
    kv_limit: int,
    attn_impl: str,
    rope,
    mesh,
):
    _, tp, _ = x.shape
    h, kvh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    p = layer_params

    if "qkv_proj" in p:
        qkv = _dense(x, p["qkv_proj"], mesh, "col")
        q, k, v = jnp.split(qkv, [h * d, h * d + kvh * d], axis=-1)
        q = q.reshape(1, tp, h, d)
        k = k.reshape(1, tp, kvh, d)
        v = v.reshape(1, tp, kvh, d)
    else:
        q = _dense(x, p["q_proj"], mesh, "col").reshape(1, tp, h, d)
        k = _dense(x, p["k_proj"], mesh, "col").reshape(1, tp, kvh, d)
        v = _dense(x, p["v_proj"], mesh, "col").reshape(1, tp, kvh, d)
    if cfg.qk_norm:
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
    cos, sin = rope
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    # Cache writes, phase-split for scatter cost (XLA lowers element
    # scatters to ~0.16 us per (row, head, pos) update on v5e — fine for B
    # decode tokens, ruinous for A*npt prompt tokens):
    #   - decode tokens: element scatter at (slot, head, cur_len); inactive
    #     rows carry out-of-bounds row indices and drop.
    #   - prompt tokens: ONE window scatter of A*KVH contiguous (npt, D)
    #     token spans — all admission rows share the same npt-aligned span
    #     start this step, and padded admission rows (OOB) drop whole
    #     windows natively.
    int8_kv = len(cache) == 4
    if int8_kv:
        k_cache, v_cache, k_scale, v_scale = cache
    else:
        k_cache, v_cache = cache
        k_scale = v_scale = None
    kt = k[0]  # (Tp, KVH, D)
    vt = v[0]
    if int8_kv:
        amax_k = jnp.max(jnp.abs(kt.astype(jnp.float32)), axis=-1)
        s_k = jnp.maximum(amax_k / 127.0, 1e-8)
        kt_q = jnp.clip(jnp.round(kt.astype(jnp.float32) / s_k[..., None]),
                        -127, 127).astype(jnp.int8)
        amax_v = jnp.max(jnp.abs(vt.astype(jnp.float32)), axis=-1)
        s_v = jnp.maximum(amax_v / 127.0, 1e-8)
        vt_q = jnp.clip(jnp.round(vt.astype(jnp.float32) / s_v[..., None]),
                        -127, 127).astype(jnp.int8)
    else:
        kt_q, vt_q = kt.astype(k_cache.dtype), vt.astype(v_cache.dtype)

    dec_rows = write_rows[:b]
    adm_rows = write_rows[b::npt]  # (A,) — repeat(adm_write_rows, npt)
    span_start = positions[0, b]  # shared npt-aligned span start

    # Decode tokens: element scatter (fastest for single-token writes;
    # OOB-routed inactive rows drop).  Admission chunk: A span windows.
    row_idx = dec_rows[:, None]  # (B, 1)
    head_idx = jnp.arange(kvh)[None, :]  # (1, KVH)
    pos_idx = positions[0, :b][:, None]  # (B, 1)
    k_cache = k_cache.at[row_idx, head_idx, pos_idx].set(
        kt_q[:b], mode="drop", unique_indices=True)
    v_cache = v_cache.at[row_idx, head_idx, pos_idx].set(
        vt_q[:b], mode="drop", unique_indices=True)
    k_cache = _scatter_token_spans(
        k_cache, kt_q[b:].reshape(a, npt, kvh, -1).swapaxes(1, 2),
        adm_rows, span_start)
    v_cache = _scatter_token_spans(
        v_cache, vt_q[b:].reshape(a, npt, kvh, -1).swapaxes(1, 2),
        adm_rows, span_start)
    if int8_kv:
        k_scale = k_scale.at[row_idx, head_idx, pos_idx].set(
            s_k[:b], mode="drop", unique_indices=True)
        v_scale = v_scale.at[row_idx, head_idx, pos_idx].set(
            s_v[:b], mode="drop", unique_indices=True)
        k_scale = _scatter_token_spans(
            k_scale, s_k[b:].reshape(a, npt, kvh).swapaxes(1, 2),
            adm_rows, span_start)
        v_scale = _scatter_token_spans(
            v_scale, s_v[b:].reshape(a, npt, kvh).swapaxes(1, 2),
            adm_rows, span_start)
        new_cache = (k_cache, v_cache, k_scale, v_scale)
    else:
        new_cache = (k_cache, v_cache)

    # Decode phase: B single-token queries, same dispatch as the pure
    # decode step (ragged kernel stays on the hot path during admissions).
    q_dec = q[0, :b][:, None]  # (B, 1, H, D)
    out_dec = _decode_attend_cache(
        q_dec, new_cache, dec_kv_valid, kv_positions,
        positions[0, :b][:, None], dec_kv_lengths, cfg, attn_impl, mesh,
    )  # (B, 1, H, D)

    # Prompt phase: gather the admission slots' cache prefix (static
    # kv_limit slice fused into the row gather) and run masked attention.
    # Causality over not-yet-written tail positions falls out of the
    # positions formula; garbage beyond a row's seq_len is masked by
    # kv_valid (same invariants as the chunked batch prefill,
    # runtime/engine.py::_prefill_chunk).
    def slice_rows(buf):
        return jnp.take(
            jax.lax.slice_in_dim(buf, 0, kv_limit, axis=2), adm_slots, axis=0
        )

    k_adm = slice_rows(k_cache)
    v_adm = slice_rows(v_cache)
    if int8_kv:
        k_adm = (k_adm.astype(jnp.float32)
                 * slice_rows(k_scale)[..., None])
        v_adm = (v_adm.astype(jnp.float32)
                 * slice_rows(v_scale)[..., None])
    q_pro = q[0, b:].reshape(a, npt, h, d)
    pro_positions = positions[0, b:].reshape(a, npt)
    adm_kv_pos = jnp.tile(jnp.arange(kv_limit, dtype=jnp.int32)[None], (a, 1))
    adm_kv_valid = adm_kv_pos < adm_seq_lens[:, None]
    # Prompt-side attention impl, overridable via CHATTS_MIXED_PROMPT_ATTN
    # (read at trace time) so the xla-vs-flash choice at mixed shapes
    # (a<=8, npt<=64, kv_limit ladder) can be A/B'd on chip
    # (scripts/experiments/expt_mixed_attn.py; table in BENCHMARKS.md).
    import os as _os

    pro_impl = _os.environ.get("CHATTS_MIXED_PROMPT_ATTN", "xla")
    out_pro = attention(
        q_pro,
        jnp.swapaxes(k_adm, 1, 2).astype(q_pro.dtype),
        jnp.swapaxes(v_adm, 1, 2).astype(q_pro.dtype),
        q_positions=pro_positions, kv_positions=adm_kv_pos,
        kv_valid=adm_kv_valid, scale=d ** -0.5, impl=pro_impl,
    )  # (A, npt, H, D)

    out = jnp.concatenate(
        [out_dec.reshape(1, b, h * d), out_pro.reshape(1, a * npt, h * d)],
        axis=1,
    )
    return _dense(out, p["o_proj"], mesh, "row"), new_cache


def forward_mixed(
    params: Params,
    cfg: QwenConfig,
    embeds: jnp.ndarray,  # (1, Tp, hidden) packed
    positions: jnp.ndarray,  # (1, Tp)
    *,
    b: int,
    a: int,
    npt: int,
    write_rows: jnp.ndarray,
    adm_slots: jnp.ndarray,
    adm_seq_lens: jnp.ndarray,
    kv_caches,
    dec_kv_valid: jnp.ndarray,
    kv_positions: jnp.ndarray,
    dec_kv_lengths: jnp.ndarray,
    kv_limit: int,
    attn_impl: str = "auto",
    mesh=None,
):
    """Fused mixed prefill+decode forward (vLLM-style mixed batches — the
    behavior the reference gets from the forked vllm scheduler, reference:
    scripts/install_vllm_server.sh:20-22).

    One packed token stream of B decode tokens + A*npt prompt-chunk tokens
    runs through every matmul TOGETHER — the prompt chunk rides the decode
    step's weight reads, so admission costs attention-only on top of decode
    instead of stalling it.  Only attention and the cache write are
    phase-split.  Returns (hidden (1, Tp, hidden) post-final-norm, caches).
    """
    x = embeds
    rope = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    new_caches = []
    for i, layer_params in enumerate(params["layers"]):
        attn_in = rms_norm(x, layer_params["input_layernorm"], cfg.rms_norm_eps)
        attn_out, new_cache = _mixed_attention(
            layer_params["self_attn"], attn_in, positions, cfg,
            kv_caches[i], b, a, npt, write_rows, adm_slots, adm_seq_lens,
            dec_kv_valid, kv_positions, dec_kv_lengths, kv_limit,
            attn_impl, rope, mesh,
        )
        x = x + attn_out
        mlp_in = rms_norm(x, layer_params["post_attention_layernorm"],
                          cfg.rms_norm_eps)
        x = x + mlp_block(layer_params["mlp"], mlp_in, mesh)
        new_caches.append(new_cache)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed_tokens"], input_ids, axis=0)


def forward(
    params: Params,
    cfg: QwenConfig,
    inputs_embeds: jnp.ndarray,  # (B, T, hidden)
    positions: jnp.ndarray,  # (B, T)
    *,
    kv_caches: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = None,
    write_pos: Optional[jnp.ndarray] = None,
    kv_valid: Optional[jnp.ndarray] = None,
    kv_positions: Optional[jnp.ndarray] = None,
    attn_impl: str = "auto",
    kv_lengths: Optional[jnp.ndarray] = None,
    kv_limit: Optional[int] = None,
    mesh=None,
    act_int8: bool = False,
    recents=None,  # per-layer [(rk, rv)] — recent-KV decode mode
    rec_idx=None,  # traced scalar: step index within the chunk
    rec_valid=None,  # (C,) bool: steps written so far (incl. this one)
) -> Tuple[jnp.ndarray, Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]]]:
    """Run the decoder stack. Returns (hidden (B,T,H), updated kv caches).

    Without a cache, attention is self-contained over the T block: kv_valid
    and kv_positions default to the query's own positions.

    Recent-KV mode (recents is not None, single-token decode): kv caches
    are READ-ONLY (kv_valid must be the chunk-start validity) and the
    second return value is the UPDATED RECENTS list instead of caches —
    the caller owns the once-per-chunk merge (merge_recent_kv).
    """
    b, t, _ = inputs_embeds.shape
    if kv_caches is None:
        if kv_valid is None:
            kv_valid = jnp.ones((b, t), dtype=bool)
        if kv_positions is None:
            kv_positions = positions
    else:
        assert kv_valid is not None and kv_positions is not None

    x = inputs_embeds
    rope = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    new_caches: Optional[List[Tuple[jnp.ndarray, jnp.ndarray]]] = (
        [] if kv_caches is not None else None
    )
    for i, layer_params in enumerate(params["layers"]):
        cache_i = kv_caches[i] if kv_caches is not None else None
        recent_i = None
        if recents is not None:
            recent_i = (recents[i], rec_idx, rec_valid)
        x, new_cache = decoder_layer(
            layer_params, x, positions, cfg,
            cache_i, write_pos, kv_valid, kv_positions, attn_impl, kv_lengths,
            rope, kv_limit, mesh, act_int8, recent_i,
        )
        if new_caches is not None:
            new_caches.append(new_cache)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x, new_caches


def init_recents(caches, cfg: QwenConfig, b: int, chunk: int):
    """Allocate chunk-local recent K/V buffers mirroring the big caches'
    layout: (rk, rv) in the cache dtype for float caches, (rk_q, rv_q,
    rk_scale, rv_scale) for int8 caches — per-step writes then produce the
    SAME codes + per-(row, head, position) scales the scatter path would,
    keeping recent-KV decode bit-identical to it.  Shared by the serving
    scheduler and the batch engine (one copy of the layout invariant)."""
    kvh, d = cfg.num_key_value_heads, cfg.head_dim
    out = []
    for c in caches:
        if len(c) == 4:
            out.append((
                jnp.zeros((b, kvh, chunk, d), jnp.int8),
                jnp.zeros((b, kvh, chunk, d), jnp.int8),
                jnp.ones((b, kvh, chunk), jnp.float32),
                jnp.ones((b, kvh, chunk), jnp.float32),
            ))
        else:
            out.append((
                jnp.zeros((b, kvh, chunk, d), c[0].dtype),
                jnp.zeros((b, kvh, chunk, d), c[1].dtype),
            ))
    return out


def merge_recent_kv(caches, recents, rows, starts):
    """Merge chunk-local recent K/V buffers into the big head-major caches:
    one (KVH, C[, D]) span-window scatter per buffer per layer (the
    multi-token form element scatters lose to; see _scatter_token_spans).

    rows: (B,) cache row per recent row — route inactive rows out of bounds
    (their windows drop whole).  starts: (B,) chunk-start lengths.  Windows
    that would cross the cache capacity belong to rows whose request
    necessarily finished inside the chunk (admission guarantees
    prompt+max_tokens <= capacity), so FILL_OR_DROP dropping them whole
    never loses K/V that a later step could read.  int8 recent buffers
    already hold per-step codes + scales (attention_block quantizes on
    write), so the merge is a straight scatter of both."""
    out = []
    for big, rbuf in zip(caches, recents):
        out.append(tuple(
            _scatter_token_spans(bbuf, sbuf, rows, starts)
            for bbuf, sbuf in zip(big, rbuf)
        ))
    return out


def compute_logits(params: Params, cfg: QwenConfig, hidden: jnp.ndarray,
                   mesh=None) -> jnp.ndarray:
    """hidden (B, T, H) -> logits (B, T, V), float32."""
    if "lm_head_q" in params:
        return _dense(hidden, params["lm_head_q"], mesh, "col").astype(jnp.float32)
    if cfg.tie_word_embeddings or "lm_head" not in params:
        table = params["embed_tokens"]
        return jnp.dot(
            hidden, table.T, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
    return jnp.dot(
        hidden, params["lm_head"], preferred_element_type=jnp.float32
    ).astype(jnp.float32)


def fuse_projections(params: Params) -> Params:
    """Pack per-layer q/k/v kernels into qkv_proj and gate/up into
    gate_up_proj (single large matmuls; better HBM streaming at decode).

    Single-device layout only: the concatenated output dim must not be
    TP-sharded (Megatron shards each constituent separately) — apply this
    AFTER deciding against tensor parallelism, or keep unfused under a mesh.
    """
    new_layers = []
    for layer in params["layers"]:
        attn = dict(layer["self_attn"])
        qkv = {
            "kernel": jnp.concatenate(
                [attn["q_proj"]["kernel"], attn["k_proj"]["kernel"],
                 attn["v_proj"]["kernel"]], axis=1
            )
        }
        if "bias" in attn["q_proj"]:
            qkv["bias"] = jnp.concatenate(
                [attn["q_proj"]["bias"], attn["k_proj"]["bias"],
                 attn["v_proj"]["bias"]]
            )
        for key in ("q_proj", "k_proj", "v_proj"):
            attn.pop(key)
        attn["qkv_proj"] = qkv

        mlp = dict(layer["mlp"])
        mlp["gate_up_proj"] = {
            "kernel": jnp.concatenate(
                [mlp["gate_proj"]["kernel"], mlp["up_proj"]["kernel"]], axis=1
            )
        }
        mlp.pop("gate_proj")
        mlp.pop("up_proj")

        new_layer = dict(layer)
        new_layer["self_attn"] = attn
        new_layer["mlp"] = mlp
        new_layers.append(new_layer)
    out = dict(params)
    out["layers"] = new_layers
    return out


# ---------------------------------------------------------------------------
# Parameter init / torch conversion
# ---------------------------------------------------------------------------

def init_params(cfg: QwenConfig, key: jax.Array, dtype=None) -> Params:
    """Random-init parameters (for tiny-random tests and profiling)."""
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)
    h, kvh, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    hid = cfg.hidden_size

    def dense(key, fan_in, fan_out, bias):
        w = (jax.random.normal(key, (fan_in, fan_out)) / np.sqrt(fan_in)).astype(dtype)
        out = {"kernel": w}
        if bias:
            out["bias"] = jnp.zeros((fan_out,), dtype)
        return out

    keys = iter(jax.random.split(key, cfg.num_hidden_layers * 7 + 3))
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layer = {
            "input_layernorm": jnp.ones((hid,), dtype),
            "post_attention_layernorm": jnp.ones((hid,), dtype),
            "self_attn": {
                "q_proj": dense(next(keys), hid, h * d, cfg.attention_bias),
                "k_proj": dense(next(keys), hid, kvh * d, cfg.attention_bias),
                "v_proj": dense(next(keys), hid, kvh * d, cfg.attention_bias),
                "o_proj": dense(next(keys), h * d, hid, False),
            },
            "mlp": {
                "gate_proj": dense(next(keys), hid, cfg.intermediate_size, False),
                "up_proj": dense(next(keys), hid, cfg.intermediate_size, False),
                "down_proj": dense(next(keys), cfg.intermediate_size, hid, False),
            },
        }
        if cfg.qk_norm:
            layer["self_attn"]["q_norm"] = jnp.ones((d,), dtype)
            layer["self_attn"]["k_norm"] = jnp.ones((d,), dtype)
        layers.append(layer)

    params: Params = {
        "embed_tokens": (
            jax.random.normal(next(keys), (cfg.vocab_size, hid)) * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((hid,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = (
            jax.random.normal(next(keys), (hid, cfg.vocab_size)) / np.sqrt(hid)
        ).astype(dtype)
    return params


def load_torch_state_dict(
    state_dict, cfg: QwenConfig, prefix: str = "model.", dtype=None
) -> Params:
    """Convert an HF torch state dict (values: numpy arrays) to our pytree.

    HF names (reference weight-prefix contract: chatts_vllm.py:467-470):
      model.embed_tokens.weight, model.layers.{i}.self_attn.{q,k,v,o}_proj.*,
      model.layers.{i}.mlp.{gate,up,down}_proj.weight,
      model.layers.{i}.{input,post_attention}_layernorm.weight,
      model.norm.weight, lm_head.weight (absent when embeddings are tied —
      reference: chatts_vllm.py:621-624).
    """
    if dtype is None:
        dtype = jnp.dtype(cfg.dtype)

    def get(name):
        return np.asarray(state_dict[name])

    def dense(name, bias):
        out = {"kernel": jnp.asarray(get(name + ".weight").T, dtype)}
        if bias and name + ".bias" in state_dict:
            out["bias"] = jnp.asarray(get(name + ".bias"), dtype)
        return out

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}layers.{i}."
        layer = {
            "input_layernorm": jnp.asarray(get(lp + "input_layernorm.weight"), dtype),
            "post_attention_layernorm": jnp.asarray(
                get(lp + "post_attention_layernorm.weight"), dtype
            ),
            "self_attn": {
                "q_proj": dense(lp + "self_attn.q_proj", cfg.attention_bias),
                "k_proj": dense(lp + "self_attn.k_proj", cfg.attention_bias),
                "v_proj": dense(lp + "self_attn.v_proj", cfg.attention_bias),
                "o_proj": dense(lp + "self_attn.o_proj", False),
            },
            "mlp": {
                "gate_proj": dense(lp + "mlp.gate_proj", False),
                "up_proj": dense(lp + "mlp.up_proj", False),
                "down_proj": dense(lp + "mlp.down_proj", False),
            },
        }
        if cfg.qk_norm:
            layer["self_attn"]["q_norm"] = jnp.asarray(
                get(lp + "self_attn.q_norm.weight"), dtype
            )
            layer["self_attn"]["k_norm"] = jnp.asarray(
                get(lp + "self_attn.k_norm.weight"), dtype
            )
        layers.append(layer)

    params: Params = {
        "embed_tokens": jnp.asarray(get(prefix + "embed_tokens.weight"), dtype),
        "layers": layers,
        "norm": jnp.asarray(get(prefix + "norm.weight"), dtype),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state_dict:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype)
    return params
