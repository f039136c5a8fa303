"""GPTQ-Int4 checkpoint support.

The reference ships GPTQ-quantized variants (ChatTS-8B/14B-GPTQ-Int4,
reference: README.md:52,260-263) served through vLLM's GPTQ kernels.  Here
symmetric checkpoints convert LOSSLESSLY to the native on-device int4
serving layout (``to_native_int4`` -> ops/int4_matmul.py's nibble-packed
kernel_q4/scales4, same group-128 granularity); asymmetric ones (non-8
zero-points or desc_act row permutations) are dequantized on the host and
re-quantized to int8 (models/quantize.py) so every published checkpoint
remains directly usable.

Format (AutoGPTQ v1, bits=4, the format of the published checkpoints):
  - ``qweight`` int32 (in/8, out): eight 4-bit codes packed per int32 along
    the input dimension, least-significant nibble first.
  - ``qzeros``  int32 (groups, out/8): packed 4-bit zero-points, stored
    MINUS ONE (the historical AutoGPTQ off-by-one: stored = zero - 1).
  - ``scales``  f16/f32 (groups, out).
  - ``g_idx``   int32 (in,): input-feature -> group map (present with
    desc_act; defaults to ``i // group_size``).
Dequantization: W[i, o] = scales[g_idx[i], o] * (code[i, o] - (qzeros+1)).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

BITS = 4
PACK = 32 // BITS  # codes per int32


def unpack_int4(packed: np.ndarray, axis: int) -> np.ndarray:
    """Unpack 4-bit codes from int32 along ``axis`` (LSB nibble first)."""
    packed = packed.astype(np.uint32)
    parts = [(packed >> (BITS * b)) & 0xF for b in range(PACK)]
    stacked = np.stack(parts, axis=axis + 1)  # (..., PACK, ...)
    shape = list(packed.shape)
    shape[axis] *= PACK
    return stacked.reshape(shape).astype(np.int32)


def pack_int4(codes: np.ndarray, axis: int) -> np.ndarray:
    """Inverse of :func:`unpack_int4` (used by tests / checkpoint synthesis)."""
    shape = list(codes.shape)
    assert shape[axis] % PACK == 0
    shape[axis] //= PACK
    grouped = codes.reshape(
        shape[:axis] + [shape[axis], PACK] + shape[axis + 1:]
    ).astype(np.uint32)
    out = np.zeros(shape, np.uint32)
    for b in range(PACK):
        out |= (np.take(grouped, b, axis=axis + 1) & 0xF) << (BITS * b)
    return out.astype(np.int32)


def dequantize(
    qweight: np.ndarray,  # int32 (in/8, out)
    qzeros: np.ndarray,  # int32 (groups, out/8)
    scales: np.ndarray,  # (groups, out)
    g_idx: Optional[np.ndarray] = None,  # int32 (in,)
    group_size: Optional[int] = None,
) -> np.ndarray:
    """Return the dense kernel W (in, out) float32."""
    codes = unpack_int4(qweight, axis=0)  # (in, out)
    zeros = unpack_int4(qzeros, axis=1) + 1  # (groups, out); undo the -1
    in_features = codes.shape[0]
    if g_idx is None:
        if group_size is None:
            group_size = in_features // scales.shape[0]
        g_idx = np.arange(in_features, dtype=np.int64) // group_size
    g_idx = np.asarray(g_idx, np.int64)
    scales = np.asarray(scales, np.float32)
    return scales[g_idx] * (codes.astype(np.float32) - zeros[g_idx])


def has_gptq_tensors(sd, name: str) -> bool:
    """Whether ``name`` (a linear layer prefix) is stored GPTQ-packed."""
    return name + ".qweight" in sd


def to_native_int4(sd, name: str):
    """Losslessly convert the GPTQ linear at ``name`` to the first-party
    int4 serving layout (ops/int4_matmul.py): returns {'kernel_q4',
    'scales4'[, 'zeros4'][, 'perm4']} or None when the shape cannot tile.

    All three published export styles land on the native kernel EXACTLY
    (reference GPTQ serving: README.md:260-263):

    - symmetric (all zeros == 8, the ``sym=True`` export): W = s*(code-8),
      code-8 in [-8, 7] — the kernel's signed-int4 view, no correction.
    - asymmetric zero-points: W = s*(code-z) = s*(code-8) + s*(8-z); the
      second term depends only on the GROUP-SUM of the activations, so it
      is applied outside the kernel as a rank-G matmul with
      ``zeros4[g, o] = s[g, o] * (8 - z[g, o])`` (qwen._dense) — exact, no
      dequant->requant round trip.
    - desc_act (non-trivial ``g_idx``): rows are permuted so each group's
      inputs are contiguous (GPTQ groups are balanced by construction);
      ``perm4`` records the input permutation the activations must follow
      at run time (one cheap column gather per matmul).
    """
    import jax.numpy as jnp

    from chatts_tpu.ops import int4_matmul as i4

    qweight = np.asarray(sd[name + ".qweight"])
    qzeros = np.asarray(sd[name + ".qzeros"])
    scales = np.asarray(sd[name + ".scales"], np.float32)
    zeros = unpack_int4(qzeros, axis=1) + 1  # (groups, out)
    codes = unpack_int4(qweight, axis=0)  # (in, out)
    in_dim, out_dim = codes.shape
    groups = scales.shape[0]
    if in_dim % groups != 0:
        return None
    group_size = in_dim // groups
    perm = None
    if name + ".g_idx" in sd:
        g_idx = np.asarray(sd[name + ".g_idx"])
        if not np.array_equal(g_idx, np.arange(in_dim) // group_size):
            # desc_act: sort inputs into contiguous groups.  GPTQ groups
            # are balanced (each has exactly group_size members) — verify,
            # since the kernel's block layout requires it.
            counts = np.bincount(g_idx, minlength=groups)
            if not np.all(counts == group_size):
                return None
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            codes = codes[perm]
    if not i4.supported(in_dim, out_dim, group_size):
        return None
    packed, scales4 = i4.pack_from_int4_values(
        jnp.asarray(codes - 8, jnp.int8), jnp.asarray(scales)
    )
    out = {"kernel_q4": packed, "scales4": scales4}
    if not np.all(zeros == 8):
        out["zeros4"] = jnp.asarray(scales * (8.0 - zeros), jnp.float32)
    if perm is not None:
        out["perm4"] = jnp.asarray(perm)
    return out


def load_gptq_kernel(sd, name: str) -> np.ndarray:
    """Dequantize the GPTQ linear at ``name`` to a dense (in, out) kernel."""
    g_idx = None
    if name + ".g_idx" in sd:
        g_idx = np.asarray(sd[name + ".g_idx"])
    return dequantize(
        np.asarray(sd[name + ".qweight"]),
        np.asarray(sd[name + ".qzeros"]),
        np.asarray(sd[name + ".scales"], np.float32),
        g_idx=g_idx,
    )
