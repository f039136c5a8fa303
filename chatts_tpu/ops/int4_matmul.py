"""Pallas int4 weight-only matmul (group scales, native MXU int4 ingest).

Parity role: the reference ships GPTQ-Int4 serving variants
(reference: README.md:260-263) on vLLM's CUDA quant kernels.  Decode on TPU
is HBM-bound, so weight bytes set the per-token floor; int4 halves the int8
floor.

Why a kernel at all: XLA does NOT fuse a nibble-unpack chain into a dot's
operand read (measured on v5e: an unpack-via-jnp int4 matmul runs 1.44x
SLOWER than int8 because the dequantized matrix materializes in HBM), and
VPU-side unpacking inside a kernel is relayout-bound.  The v5e MXU however
ingests int4 operands natively: ``lax.dot_general(bf16_x, int4_w)`` inside
Mosaic is numerically exact and costs no VPU work.  So the kernel:

  1. streams packed int8 bytes HBM->VMEM (Pallas grid pipeline),
  2. ``pltpu.bitcast`` each block to int4 — a free view, no unpack ops:
     the bitcast doubles the sublane dim, so byte row i yields logical
     rows (2i, 2i+1) with the LOW nibble first (verified on hardware),
  3. one full-K-tile (128-row) dot per quantization group straight off the
     int4 view, scale-accumulated on the VPU: ``acc += dot(x_g, w4_g) * s_g``.

Layout:
  logical W (IN, OUT)  ->  packed (IN//2, OUT) int8, where
      packed[i, j] = (W[2i, j] & 0xF) | (W[2i+1, j] << 4)
  scales (IN//G, OUT) float32, group g covers logical rows [g*G, (g+1)*G),
  with G = 128 — one MXU K-tile per group, and the GPTQ group size, so GPTQ
  checkpoints with symmetric zero-points convert losslessly
  (models/gptq.py).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def interpret_enabled() -> bool:
    """Pallas interpret mode (CHATTS_INT4_INTERPRET=1): lets the virtual CPU
    mesh exercise the exact TP shard_map path instead of the dequant+dot
    fallback."""
    return os.environ.get("CHATTS_INT4_INTERPRET", "") == "1"

# One quantization group per MXU K-tile: group dots stay full-tile.
DEFAULT_GROUP = 128


# ---------------------------------------------------------------------------
# Pack + reference dequant
# ---------------------------------------------------------------------------

def pack_int4(
    w: jnp.ndarray, group_size: int = DEFAULT_GROUP
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize W (IN, OUT) float -> (packed int8 (IN//2, OUT),
    scales float32 (IN//G, OUT)).  Symmetric, clipped to [-7, 7] so the grid
    is symmetric around 0 (GPTQ imports may carry -8 — the int4 view handles
    the full range).

    Pure jnp: runs on device, no host round trip for multi-GB models.
    """
    in_dim, out_dim = w.shape
    g = group_size
    if in_dim % g != 0:
        raise ValueError(f"IN {in_dim} not a multiple of group_size {g}")
    w3 = w.astype(jnp.float32).reshape(in_dim // g, g, out_dim)
    amax = jnp.max(jnp.abs(w3), axis=1)  # (IN//G, OUT)
    scales = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(
        jnp.round(w3 / scales[:, None, :]), -7, 7
    ).astype(jnp.int8).reshape(in_dim, out_dim)
    return pack_from_int4_values(q, scales)


def pack_from_int4_values(
    q: jnp.ndarray, scales: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble the packed layout from already-quantized signed int4 values
    ``q`` (IN, OUT) in [-8, 7] and per-group scales (IN//G, OUT) — the
    exact, lossless import path for symmetric GPTQ checkpoints.

    Byte rows pair logical rows (2i, 2i+1): low nibble first, matching the
    hardware bitcast order."""
    lo, hi = q[0::2].astype(jnp.int8), q[1::2].astype(jnp.int8)
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0xF)), jnp.left_shift(hi, 4)
    ).astype(jnp.int8)
    return packed, scales.astype(jnp.float32)


def unpack_values(packed: jnp.ndarray) -> jnp.ndarray:
    """packed (IN//2, OUT) int8 -> logical int values (IN, OUT) int32."""
    p32 = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
    hi = jnp.right_shift(p32, 4)
    half, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * half, out)


def dequantize(
    packed: jnp.ndarray, scales: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Reference dequant -> (IN, OUT) in ``dtype`` (CPU fallback / tests)."""
    q = unpack_values(packed)
    in_dim, out_dim = q.shape
    ng = scales.shape[0]
    g = in_dim // ng
    w = q.astype(jnp.float32).reshape(ng, g, out_dim) * scales[:, None, :]
    return w.reshape(in_dim, out_dim).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _kernel(x_ref, p_ref, s_ref, y_ref, acc, *, n_in, group):
    ii = pl.program_id(2)

    @pl.when(ii == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    pkb, nb = p_ref.shape  # packed rows = kb // 2
    kb = 2 * pkb
    gpb = kb // group  # groups (and K-tiles) per in-block
    w4 = pltpu.bitcast(p_ref[:], jnp.int4)  # (kb, nb) int4 view, free
    x = x_ref[:]
    dn = (((1,), (0,)), ((), ()))
    for g in range(gpb):
        xg = x[:, g * group:(g + 1) * group]
        wg = w4[g * group:(g + 1) * group, :]
        d = jax.lax.dot_general(xg, wg, dn, preferred_element_type=jnp.float32)
        acc[:] += d * s_ref[0, g, :][None, :]

    @pl.when(ii == n_in - 1)
    def _flush():
        y_ref[:] = acc[:].astype(y_ref.dtype)


def _kernel_a8(x_ref, p_ref, s_ref, xs_ref, y_ref, acc, *, n_in, group):
    """int8-activation variant: x is per-row-quantized int8 and the dot
    runs int8 x int8 -> int32 on the MXU (v5e int8 MXU throughput is 2x
    bf16 — the prefill-side FLOP lever, VERDICT r2 item 2).  Mosaic has no
    int8 x int4 matmul (tpu.matmul rejects the operand pair — measured on
    chip), so the int4 weight view converts to int8 in-kernel; group
    weight scales apply on the f32 accumulator, per-row activation scales
    at flush."""
    ii = pl.program_id(2)

    @pl.when(ii == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    pkb, nb = p_ref.shape
    kb = 2 * pkb
    gpb = kb // group
    w8 = pltpu.bitcast(p_ref[:], jnp.int4).astype(jnp.int8)
    x = x_ref[:]
    dn = (((1,), (0,)), ((), ()))
    for g in range(gpb):
        xg = x[:, g * group:(g + 1) * group]
        wg = w8[g * group:(g + 1) * group, :]
        d = jax.lax.dot_general(xg, wg, dn, preferred_element_type=jnp.int32)
        acc[:] += d.astype(jnp.float32) * s_ref[0, g, :][None, :]

    @pl.when(ii == n_in - 1)
    def _flush():
        y_ref[:] = (acc[:] * xs_ref[:, 0][:, None]).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def int4_matmul_a8(
    x_q: jnp.ndarray,  # (R, IN) int8 per-row-quantized activations
    x_scale: jnp.ndarray,  # (R,) float32
    packed: jnp.ndarray,  # (IN//2, OUT) int8
    scales: jnp.ndarray,  # (IN//G, OUT) float32
    *,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = diag(x_scale) @ (x_q @ dequant(packed, scales)) -> (R, OUT).

    Same tiling as int4_matmul; activations stream as int8 (half the HBM
    bytes of bf16) and the MXU ingests int8 x int4 natively."""
    r, in_dim = x_q.shape
    out_dim = packed.shape[1]
    ng = scales.shape[0]
    group = in_dim // ng

    if r <= 512:
        bb = -(-r // 16) * 16
    else:
        bb = 512
    kb, nb = _plan_tiles(in_dim, out_dim, group, bb)
    while (kb == 0 or nb == 0) and bb > 16:
        bb = max(16, bb // 2)
        kb, nb = _plan_tiles(in_dim, out_dim, group, bb)
    if kb == 0 or nb == 0:
        raise ValueError(
            f"int4_matmul_a8: no block tiling for IN={in_dim} OUT={out_dim} "
            f"G={group}"
        )
    r_pad = -(-r // bb) * bb
    if r_pad > r:
        x_q = jnp.pad(x_q, ((0, r_pad - r), (0, 0)))
        x_scale = jnp.pad(x_scale, (0, r_pad - r))
    xs2 = x_scale.astype(jnp.float32)[:, None]  # (R, 1) — lane-friendly

    gpb = kb // group
    n_b, n_out, n_in = r_pad // bb, out_dim // nb, in_dim // kb
    scales3 = scales.reshape(n_in, gpb, out_dim)

    y = pl.pallas_call(
        functools.partial(_kernel_a8, n_in=n_in, group=group),
        grid=(n_b, n_out, n_in),
        in_specs=[
            pl.BlockSpec((bb, kb), lambda bi, oi, ii: (bi, ii)),
            pl.BlockSpec((kb // 2, nb), lambda bi, oi, ii: (ii, oi)),
            pl.BlockSpec((1, gpb, nb), lambda bi, oi, ii: (ii, 0, oi)),
            pl.BlockSpec((bb, 1), lambda bi, oi, ii: (bi, 0)),
        ],
        out_specs=pl.BlockSpec((bb, nb), lambda bi, oi, ii: (bi, oi)),
        out_shape=jax.ShapeDtypeStruct((r_pad, out_dim), out_dtype),
        scratch_shapes=[pltpu.VMEM((bb, nb), jnp.float32)],
        interpret=interpret,
    )(x_q, packed, scales3, xs2)
    return y[:r] if r_pad > r else y


def _divisors(n: int):
    out = []
    for d in range(1, int(n ** 0.5) + 1):
        if n % d == 0:
            out.append(d)
            if d != n // d:
                out.append(n // d)
    return sorted(out)


@functools.lru_cache(maxsize=None)
def _plan_tiles(in_dim: int, out_dim: int, group: int, bb: int):
    """Pick (kb, nb) block sizes: divisor-aligned (no padding, no overhang),
    as LARGE as the VMEM budget allows.

    Grid-step count is what matters on v5e: each Mosaic grid step carries
    ~0.35 us of fixed overhead (measured via the lm_head shape: 1386 steps
    at nb<=1024 cost ~480 us over the HBM roofline; 72 steps put the kernel
    within ~10% of it).  So minimize steps = (IN/kb)*(OUT/nb) subject to the
    double-buffered working set fitting in ~12 MB of the core's 16 MB VMEM.
    """
    ng = in_dim // group
    lanes = out_dim // 128
    budget = 12 * 1024 * 1024
    best = None
    for dk in _divisors(ng):
        kb = group * dk
        for dn in _divisors(lanes):
            nb = 128 * dn
            wb = (kb // 2) * nb            # packed weight block, int8
            xb = bb * kb * 2               # activation block, bf16
            sb = dk * nb * 4               # scales block, f32
            ob = bb * nb * 2               # output block
            acc = bb * nb * 4              # f32 scratch
            total = 2 * (wb + xb + sb) + 2 * ob + acc
            if total > budget:
                continue
            steps = (in_dim // kb) * (out_dim // nb)
            key = (steps, -nb, -kb)
            if best is None or key < best[0]:
                best = (key, (kb, nb))
    return best[1] if best else (0, 0)


def supported(in_dim: int, out_dim: int, group: int = DEFAULT_GROUP) -> bool:
    # Validate tiling at the LARGEST row block callers use (512: prefill and
    # mixed-step rows) — a plan that only fits at small bb would pass here
    # and then raise inside jit at serve time (e.g. group_size=-1 exports
    # where kb is forced to in_dim).  int4_matmul also degrades bb itself,
    # so this is belt-and-braces.
    if out_dim % 128 != 0 or in_dim % group != 0 or in_dim % 2 != 0:
        return False
    kb, nb = _plan_tiles(in_dim, out_dim, group, 512)
    return kb > 0 and nb > 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(
    x: jnp.ndarray,  # (R, IN)
    packed: jnp.ndarray,  # (IN//2, OUT) int8
    scales: jnp.ndarray,  # (IN//G, OUT) float32
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant(packed, scales) -> (R, OUT) in x's dtype.

    HBM weight traffic is the packed bytes (IN*OUT/2) + scales; the MXU
    consumes the int4 view directly (hardware ingest, no VPU unpack).
    """
    r, in_dim = x.shape
    out_dim = packed.shape[1]
    ng = scales.shape[0]
    group = in_dim // ng

    # Row blocking: small-to-medium R (decode and MIXED prefill+decode rows,
    # up to 512) runs as ONE row block — a second row block would stream
    # every weight byte twice, doubling the HBM-bound step time.  Larger R
    # (prefill) tiles at 512.
    if r <= 512:
        bb = -(-r // 16) * 16
    else:
        bb = 512
    kb, nb = _plan_tiles(in_dim, out_dim, group, bb)
    # Large-group shapes (e.g. group_size=-1 GPTQ: one group, kb == in_dim)
    # can fit VMEM only at smaller row blocks: degrade bb instead of raising
    # inside jit (weights then stream once per row block — slower, correct).
    while (kb == 0 or nb == 0) and bb > 16:
        bb = max(16, bb // 2)
        kb, nb = _plan_tiles(in_dim, out_dim, group, bb)
    if kb == 0 or nb == 0:
        raise ValueError(
            f"int4_matmul: no block tiling for IN={in_dim} OUT={out_dim} G={group}"
        )
    r_pad = -(-r // bb) * bb
    if r_pad > r:
        x = jnp.pad(x, ((0, r_pad - r), (0, 0)))

    gpb = kb // group
    n_b, n_out, n_in = r_pad // bb, out_dim // nb, in_dim // kb
    scales3 = scales.reshape(n_in, gpb, out_dim)

    y = pl.pallas_call(
        functools.partial(_kernel, n_in=n_in, group=group),
        grid=(n_b, n_out, n_in),
        in_specs=[
            pl.BlockSpec((bb, kb), lambda bi, oi, ii: (bi, ii)),
            pl.BlockSpec((kb // 2, nb), lambda bi, oi, ii: (ii, oi)),
            pl.BlockSpec((1, gpb, nb), lambda bi, oi, ii: (ii, 0, oi)),
        ],
        out_specs=pl.BlockSpec((bb, nb), lambda bi, oi, ii: (bi, oi)),
        out_shape=jax.ShapeDtypeStruct((r_pad, out_dim), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, nb), jnp.float32)],
        interpret=interpret,
    )(x, packed, scales3)
    return y[:r] if r_pad > r else y


# ---------------------------------------------------------------------------
# Tensor-parallel wrapper: a bare pallas_call has no GSPMD partitioning
# rule, so under a (dp, tp) mesh the matmul runs through shard_map with the
# Megatron layout — column-parallel (qkv/gate_up/lm_head: out dim over tp,
# x replicated) or row-parallel (o/down: in dim over tp, psum after).
# ---------------------------------------------------------------------------

def supported_tp(mesh, in_dim: int, out_dim: int, group: int,
                 kind: str) -> bool:
    """Whether per-shard shapes still tile for the kernel."""
    from chatts_tpu.parallel.mesh import MODEL_AXIS

    tp = mesh.shape.get(MODEL_AXIS, 1)
    if kind == "col":
        return out_dim % tp == 0 and supported(in_dim, out_dim // tp, group)
    if kind == "row":
        ng = in_dim // group
        return (in_dim % tp == 0 and ng % tp == 0
                and supported(in_dim // tp, out_dim, group))
    return False


def int4_matmul_tp(
    x: jnp.ndarray,  # (R, IN)
    packed: jnp.ndarray,  # (IN//2, OUT) int8, tp-sharded per `kind`
    scales: jnp.ndarray,  # (IN//G, OUT) float32
    *,
    mesh,
    kind: str,  # "col" | "row"
    interpret: bool = False,
) -> jnp.ndarray:
    from jax.sharding import PartitionSpec as P

    from chatts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if kind == "col":
        in_specs = (P(None, None), P(None, MODEL_AXIS), P(None, MODEL_AXIS))
        out_specs = P(None, MODEL_AXIS)

        def fn(xs, ps, ss):
            return int4_matmul(xs, ps, ss, interpret=interpret)
    else:
        in_specs = (P(None, MODEL_AXIS), P(MODEL_AXIS, None),
                    P(MODEL_AXIS, None))
        out_specs = P(None, None)

        def fn(xs, ps, ss):
            y = int4_matmul(xs, ps, ss, interpret=interpret)
            return jax.lax.psum(y, MODEL_AXIS)

    # check_vma=False: pallas_call declares no varying-mesh-axes metadata.
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(x, packed, scales)
