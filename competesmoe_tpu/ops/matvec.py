"""Pallas small-M matmul for TPU decode weight streaming.

Why
---
Autoregressive decode is a chain of weight-bandwidth-bound matmuls with a
tiny M (the batch): [B, K] x [K, N] with B ~ 1-16. XLA's TPU GEMM at
these shapes streams the weight matrix at only ~381 GB/s (measured on
v5e, 2026-08-17, [8,3072]x[3072,9216] bf16, slope method over a 1.8 GB
32-matrix chain so nothing caches in VMEM). This kernel — a plain
blocked matmul whose (block_k, block_n) weight tiles are auto-pipelined
HBM->VMEM by Pallas — streams the same weights at ~834 GB/s (91% of the
chip's measured 921 GB/s sequential-read bandwidth), 2.2x faster per
matmul. The MXU is ~94% idle either way (M=8 uses 8 of 128 rows); the
kernel simply keeps the DMA engines saturated, which XLA's generic
emitter does not at small M.

Used by the decoder (`models/decoder.py:_make_dense`) for single-token
decode steps; prefill and training shapes (large M) stay on XLA's GEMM,
which is the right tool there. The int8 variant folds the per-channel
dequantize into the operand read, halving the streamed bytes
(`quant_small_m_matmul`).

Reference role: this is the TPU analog of the reference's serving-side
reliance on HF/CUDA fused decode GEMMs (moe_model/serve/model_worker.py
generate path); the reference has no custom kernel here — this is pure
headroom over it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max M for which the Pallas path is used; above this XLA's GEMM is
# compute-efficient and wins.
MAX_SMALL_M = 32
# Quantized kernels get a higher cap: XLA has NO lowering that streams
# int8/packed-int4 bytes at full bandwidth (the fallbacks read
# dequantized or twice-read traffic), so the Pallas path stays the
# bandwidth winner well past M=32. Compute stays sub-dominant up to
# M~128 (time_compute/time_bw = M/236 at the measured 834 GB/s), which
# is exactly the speculative-verify regime: M = batch*(1+k) = 40 at the
# serving default, where falling back doubled the int4 weight stream
# (the 2.13x verify premium in docs/perf.md's spec-step table).
MAX_QUANT_M = 128
_BLOCK_K = (512, 1024, 256, 128)
_BLOCK_N = (1024, 512, 256, 128)   # Pallas TPU: last block dim % 128 == 0


def _pick(block_options, dim):
    for b in block_options:
        if dim % b == 0:
            return b
    return None


def _m_ok(m: int, cap: int) -> bool:
    # above the classic small-M regime, require sublane alignment so the
    # (m, block_k) operand tiles stay Mosaic-friendly
    return m <= min(MAX_SMALL_M, cap) or (m % 8 == 0 and m <= cap)


def small_m_viable(m: int, k: int, n: int,
                   max_m: int = MAX_SMALL_M) -> bool:
    return (_m_ok(m, max_m)
            and _pick(_BLOCK_K, k) is not None
            and _pick(_BLOCK_N, n) is not None)


def _mm_kernel(x_ref, w_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], w_ref[...],
                            preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _qmm_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(x_ref.dtype)
    acc_ref[...] += jnp.dot(x_ref[...], w,
                            preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        # per-output-channel dequant folded into the epilogue: the int8
        # weight block is multiplied once by x, the scale once per output
        out_ref[...] = (acc_ref[...]
                        * s_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def small_m_matmul(x: jax.Array, w: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """[M, K] x [K, N] -> [M, N] with Pallas-pipelined weight streaming.

    Requires small_m_viable(M, K, N). Accumulates in f32; output in
    x.dtype (matches jnp.dot(..., preferred_element_type=f32).astype).
    """
    m, kdim = x.shape
    _, n = w.shape
    bk, bn = _pick(_BLOCK_K, kdim), _pick(_BLOCK_N, n)
    n_k = kdim // bk
    return pl.pallas_call(
        functools.partial(_mm_kernel, n_k=n_k),
        grid=(n // bn, n_k),
        in_specs=[pl.BlockSpec((m, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((m, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        interpret=interpret,
    )(x, w)


def small_m_viable_int4(m: int, k: int, n: int) -> bool:
    """Viability of the packed-int4 kernel: the K blocks tile the PACKED
    rows (k//2). Cap is MAX_QUANT_M (not MAX_SMALL_M): the fallback pays
    int8-equivalent traffic, so the kernel must cover the speculative
    verify shapes (M = batch*(1+k))."""
    return (_m_ok(m, MAX_QUANT_M) and k % 2 == 0
            and _pick(_BLOCK_K, k // 2) is not None
            and _pick(_BLOCK_N, n) is not None)


def _qmm4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, out_ref, acc_ref, *,
                 n_k: int):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # unpack the nibble-packed block IN VMEM (int32 shift ops sign-extend
    # reliably across Mosaic versions): low nibble = original rows
    # [0, K/2), high nibble = rows [K/2, K) — pack_int4's split-half
    # convention, so each half contracts against its own x slice.
    p = w_ref[...].astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(xlo_ref.dtype)
    hi = (p >> 4).astype(xlo_ref.dtype)
    acc_ref[...] += jnp.dot(xlo_ref[...], lo,
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jnp.dot(xhi_ref[...], hi,
                            preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        out_ref[...] = (acc_ref[...]
                        * s_ref[...].astype(jnp.float32)
                        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_small_m_matmul_int4(x: jax.Array, w_packed: jax.Array,
                              scale: jax.Array,
                              interpret: bool = False) -> jax.Array:
    """[M, K] x nibble-packed int4 [K//2, N] * scale [N] -> [M, N]
    (w4a16 decode path — models/decoder.py:pack_int4 split-half layout).

    Streams HALF the bytes of the int8 kernel: the packed block is
    unpacked in VMEM with vector shifts and contracted as
    x[:, :K/2] @ low + x[:, K/2:] @ high. XLA cannot do this without
    materializing the unpacked matrix (measured 59.8 ms/step vs 6.8 for
    int8 at the 5.1B geometry — the concat defeats operand-read fusion),
    which is precisely why this kernel exists.
    """
    m, kdim = x.shape
    half, n = w_packed.shape
    bk, bn = _pick(_BLOCK_K, half), _pick(_BLOCK_N, n)
    n_k = half // bk
    return pl.pallas_call(
        functools.partial(_qmm4_kernel, n_k=n_k),
        grid=(n // bn, n_k),
        in_specs=[pl.BlockSpec((m, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((m, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
                  pl.BlockSpec((1, bn), lambda j, k: (0, j))],
        out_specs=pl.BlockSpec((m, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        interpret=interpret,
    )(x[:, :kdim // 2], x[:, kdim // 2:], w_packed, scale.reshape(1, n))


@functools.partial(jax.jit, static_argnames=("interpret",))
def quant_small_m_matmul(x: jax.Array, w_q: jax.Array, scale: jax.Array,
                         interpret: bool = False) -> jax.Array:
    """[M, K] x int8 [K, N] * scale [N] -> [M, N] (w8a16 decode path).

    Streams the weights as int8 (half the bytes of bf16) and applies the
    per-output-channel dequant scale in the f32 epilogue — numerically
    identical to XLA's (w.astype(bf16) * scale) @ x contraction up to
    f32 accumulation order.
    """
    m, kdim = x.shape
    _, n = w_q.shape
    bk, bn = _pick(_BLOCK_K, kdim), _pick(_BLOCK_N, n)
    n_k = kdim // bk
    return pl.pallas_call(
        functools.partial(_qmm_kernel, n_k=n_k),
        grid=(n // bn, n_k),
        in_specs=[pl.BlockSpec((m, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j)),
                  pl.BlockSpec((1, bn), lambda j, k: (0, j))],
        out_specs=pl.BlockSpec((m, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        interpret=interpret,
    )(x, w_q, scale.reshape(1, n))
