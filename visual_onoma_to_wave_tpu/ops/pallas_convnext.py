"""Pallas TPU kernel: fused ConvNeXt block for the Vocos trunk.

One VMEM pass per batch item computes the whole ConvNeXt block of
`models/vocos.py` (depthwise k=7 conv -> LayerNorm -> Linear C->M ->
tanh-GELU -> Linear M->C -> layer-scale residual) that XLA otherwise
executes as a chain of HBM-resident intermediates. The block's FLOPs
(the two pointwise matmuls) are ~8.4 ms of MXU time at the serving shape
(B=128, T=512, C=512, M=1536) but the XLA forward measures ~17 ms of
trunk time: the f32 LayerNorm statistics, the (T, 1536) GELU and the
residual chain are HBM-bound (~1.3 GB of traffic per block vs the
~0.14 GB minimum). This kernel keeps everything for one item resident
in VMEM:

  * grid = (B,): one batch item per step, full (T, C) tile — the
    depthwise conv's SAME zero-padding is item-local, so there is no
    inter-tile halo at all (contrast with ops/pallas_mrf.py, whose
    cross-tile streaming state was the measured loss there).
  * The k=7 depthwise conv is 7 statically-shifted fused
    multiply-accumulates on the VPU (f32 accumulator), not a conv op.
  * LayerNorm stats in f32 in-register (matching the module's f32-stats
    rule), output cast back to the compute dtype.
  * Both matmuls hit the MXU at (512,512)@(512,1536) / (T,1536)@(1536,512)
    with `preferred_element_type=f32` accumulation — identical numerics
    to XLA's bf16 matmul with f32 accumulation.
  * Weights use constant index maps, so Mosaic keeps them resident in
    VMEM across the grid instead of re-fetching per item.

Per step the kernel moves ~1 MB (x in, y out) and computes ~1.6 GFLOP —
compute-bound by construction. The jnp reference implementation is
`models/vocos.py::ConvNeXtBlock`; `tests/test_pallas_convnext.py` pins
interpret-mode parity and `benchmarks/bench_vocos_kernel.py` measures the
compiled kernel on the TPU. Inference-only: no custom VJP is defined
(training keeps the XLA path; reference anchor for the vocoder slot:
scripts/utils/model.py:41-98).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_rows(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """x[:, t + d] with zero padding at each item's sequence edges,
    x: (I, T, C). Static d — lowers to a strided sublane copy per item,
    no roll needed, and items never leak into each other."""
    if d == 0:
        return x
    z = jnp.zeros((x.shape[0], abs(d), x.shape[2]), x.dtype)
    if d > 0:
        return jnp.concatenate([x[:, d:], z], axis=1)
    return jnp.concatenate([z, x[:, :d]], axis=1)


def _block_kernel(x_ref, dw_ref, db_ref, ls_ref, lb_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, g_ref, y_ref, *, kernel_size: int,
                  eps: float):
    x = x_ref[:]                                  # (I, T, C) compute dtype
    I, T, C = x.shape
    half = (kernel_size - 1) // 2

    # depthwise conv: 7 shifted FMAs, f32 accumulator (= XLA conv accum)
    acc = jnp.zeros(x.shape, jnp.float32)
    for k in range(kernel_size):
        shifted = _shift_rows(x, k - half).astype(jnp.float32)
        acc = acc + shifted * dw_ref[k][None, None, :].astype(jnp.float32)
    h = acc + db_ref[0][None, None, :]            # f32 (I, T, C)

    # LayerNorm over features, f32 stats (models/vocos.py::_layer_norm)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    h = h * ls_ref[0][None, None, :] + lb_ref[0][None, None, :]
    h = h.reshape(I * T, C).astype(x.dtype)       # merge leading dims for MXU

    # pointwise C->M, tanh GELU, M->C — MXU with f32 accumulation
    a = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    a = a + b1_ref[0][None, :]
    a = jax.nn.gelu(a, approximate=True).astype(x.dtype)
    o = jnp.dot(a, w2_ref[:], preferred_element_type=jnp.float32)
    o = o + b2_ref[0][None, :]

    y = x.reshape(I * T, C).astype(jnp.float32) + g_ref[0][None, :] * o
    y_ref[:] = y.reshape(I, T, C).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("eps", "interpret", "items_per_step"))
def convnext_block(x: jnp.ndarray, dw: jnp.ndarray, db: jnp.ndarray,
                   ls: jnp.ndarray, lb: jnp.ndarray, w1: jnp.ndarray,
                   b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                   gamma: jnp.ndarray, eps: float = 1e-6,
                   items_per_step: int = 2,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused ConvNeXt block. x: (B, T, C); dw: (K, 1, C) or (K, C);
    w1: (C, M); w2: (M, C); 1-D per-channel params as in
    models/vocos.py::ConvNeXtBlock. Returns (B, T, C) in x.dtype.

    items_per_step: batch items per grid step — amortizes per-step
    overhead at the cost of VMEM working set (falls back to the largest
    divisor of B; measured on v5e in benchmarks/bench_vocos_kernel.py,
    Mosaic rejects the call outright if the tile exceeds VMEM).

    Constraints (asserted): T multiple of 16, C/M multiples of 128 —
    the default Vocos sizes (T=512 serving frames, C=512, M=1536)
    satisfy them; pad T upstream for ragged serving tails.
    """
    B, T, C = x.shape
    M = w1.shape[1]
    K = dw.shape[0]
    if dw.ndim == 3:                                    # flax (K, 1, C) form
        dw = dw.reshape(K, C)
    if T % 16 or C % 128 or M % 128:
        raise ValueError(
            f"convnext_block needs T%16==0, C%128==0, M%128==0; got "
            f"T={T}, C={C}, M={M}")
    I = items_per_step
    while I > 1 and B % I:
        I //= 2

    cdt = x.dtype
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)   # (1, C)/(1, M)
    const = lambda b: (0, 0)

    return pl.pallas_call(
        functools.partial(_block_kernel, kernel_size=K, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, C), cdt),
        grid=(B // I,),
        in_specs=[
            pl.BlockSpec((I, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((C, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((I, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.astype(cdt), dw.astype(cdt), row(db), row(ls), row(lb),
      w1.astype(cdt), row(b1), w2.astype(cdt), row(b2), row(gamma))
