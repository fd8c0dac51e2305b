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


def _block_math(x, dwk, db, ls, lb, w1, b1, w2, b2, g, *, kernel_size: int,
                eps: float):
    """One ConvNeXt block on VMEM-resident values. x: (I, T, C) compute
    dtype; dwk: (K, C); per-channel vectors (C,)/(M,) f32; w1: (C, M),
    w2: (M, C) compute dtype. Returns (I, T, C) in x.dtype."""
    I, T, C = x.shape
    half = (kernel_size - 1) // 2

    # depthwise conv: K shifted FMAs, f32 accumulator (= XLA conv accum)
    acc = jnp.zeros(x.shape, jnp.float32)
    for k in range(kernel_size):
        shifted = _shift_rows(x, k - half).astype(jnp.float32)
        acc = acc + shifted * dwk[k][None, None, :].astype(jnp.float32)
    h = acc + db[None, None, :]                   # f32 (I, T, C)

    # LayerNorm over features, f32 stats (models/vocos.py::_layer_norm)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    h = h * ls[None, None, :] + lb[None, None, :]
    h = h.reshape(I * T, C).astype(x.dtype)       # merge leading dims for MXU

    # pointwise C->M, tanh GELU, M->C — MXU with f32 accumulation
    a = jnp.dot(h, w1, preferred_element_type=jnp.float32)
    a = a + b1[None, :]
    a = jax.nn.gelu(a, approximate=True).astype(x.dtype)
    o = jnp.dot(a, w2, preferred_element_type=jnp.float32)
    o = o + b2[None, :]

    y = x.reshape(I * T, C).astype(jnp.float32) + g[None, :] * o
    return y.reshape(I, T, C).astype(x.dtype)


def _block_kernel(x_ref, dw_ref, db_ref, ls_ref, lb_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref, g_ref, y_ref, *, kernel_size: int,
                  eps: float):
    y_ref[:] = _block_math(
        x_ref[:], dw_ref[:], db_ref[0], ls_ref[0], lb_ref[0], w1_ref[:],
        b1_ref[0], w2_ref[:], b2_ref[0], g_ref[0],
        kernel_size=kernel_size, eps=eps)


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


# ---------------------------------------------------------------------------
# Whole-trunk mega-kernel: all L blocks in one pallas_call.
#
# The per-block kernel above still round-trips the (B, T, C) activation
# through HBM between blocks (8 x 134 MB at the serving shape) and pays a
# pallas_call launch per block. Here the activation stays RESIDENT in VMEM
# across all L blocks and only the weights stream: the (L, C, M)/(L, M, C)
# pointwise matrices live in HBM and are double-buffer DMA'd one block
# ahead (the guide's double-buffering pattern), so the ~3.2 MB/block weight
# fetch overlaps the ~8 us/block of MXU work. Per grid step (one batch
# item): ~13 GFLOP of compute vs ~1 MB of activation I/O.
# ---------------------------------------------------------------------------


def _trunk_kernel(x_ref, dw_ref, vec_ref, b1_ref, w1_hbm, w2_hbm, y_ref,
                  w1_buf, w2_buf, sems, *, n_layers: int, kernel_size: int,
                  eps: float):
    def dmas(layer, slot):
        return (pltpu.make_async_copy(w1_hbm.at[layer], w1_buf.at[slot],
                                      sems.at[slot, 0]),
                pltpu.make_async_copy(w2_hbm.at[layer], w2_buf.at[slot],
                                      sems.at[slot, 1]))

    for c in dmas(0, 0):
        c.start()
    x = x_ref[:]                                   # (I, T, C), stays in VMEM
    for l in range(n_layers):                      # static unroll
        if l + 1 < n_layers:
            for c in dmas(l + 1, (l + 1) % 2):
                c.start()
        for c in dmas(l, l % 2):
            c.wait()
        x = _block_math(
            x, dw_ref[l], vec_ref[l, 0], vec_ref[l, 1], vec_ref[l, 2],
            w1_buf[l % 2], b1_ref[l], w2_buf[l % 2], vec_ref[l, 3],
            vec_ref[l, 4], kernel_size=kernel_size, eps=eps)
    y_ref[:] = x


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def convnext_trunk(x: jnp.ndarray, dw: jnp.ndarray, db: jnp.ndarray,
                   ls: jnp.ndarray, lb: jnp.ndarray, w1: jnp.ndarray,
                   b1: jnp.ndarray, w2: jnp.ndarray, b2: jnp.ndarray,
                   gamma: jnp.ndarray, eps: float = 1e-6,
                   interpret: bool = False) -> jnp.ndarray:
    """All L ConvNeXt blocks fused into one kernel (activation-stationary).

    x: (B, T, C); stacked per-block params with a leading L dim:
    dw (L, K, 1, C) or (L, K, C); db/ls/lb/b2/gamma (L, C); b1 (L, M);
    w1 (L, C, M); w2 (L, M, C). Same numerics as L sequential
    convnext_block calls. Same T/C/M alignment constraints.
    """
    B, T, C = x.shape
    L, _, M = w1.shape
    if dw.ndim == 4:                                   # flax (L, K, 1, C)
        dw = dw.reshape(L, dw.shape[1], C)
    K = dw.shape[1]
    if T % 16 or C % 128 or M % 128:
        raise ValueError(
            f"convnext_trunk needs T%16==0, C%128==0, M%128==0; got "
            f"T={T}, C={C}, M={M}")

    cdt = x.dtype
    # small per-channel params: (L, 5, C) f32, VMEM-resident
    vec = jnp.stack([db, ls, lb, b2, gamma], axis=1).astype(jnp.float32)
    const = lambda b: (0, 0)
    const3 = lambda b: (0, 0, 0)

    return pl.pallas_call(
        functools.partial(_trunk_kernel, n_layers=L, kernel_size=K,
                          eps=eps),
        out_shape=jax.ShapeDtypeStruct((B, T, C), cdt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, K, C), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 5, C), const3, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # w1 stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),         # w2 stays in HBM
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, M), cdt),
            pltpu.VMEM((2, M, C), cdt),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(x.astype(cdt), dw.astype(cdt), vec, b1.astype(jnp.float32),
      w1.astype(cdt), w2.astype(cdt))
