"""Fused Pallas kernel for HiFi-GAN's small-channel MRF stages.

STATUS: measured NEGATIVE result, kept as evidence — do not wire into the
generator. On a real v5e at C=32 (B=128, T=131072, bf16) this kernel runs
the full MRF stage at 42 TFLOPS vs XLA's 56 TFLOPS (0.75x). It is NOT used
by `models/hifigan.py`; it exists to document, with a real measurement,
why the small-channel stages are a structural wall (see docs/PERF.md).

Background: the multi-receptive-field residual stack of the reference
vocoder (scripts/hifigan/models.py:20-109 ResBlock + :154-160 fusion) has
stages at C=64/C=32 where XLA's conv-as-matmul lowering fills only 64/128
or 32/128 MXU output lanes (measured 60% / 35% of bf16 peak,
benchmarks/bench_vocoder_stages.py).

Design tried here ("time-in-lanes"): operate on (B, C, T) blocks with the
TIME axis on the 128-wide lane dimension so lane occupancy no longer
depends on channel count. Each dilated conv becomes one matmul

    out[co, t] = sum_{ci,j} W[co, (j,ci)] * x[ci, t + (j - (k-1)/2) * d]

with the (k*C, T_tile) right operand built from lane-rolls of the resident
block; all 18 convs of a stage + elementwise run in one VMEM pass (the
activation crosses HBM twice instead of ~36 times).

Why it loses anyway: at C=32 the per-conv matmul is tiny (k*C^2 MACs per
position) while the roll+concat stack build moves k*C f32 values per
position through the VPU — ~2x the MXU time even at peak — and the M=C=32
streaming dimension halves MXU efficiency on top. The alternative
formulations fare no better on paper: time-packed lanes with
block-Toeplitz weights inflates FLOPs 2.57x (86%/2.57 = 33% effective),
batch-in-lanes block-banded GEMM has the same inflation. Every layout
lands at 30-40% of peak, which is what XLA already achieves.

Exactness (verified, tests/test_pallas_mrf.py): sequence-edge semantics
match the per-conv zero padding of the XLA path (`models/hifigan.py
_conv1d`) by masking every conv output to the valid [0, T) range; interior
blocks overlap by a 128-lane halo covering the stage's 60-frame receptive
half-width, so block seams are exact. Matmul operands are cast to the
compute dtype and accumulate in f32 (activations stay in f32 registers —
Mosaic's lane-rotate is 32-bit only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 128  # lane-aligned halo; must cover the stage receptive half-width


def stage_halo(kernel_sizes, dilations) -> int:
    """One-sided receptive half-width of one MRF stage in frames."""
    return max(
        sum((d + 1) * (k - 1) // 2 for d in ds)
        for k, ds in zip(kernel_sizes, dilations)
    )


def pack_mrf_weights(stage_params: dict, kernel_sizes, dilations):
    """Pack one stage's flax ResBlock params for the fused kernel.

    stage_params: {f"resblock_{j}": {convs1_{i}_w/b, convs2_{i}_w/b}} with
    conv weights in HIO (k, Cin, Cout) layout (models/hifigan.py).

    Returns ([A_0, A_1, A_2], biases) where A_b is (6, C, k_b*C) holding the
    branch's convs in execution order (c1 d0, c2 d0, c1 d1, ...) as
    A[co, j*C + ci] = w[j, ci, co], and biases is (n_branches*6, C, 1) f32.
    """
    mats, biases = [], []
    for b, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        p = stage_params[f"resblock_{b}"]
        rows = []
        for i in range(len(ds)):
            for cname in (f"convs1_{i}", f"convs2_{i}"):
                w = np.asarray(p[f"{cname}_w"])          # (k, Cin, Cout)
                c = w.shape[1]
                rows.append(w.transpose(2, 0, 1).reshape(c, k * c))
                biases.append(np.asarray(p[f"{cname}_b"], np.float32))
        mats.append(np.stack(rows))                       # (6, C, k*C)
    bias = np.stack(biases)[:, :, None]                   # (18, C, 1)
    return mats, bias


def _mrf_kernel(xl_ref, xc_ref, xr_ref, *refs,
                kernel_sizes, dilations, t_tile, t_total, dtype):
    # Activations live in f32 registers (Mosaic's lane-rotate is 32-bit
    # only); matmul operands are cast to the compute dtype, so the MXU
    # work runs at bf16 rate when dtype=bfloat16 and the result stays
    # within bf16 rounding of the XLA `_conv1d` chain.
    n_br = len(kernel_sizes)
    w_refs, b_ref, o_ref = refs[:n_br], refs[n_br], refs[n_br + 1]
    x = jnp.concatenate([xl_ref[0], xc_ref[0], xr_ref[0]],
                        axis=1).astype(jnp.float32)
    c, w_lanes = x.shape
    j = pl.program_id(1)
    pos = (jax.lax.broadcasted_iota(jnp.int32, (1, w_lanes), 1)
           + j * t_tile - HALO)
    valid = jnp.logical_and(pos >= 0, pos < t_total)

    def conv(h, branch, conv_idx, k, d):
        """One dilated conv: stack k lane-rolled copies, single matmul."""
        off0 = -d * (k - 1) // 2
        rows = [pltpu.roll(h, (-(off0 + jj * d)) % w_lanes, axis=1)
                for jj in range(k)]
        stack = jnp.concatenate(rows, axis=0).astype(dtype)  # (k*C, W)
        a = w_refs[branch][conv_idx]                         # (C, k*C)
        out = jax.lax.dot_general(
            a, stack, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out + b_ref[6 * branch + conv_idx]
        return jnp.where(valid, out, jnp.zeros_like(out))

    acc = None
    for b, (k, ds) in enumerate(zip(kernel_sizes, dilations)):
        y = x
        for i, d in enumerate(ds):
            h = jax.nn.leaky_relu(y, 0.1)
            h = conv(h, b, 2 * i, k, d)
            h = jax.nn.leaky_relu(h, 0.1)
            h = conv(h, b, 2 * i + 1, k, 1)
            y = y + h
        acc = y if acc is None else acc + y
    out = (acc / n_br).astype(o_ref.dtype)
    o_ref[0] = out[:, HALO:HALO + t_tile]


@functools.partial(
    jax.jit,
    static_argnames=("kernel_sizes", "dilations", "t_tile", "interpret",
                     "dtype"),
)
def mrf_stage_fused(
    x: jnp.ndarray,
    w3: jnp.ndarray, w7: jnp.ndarray, w11: jnp.ndarray,
    biases: jnp.ndarray,
    kernel_sizes: tuple[int, ...] = (3, 7, 11),
    dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3,
    t_tile: int = 2048,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused MRF stage. x: (B, C, T) -> (B, C, T).

    Weights from `pack_mrf_weights`. T is padded up to a t_tile multiple
    internally; C must be a multiple of the dtype's sublane tile (8 f32 /
    16 bf16 — HiFi-GAN V1's 32 and 64 both qualify).
    """
    if stage_halo(kernel_sizes, dilations) > HALO:
        raise ValueError("stage receptive field exceeds the 128-lane halo")
    if t_tile % HALO:
        raise ValueError("t_tile must be a multiple of the 128-lane halo")
    b, c, t = x.shape
    t_pad = -(-t // t_tile) * t_tile
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, 0),
                                   (t_tile, t_pad - t + t_tile)))
    n_t = t_pad // t_tile
    r = t_tile // HALO  # halo blocks per tile (t_tile must be a multiple)
    ws = [jnp.asarray(w, dtype) for w in (w3, w7, w11)]

    out = pl.pallas_call(
        functools.partial(
            _mrf_kernel, kernel_sizes=kernel_sizes, dilations=dilations,
            t_tile=t_tile, t_total=t, dtype=dtype),
        grid=(b, n_t),
        in_specs=[
            # left halo, center tile, right halo of the padded sequence
            pl.BlockSpec((1, c, HALO), lambda i, j: (i, 0, (j + 1) * r - 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, t_tile), lambda i, j: (i, 0, j + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, HALO), lambda i, j: (i, 0, (j + 2) * r),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(w.shape, lambda i, j: (0, 0, 0),
                           memory_space=pltpu.VMEM) for w in ws],
            pl.BlockSpec(biases.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, t_tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), dtype),
        interpret=interpret,
    )(xp, xp, xp, *ws, jnp.asarray(biases))
    return out[:, :, :t]
