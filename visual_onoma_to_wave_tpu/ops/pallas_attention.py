"""Pallas TPU kernel: fused attention core for the acoustic FFT blocks.

The acoustic decoder's attention sub-block measures ~1.75 ms/layer at the
serving shape (B=128, T=512, H=2, dk=128) but only ~20% of MXU peak
(benchmarks/bench_acoustic_stages.py): the (B, H, T, T) logits tensor is
materialized in HBM by the logits einsum, re-read and re-written by the
fused mask+softmax+nan_to_num chain, and re-read by the attention@V
einsum — ~1 GB of HBM traffic per layer against ~0.13 GB for the
activations proper. This kernel computes

    logits = (Q @ K^T) * scale
    logits[key is padding] -> -inf         (key-padding mask)
    attn = softmax(logits); fully-masked rows -> 0   (= nan_to_num)
    ctx = attn @ V

for one batch item per grid step with the (T, T) matrix VMEM-resident —
it never touches HBM. T=512 fits whole, so no online-softmax streaming is
needed (contrast with true flash attention for long T). The Q/K/V and
output projections, residual and LayerNorm stay in XLA: they are plain
(B, T, D) matmuls/elementwise that XLA already handles at roofline.

Layout note: Q/K/V come in as (B, T, H*dk) — the raw nn.Dense outputs of
`models/layers.py::MultiHeadAttention` *before* its reshape/transpose —
and the context leaves as (B, T, H*dv), which is exactly what the output
projection consumes. Head h occupies lanes [h*dk, (h+1)*dk): slicing it
is a static 128-aligned lane slice, so the kernel also deletes the two
(B, T, H, d) transposes the XLA path pays for.

Numerics match the jnp path: logits and softmax in f32 (the module's
`preferred_element_type=f32` einsum + f32 softmax), attention re-cast to
the compute dtype before @V, fully-masked query rows produce exactly 0
(the module's `nan_to_num` on the all--inf softmax). Inference-only (no
custom VJP); training keeps the XLA path. Reference anchor for the
attention semantics: scripts/transformer/SubLayers.py:40-52 and
Modules.py:7-34.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_attention_available() -> bool:
    """True when the compiled kernel can run on the default backend.

    The Mosaic kernel is TPU-only; on CPU/GPU hosts callers (the
    `fused_kernel` path of models/layers.py::MultiHeadAttention) fall back
    to the XLA formulation, so a checkpoint config with
    `model.fused_attention: true` still loads and serves everywhere.
    Tests monkeypatch this (with `flash_mha` forced to interpret mode) to
    exercise the fused wiring on CPU.
    """
    return jax.default_backend() == "tpu"


def _mha_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, n_head: int,
                scale: float):
    I, T, HD = q_ref.shape
    dk = HD // n_head
    for i in range(I):
        # mask_ref: (I, 1, T) — the singleton keeps the block's last two
        # dims Mosaic-tileable (an (I, T) block with I<8 is rejected)
        neg = jnp.where(mask_ref[i] > 0.5, -jnp.inf, 0.0)       # (1, T)
        outs = []
        for h in range(n_head):
            sl = slice(h * dk, (h + 1) * dk)
            qh = q_ref[i, :, sl]                          # (T, dk)
            kh = k_ref[i, :, sl]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            logits = logits + neg                         # (T, T) f32
            m = jnp.max(logits, axis=-1, keepdims=True)
            # fully-masked row: m = -inf -> exp(nan) guarded by the
            # zero-sum reciprocal below (jnp.where keeps it finite)
            e = jnp.exp(logits - jnp.where(jnp.isfinite(m), m, 0.0))
            e = jnp.where(jnp.isfinite(logits), e, 0.0)
            s = jnp.sum(e, axis=-1, keepdims=True)
            attn = (e * jnp.where(s > 0.0, 1.0 / s, 0.0)).astype(q_ref.dtype)
            outs.append(jax.lax.dot_general(
                attn, v_ref[i, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o_ref[i] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "items_per_step",
                                             "interpret"))
def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              key_pad_mask: jnp.ndarray, n_head: int,
              items_per_step: int = 2,
              interpret: bool = False) -> jnp.ndarray:
    """Masked softmax attention with the (T, T) matrix VMEM-resident.

    q/k/v: (B, T, H*dk) — heads packed in lanes (raw projection outputs);
    key_pad_mask: (B, T) bool/float, truthy = padding. Returns the
    (B, T, H*dk) context in q.dtype. Scale is 1/sqrt(dk) like the module.

    T is padded internally to the next multiple of 128 (padded keys are
    masked, padded query rows sliced away), so any T works — the serving
    decoder's max_mel_len (e.g. 1000) included. Constraint (asserted):
    dk multiple of 128; callers fall back to the XLA path otherwise.
    """
    B, T, HD = q.shape
    if HD % n_head:
        raise ValueError(f"H*dk={HD} not divisible by n_head={n_head}")
    dk = HD // n_head
    if dk % 128:
        raise ValueError(f"flash_mha needs dk%128==0; got dk={dk}")
    Tp = -(-T // 128) * 128
    if Tp != T:
        pad = [(0, 0), (0, Tp - T), (0, 0)]
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
        key_pad_mask = jnp.pad(key_pad_mask.astype(jnp.float32),
                               [(0, 0), (0, Tp - T)], constant_values=1.0)
        return flash_mha(q, k, v, key_pad_mask, n_head,
                         items_per_step=items_per_step,
                         interpret=interpret)[:, :T]
    I = items_per_step
    while I > 1 and B % I:
        I //= 2

    scale = 1.0 / float(dk) ** 0.5
    mask = key_pad_mask.astype(jnp.float32).reshape(B, 1, T)
    item = pl.BlockSpec((I, T, HD), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_mha_kernel, n_head=n_head, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        grid=(B // I,),
        in_specs=[item, item, item,
                  pl.BlockSpec((I, 1, T), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=item,
        interpret=interpret,
    )(q, k, v, mask)
