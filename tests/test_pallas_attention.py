"""Interpret-mode parity for the fused attention-core Pallas kernel
(ops/pallas_attention.py) against the XLA path of
models/layers.py::MultiHeadAttention. Compiled-mode numbers/Mosaic checks
live in benchmarks/bench_acoustic_stages.py on the real TPU."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models.layers import MultiHeadAttention
from visual_onoma_to_wave_tpu.ops.pallas_attention import flash_mha


def _ref_core(q, k, v, key_pad_mask, n_head):
    """The module's einsum/softmax core on (B, T, H*dk) packed inputs."""
    B, T, HD = q.shape
    dk = HD // n_head
    qh = q.reshape(B, T, n_head, dk).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, n_head, dk).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, n_head, dk).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                      preferred_element_type=jnp.float32) / np.sqrt(dk)
    attn = jnp.where(key_pad_mask[:, None, None, :], -jnp.inf, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    attn = jnp.nan_to_num(attn).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, T, HD)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-6),
                                       (jnp.bfloat16, 2e-2)])
def test_flash_mha_parity(dtype, tol):
    B, T, H, dk = 3, 128, 2, 128
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H * dk)), jnp.float32
                           ).astype(dtype) for _ in range(3))
    # item 0: no padding; item 1: tail padding; item 2: fully padded
    lens = np.array([T, 70, 0])
    mask = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])

    ref = np.asarray(_ref_core(q, k, v, mask, H), np.float32)
    out = np.asarray(flash_mha(q, k, v, mask, H, interpret=True), np.float32)
    assert out.shape == ref.shape and out.dtype == np.float32
    np.testing.assert_allclose(out, ref, rtol=0, atol=tol)
    # the fully-padded item must be exactly zero (the nan_to_num semantics)
    assert np.all(out[2] == 0.0)


def test_flash_mha_items_per_step_and_constraints():
    B, T, H, dk = 4, 128, 2, 128
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H * dk)), jnp.float32)
               for _ in range(3))
    mask = jnp.zeros((B, T), bool)
    a = flash_mha(q, k, v, mask, H, items_per_step=1, interpret=True)
    b = flash_mha(q, k, v, mask, H, items_per_step=2, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    with pytest.raises(ValueError, match="dk%128"):
        flash_mha(q, k, v, mask, 4, interpret=True)  # dk=64


def test_flash_mha_unaligned_T_pads_internally():
    """T=100 (not a 128 multiple, like serving max_mel_len=1000) pads
    internally and still matches the reference core exactly."""
    B, T, H, dk = 2, 100, 2, 128
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H * dk)), jnp.float32)
               for _ in range(3))
    lens = np.array([T, 33])
    mask = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    ref = np.asarray(_ref_core(q, k, v, mask, H), np.float32)
    out = np.asarray(flash_mha(q, k, v, mask, H, interpret=True), np.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-6)


def test_module_fused_path_parity(monkeypatch):
    """MultiHeadAttention(fused_kernel=True) == the XLA module, same params
    — wiring-level check (kernel forced to interpret mode for CPU)."""
    import visual_onoma_to_wave_tpu.ops.pallas_attention as pa
    monkeypatch.setattr(
        pa, "flash_mha", functools.partial(flash_mha, interpret=True))
    monkeypatch.setattr(pa, "fused_attention_available", lambda: True)

    B, T, D = 2, 128, 256
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    pad = jnp.asarray(np.arange(T)[None, :] >= np.array([[T], [90]]))
    attn_mask = jnp.broadcast_to(pad[:, None, :], (B, T, T))

    base = MultiHeadAttention(2, D, 128, 128, dropout=0.0)
    fused = MultiHeadAttention(2, D, 128, 128, dropout=0.0,
                               fused_kernel=True)
    params = base.init(jax.random.PRNGKey(0), x, attn_mask, True)
    ref = base.apply(params, x, attn_mask, True, key_pad_mask=pad)
    out = fused.apply(params, x, attn_mask, True, key_pad_mask=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)

    # unaligned T falls back to the XLA path inside the fused module
    xs, ps, ms = x[:, :100], pad[:, :100], attn_mask[:, :100, :100]
    out2 = fused.apply(params, xs, ms, True, key_pad_mask=ps)
    ref2 = base.apply(params, xs, ms, True, key_pad_mask=ps)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=0)


@pytest.mark.parametrize("deterministic", [True, False])
def test_keymask_path_equals_attn_mask_path(deterministic):
    """The default (B,1,1,T) key-mask formulation — no head transposes, no
    (B,T,T) mask — must equal the general attn_mask formulation exactly
    (measured bit-exact on TPU, 36.3 -> 28.1 ms; docs/PERF.md). Covers the
    training path too (deterministic=False with dropout disabled)."""
    B, T, D = 3, 64, 256
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = np.array([T, 40, 0])
    pad = jnp.asarray(np.arange(T)[None, :] >= lens[:, None])
    attn_mask = jnp.broadcast_to(pad[:, None, :], (B, T, T))

    mod = MultiHeadAttention(2, D, 128, 128, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), x, attn_mask, True)
    kw = {} if deterministic else {"rngs": {"dropout": jax.random.PRNGKey(7)}}
    via_attn_mask = mod.apply(params, x, attn_mask, deterministic, **kw)
    via_key_mask = mod.apply(params, x, None, deterministic,
                             key_pad_mask=pad, **kw)
    np.testing.assert_array_equal(np.asarray(via_attn_mask),
                                  np.asarray(via_key_mask))


def test_fused_config_knob_safe_on_cpu():
    """model.fused_attention=true in a checkpoint config must load and run
    on non-TPU hosts: fused_attention_available() gates the kernel off
    (conftest forces CPU), so the module takes the XLA path bit-exactly."""
    from visual_onoma_to_wave_tpu.ops import pallas_attention as pa
    assert pa.fused_attention_available() is False

    B, T, D = 2, 128, 256
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    pad = jnp.zeros((B, T), bool)
    attn_mask = jnp.broadcast_to(pad[:, None, :], (B, T, T))
    base = MultiHeadAttention(2, D, 128, 128, dropout=0.0)
    fused = MultiHeadAttention(2, D, 128, 128, dropout=0.0,
                               fused_kernel=True)
    params = base.init(jax.random.PRNGKey(0), x, attn_mask, True)
    ref = base.apply(params, x, attn_mask, True, key_pad_mask=pad)
    out = fused.apply(params, x, attn_mask, True, key_pad_mask=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)
