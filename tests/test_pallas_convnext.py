"""Fused ConvNeXt-block Pallas kernel (ops/pallas_convnext.py).

Interpret-mode parity against the jnp module path (models/vocos.py), for
f32 and bf16 compute, plus the shape-constraint errors. The compiled
kernel is exercised on the real TPU by benchmarks/bench_vocos_kernel.py
(interpret mode does not check Mosaic tiling rules — CLAUDE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models.vocos import ConvNeXtBlock
from visual_onoma_to_wave_tpu.ops.pallas_convnext import convnext_block


def _params(key, T=32, C=128, M=256, B=2, dtype=jnp.float32):
    blk = ConvNeXtBlock(dim=C, intermediate_dim=M, layer_scale_init=0.25,
                        dtype=dtype)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, T, C)), jnp.float32)
    p = blk.init(jax.random.PRNGKey(key), x)["params"]
    return blk, p, x


def _kernel_out(p, x, interpret=True):
    return convnext_block(
        x, p["dwconv_w"], p["dwconv_b"], p["norm_scale"], p["norm_bias"],
        p["pw1_w"], p["pw1_b"], p["pw2_w"], p["pw2_b"], p["gamma"],
        interpret=interpret)


def test_parity_f32():
    blk, p, x = _params(0)
    ref = np.asarray(blk.apply({"params": p}, x))
    out = np.asarray(_kernel_out(p, x))
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_parity_bf16():
    blk, p, x = _params(1, dtype=jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    ref = np.asarray(blk.apply({"params": p}, x16), np.float32)
    out = np.asarray(_kernel_out(p, x16), np.float32)
    scale = max(np.abs(ref).max(), 1e-3)
    # both paths accumulate f32 in the matmuls; the only divergence is
    # bf16 rounding order in the elementwise chain
    assert np.abs(out - ref).max() / scale < 0.03


def test_module_fused_flag_matches(monkeypatch):
    """VocosGenerator(fused_kernel=True) routes blocks through the kernel;
    on CPU we exercise the routing with interpret mode forced."""
    from jax.experimental.pallas import tpu as pltpu

    blk, p, x = _params(2)
    fused = ConvNeXtBlock(dim=128, intermediate_dim=256,
                          layer_scale_init=0.25, fused_kernel=True)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused.apply({"params": p}, x))
    ref = np.asarray(blk.apply({"params": p}, x))
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-5)


def test_erf_gelu_rejected():
    blk, p, x = _params(3)
    fused = ConvNeXtBlock(dim=128, intermediate_dim=256,
                          layer_scale_init=0.25, fused_kernel=True,
                          gelu_approximate=False)
    with pytest.raises(ValueError, match="tanh GELU"):
        fused.apply({"params": p}, x)


def test_shape_constraints():
    blk, p, x = _params(4)
    with pytest.raises(ValueError, match="T%16"):
        _kernel_out(p, x[:, :20])  # T=20 not a multiple of 16
