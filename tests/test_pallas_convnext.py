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


def test_trunk_megakernel_parity():
    """convnext_trunk (all blocks in one kernel, weight streaming) equals
    L sequential blocks."""
    from visual_onoma_to_wave_tpu.ops.pallas_convnext import convnext_trunk

    L, T, C, M = 3, 32, 128, 256
    blk = ConvNeXtBlock(dim=C, intermediate_dim=M, layer_scale_init=0.3)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, T, C)), jnp.float32)
    ps = [blk.init(jax.random.PRNGKey(10 + i), x)["params"]
          for i in range(L)]
    ref = x
    for p in ps:
        ref = blk.apply({"params": p}, ref)
    stack = lambda k: jnp.stack([p[k] for p in ps])
    out = convnext_trunk(
        x, stack("dwconv_w"), stack("dwconv_b"), stack("norm_scale"),
        stack("norm_bias"), stack("pw1_w"), stack("pw1_b"),
        stack("pw2_w"), stack("pw2_b"), stack("gamma"), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=5e-5)


def test_apply_fused_full_generator_parity():
    """models/vocos.py::apply_fused == gen.apply for f32 and bf16."""
    from visual_onoma_to_wave_tpu.models.vocos import (
        VocosGenerator, apply_fused)

    mel = jnp.asarray(
        np.random.default_rng(6).normal(-1, 1, (2, 32, 80)), jnp.float32)
    for dtype, tol in ((jnp.float32, 5e-5), (jnp.bfloat16, 0.03)):
        gen = VocosGenerator(dim=128, intermediate_dim=256, num_layers=2,
                             dtype=dtype)
        variables = gen.init(jax.random.PRNGKey(0), mel)
        ref = np.asarray(gen.apply(variables, mel), np.float32)
        out = np.asarray(apply_fused(gen, variables, mel, interpret=True),
                         np.float32)
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(out - ref).max() / scale < tol, dtype
