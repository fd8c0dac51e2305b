"""Correctness of the fused MRF stage kernel (ops/pallas_mrf.py).

The kernel is a measured negative perf result (see its module docstring)
but is kept exact: these tests pin it against the XLA conv chain used by
models/hifigan.py, including sequence edges, block seams (T spanning
multiple tiles) and non-tile-multiple lengths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models import hifigan as hg
from visual_onoma_to_wave_tpu.ops import pallas_mrf as pm

KS = (3, 7, 11)
DS = ((1, 3, 5),) * 3


def _make_stage(rng, c):
    stage = {}
    for j, k in enumerate(KS):
        p = {}
        for i in range(3):
            for nm in ("convs1", "convs2"):
                p[f"{nm}_{i}_w"] = rng.normal(0, 0.2, (k, c, c)).astype(np.float32)
                p[f"{nm}_{i}_b"] = rng.normal(0, 0.2, (c,)).astype(np.float32)
        stage[f"resblock_{j}"] = p
    return stage


def _xla_stage(stage, x):
    """The generator's MRF stage: 3 ResBlocks averaged (feature-last)."""
    acc = None
    for j, k in enumerate(KS):
        p = stage[f"resblock_{j}"]
        y = x
        for i, d in enumerate(DS[j]):
            h = jax.nn.leaky_relu(y, 0.1)
            h = hg._conv1d(h, p[f"convs1_{i}_w"], p[f"convs1_{i}_b"], dilation=d)
            h = jax.nn.leaky_relu(h, 0.1)
            h = hg._conv1d(h, p[f"convs2_{i}_w"], p[f"convs2_{i}_b"], dilation=1)
            y = y + h
        acc = y if acc is None else acc + y
    return acc / len(KS)


@pytest.mark.parametrize("c,t", [(32, 700), (64, 256), (32, 512)])
def test_fused_matches_xla_chain_f32(c, t):
    # t=700 spans blocks with a ragged tail; 256 = single block exactly;
    # 512 = exact two blocks (seam at 256)
    rng = np.random.default_rng(0)
    stage = _make_stage(rng, c)
    x = rng.normal(0, 1, (2, t, c)).astype(np.float32)

    want = np.asarray(_xla_stage(stage, jnp.asarray(x)))
    (w3, w7, w11), bias = pm.pack_mrf_weights(stage, KS, DS)
    got = pm.mrf_stage_fused(
        jnp.asarray(x.transpose(0, 2, 1)), w3, w7, w11, bias,
        t_tile=256, dtype=jnp.float32, interpret=True)
    got = np.asarray(got).transpose(0, 2, 1)
    assert got.shape == want.shape
    scale = np.abs(want).max()
    # different (valid) accumulation order => relative f32 tolerance
    assert np.abs(got - want).max() <= 2e-6 * scale


def test_stage_halo_within_budget():
    assert pm.stage_halo(KS, DS) == 60
    assert pm.stage_halo(KS, DS) <= pm.HALO


def test_rejects_oversized_receptive_field():
    rng = np.random.default_rng(1)
    stage = _make_stage(rng, 32)
    (w3, w7, w11), bias = pm.pack_mrf_weights(stage, KS, DS)
    x = jnp.zeros((1, 32, 256))
    with pytest.raises(ValueError):
        pm.mrf_stage_fused(x, w3, w7, w11, bias,
                           dilations=((9, 9, 9),) * 3, t_tile=256,
                           interpret=True)
