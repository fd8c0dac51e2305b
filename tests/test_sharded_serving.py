"""Sharded batched inference over the virtual 8-device mesh: output must
equal the single-device forward (the inference analog of the
1-vs-8-device training-loss equality test)."""
import numpy as np
import jax
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models import VTTS
from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
from visual_onoma_to_wave_tpu.parallel import get_mesh
from visual_onoma_to_wave_tpu.parallel.serving import make_sharded_synth


def test_sharded_synth_equals_single_device():
    assert len(jax.devices()) >= 8
    model = VTTS(
        n_vocab=16, n_audiotype=4, hidden=32, encoder_layers=1,
        decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
        max_seq_len=64, max_mel_len=64, n_mels=16, vfe_layers=1,
        energy_stats=(-2.0, 2.0, 0.0, 1.0))
    gen = HiFiGANGenerator(upsample_initial_channel=16, n_mels=16)

    rng = np.random.default_rng(0)
    B, C = 8, 4
    batch = {
        "audiotypes": jnp.asarray((np.arange(B) % 4).astype(np.int32)),
        "texts": jnp.asarray(rng.integers(1, 16, (B, C)).astype(np.int32)),
        "src_lens": jnp.asarray(np.full((B,), C, np.int32)),
        "image_cells": jnp.asarray(
            rng.uniform(0, 1, (B, C, 24, 30)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    gen_params = gen.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 8, 16), jnp.float32))

    # single device reference
    out = model.apply(variables, **batch, use_image=True, deterministic=True)
    ref_wav = gen.apply(gen_params, out["postnet_mel"])
    ref_lens = out["mel_lens"]

    mesh = get_mesh(8)
    run = make_sharded_synth(model, gen, mesh)
    wav, lens = run(variables, gen_params, batch)
    assert wav.sharding.is_equivalent_to(
        jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data")), wav.ndim)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(ref_wav),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))


def test_sharded_synth_per_item_controls():
    """e/d controls are per-item traced inputs of the sharded executable:
    a mixed-control batch equals item-by-item single-device calls, and any
    control value reuses the one compiled executable."""
    model = VTTS(
        n_vocab=16, n_audiotype=4, hidden=32, encoder_layers=1,
        decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
        max_seq_len=64, max_mel_len=64, n_mels=16, vfe_layers=1,
        energy_stats=(-2.0, 2.0, 0.0, 1.0))
    gen = HiFiGANGenerator(upsample_initial_channel=16, n_mels=16)
    rng = np.random.default_rng(3)
    B, C = 8, 4
    batch = {
        "audiotypes": jnp.asarray((np.arange(B) % 4).astype(np.int32)),
        "texts": jnp.asarray(rng.integers(1, 16, (B, C)).astype(np.int32)),
        "src_lens": jnp.asarray(np.full((B,), C, np.int32)),
        "image_cells": jnp.asarray(
            rng.uniform(0, 1, (B, C, 24, 30)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True)
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}
    gen_params = gen.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 8, 16), jnp.float32))

    d_controls = 1.0 + 0.25 * (np.arange(B) % 4)   # 4 distinct values
    # single-device per-item reference
    ref_lens = []
    for i in range(B):
        one = {k: v[i:i + 1] for k, v in batch.items()}
        out = model.apply(variables, **one, use_image=True,
                          d_control=jnp.asarray([d_controls[i]], jnp.float32),
                          deterministic=True)
        ref_lens.append(int(out["mel_lens"][0]))

    mesh = get_mesh(8)
    run = make_sharded_synth(model, gen, mesh)
    _, lens = run(variables, gen_params, batch, d_control=d_controls)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_lens))
    # a second call with new control values reuses the compiled executable
    # (controls are traced inputs, never static args)
    run(variables, gen_params, batch, d_control=d_controls[::-1].copy())
