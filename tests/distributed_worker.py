"""Subprocess worker for tests/test_distributed_training.py (not a pytest
module).

Joins a gloo-federated multi-process CPU cluster via
parallel.init_distributed and runs either a raw sharded train step
("step" mode) or the full Trainer over a tiny preprocessed corpus
("trainer" mode), writing final losses + a parameter digest as JSON. The
parent test runs the identical problem single-process on its 8-device
mesh and asserts equality — the hermetic analog of a 2-host x 4-chip pod
slice.
"""
import json
import pathlib
import sys


def build_step_problem():
    """Tiny model + batch, identical to tests/test_training.py's
    tiny_model_and_batch(batch=8) (numpy-seeded, so every process and the
    parent build the same values)."""
    import numpy as np

    from visual_onoma_to_wave_tpu.models import VTTS

    model = VTTS(
        n_vocab=10, n_audiotype=3, hidden=32, encoder_layers=1,
        decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
        max_seq_len=64, max_mel_len=32, n_mels=16,
        vfe_layers=1, is_energy=True, is_kurtosis=False,
        energy_stats=(-2.0, 2.0, 0.0, 1.0),
    )
    rng = np.random.default_rng(0)
    batch, chars, mel_len = 8, 4, 32
    b = {
        "audiotypes": rng.integers(0, 3, batch).astype(np.int32),
        "texts": rng.integers(1, 10, (batch, chars)).astype(np.int32),
        "src_lens": np.full((batch,), chars, np.int32),
        "mels": rng.standard_normal((batch, mel_len, 16)).astype(np.float32),
        "energies": rng.standard_normal((batch, chars)).astype(np.float32),
        "durations": np.full((batch, chars), mel_len // chars, np.int32),
    }
    return model, b


def params_digest(params):
    import jax
    import numpy as np

    leaves = jax.tree.leaves(jax.device_get(params))
    return float(sum(np.abs(p).astype(np.float64).sum() for p in leaves))


def tiny_trainer_config(pre_root, out_root, batch_size=8, total_step=3):
    """The tiny-model Config over a make_preprocessed corpus — mirrors
    tests/test_trainer_synthesis.py tiny_env."""
    from visual_onoma_to_wave_tpu.config import Config

    cfg = Config()
    out_root = pathlib.Path(out_root)
    return cfg.replace(
        path=cfg.path.__class__(
            preprocessed=str(pre_root), ckpt=str(out_root / "ckpt"),
            log=str(out_root / "log"), result=str(out_root / "result"),
            font=""),
        model=cfg.model.__class__(
            transformer=cfg.model.transformer.__class__(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64,
                conv_kernel_size=(3, 1)),
            visual_feature_extractor=cfg.model.visual_feature_extractor.__class__(
                layer_num=1),
            max_seq_len=256),
        train=cfg.train.__class__(
            optimizer=cfg.train.optimizer.__class__(batch_size=batch_size,
                                                    warm_up_step=10),
            # synth_step/save_step hit mid-run so the multi-process test
            # exercises the periodic sample-synthesis and collective-save
            # paths, not just the step loop
            step=cfg.train.step.__class__(
                total_step=total_step, log_step=1, synth_step=2,
                val_step=10**9, save_step=2),
            max_mel_len=256, seed=0))


def run_step_mode(out_file):
    import jax
    import numpy as np

    from visual_onoma_to_wave_tpu.parallel import (
        get_mesh, replicate, shard_batch_multiprocess)
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)

    model, batch = build_step_problem()
    tx = make_optimizer(init_lr=1e-3, warmup_steps=10)
    step_fn = make_train_step(model, tx, use_image=False)

    mesh = get_mesh()
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               use_image=False)
    state = replicate(jax.device_get(state), mesh)
    rng = replicate(np.asarray(jax.random.PRNGKey(7)), mesh)
    sharded = shard_batch_multiprocess(batch, mesh)
    losses = None
    for _ in range(3):
        state, losses = step_fn(state, sharded, rng)
    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "total_loss": float(losses["total_loss"]),
        "digest": params_digest(state.params),
    }
    pathlib.Path(out_file).write_text(json.dumps(result))


def run_trainer_mode(pre_root, out_root, out_file):
    import jax

    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_trainer_config(pre_root, out_root)
    trainer = Trainer(cfg)
    seen = []
    state = trainer.train(on_step=lambda step, losses: seen.append(
        (step, losses.get("total_loss") if losses else None)))
    val = trainer.evaluate(metrics=True)  # exercises the ragged-tail path
    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "final_step": int(state.step),
        "total_loss": seen[-1][1],
        "val": val,
        "digest": params_digest(state.params),
        "ckpt_steps": trainer.ckpt.all_steps(),
    }
    trainer.ckpt.close()
    pathlib.Path(out_file).write_text(json.dumps(result))


def vocoder_problem(ckpt_dir=None, use_mesh=True):
    """Tiny GAN vocoder trainer, shared by the workers and the parent's
    single-process reference run (same seeds -> same sampler stream)."""
    import numpy as np

    from test_vocoder_training import TINY_MPD, TINY_MSD, _tiny_gen
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    cfg = VocoderTrainConfig(segment_size=2048, batch_size=8,
                             learning_rate=5e-4, log_every=1000,
                             save_every=10**9, ema_decay=0.5)
    t = np.arange(6000) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return VocoderTrainer(
        [clip], cfg, gen=_tiny_gen(), use_mesh=use_mesh, ckpt_dir=ckpt_dir,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))


def run_vocoder_mode(ckpt_dir, out_file):
    import jax

    trainer = vocoder_problem(ckpt_dir=ckpt_dir)
    state = trainer.train(steps=2)  # saves at the target step
    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "digest": params_digest(state.gen_params),
        "ema_digest": params_digest(state.gen_ema),
        "disc_digest": params_digest((state.mpd_params, state.msd_params)),
    }
    pathlib.Path(out_file).write_text(json.dumps(result))


def main(argv):
    mode = argv[0]
    pid, nproc, port, devs = (int(argv[1]), int(argv[2]), argv[3],
                              int(argv[4]))
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

    from visual_onoma_to_wave_tpu.parallel import init_distributed
    init_distributed(coordinator_address=f"localhost:{port}",
                     num_processes=nproc, process_id=pid,
                     cpu_devices_per_process=devs)
    if mode == "step":
        run_step_mode(argv[5])
    elif mode == "trainer":
        run_trainer_mode(argv[5], argv[6], argv[7])
    elif mode == "vocoder":
        run_vocoder_mode(argv[5], argv[6])
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main(sys.argv[1:])
