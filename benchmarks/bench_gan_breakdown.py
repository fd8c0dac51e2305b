"""Phase breakdown of the GAN vocoder training step on TPU.

The fused step (training/vocoder_trainer.py make_gan_train_step) measures
137 ms at B=16x8192 for HiFi-GAN V1 (BASELINE.md). This bench attributes
that time: generator forward / generator backward / MPD-vs-MSD
discriminator updates / the generator-loss phase (D forwards + backward
w.r.t. the waveform + mel L1) — so optimization effort aims at the
measured hot phase instead of a guess, and "no headroom" claims have
evidence (docs/PERF.md).

Each phase is timed as its own jit executable (2 synced warmups, salted
inputs, device_get sync per CLAUDE.md). Phases overlap in work (e.g. the
g-loss phase re-runs both D forwards), so the lines do NOT sum to the
fused step time — they bound each component's cost.

Usage: python benchmarks/bench_gan_breakdown.py [--batch N] [--family F]
Prints one JSON line per phase.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _timed(fn, args_of, iters=5):
    """Returns (seconds, model_flops): wall time per execution plus XLA
    cost_analysis FLOPs of the jitted fn, so each phase line carries its
    achieved-TFLOPS distance from the hardware roof."""
    import jax
    flops = None
    try:
        c = fn.lower(*args_of(0)).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c.get("flops", 0.0)) or None
    except Exception:
        pass  # cost_analysis is best-effort across backends
    out = fn(*args_of(0))
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    out = fn(*args_of(1))
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args_of(2 + i))
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters, flops


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        discriminator_loss, feature_matching_loss,
        generator_adversarial_loss)
    from visual_onoma_to_wave_tpu.ops.stft import (
        hann_window, logmel_and_energy, melscale_fbanks)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    family = "hifigan"
    if "--family" in sys.argv:
        family = sys.argv[sys.argv.index("--family") + 1]
    gen = None
    if family != "hifigan":
        from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
        gen = get_vocoder(family)

    cfg = VocoderTrainConfig(batch_size=batch)
    rng = np.random.default_rng(0)
    clips = [rng.uniform(-0.5, 0.5, 30000).astype(np.float32)
             for _ in range(8)]
    vt = VocoderTrainer(clips, cfg, gen=gen, use_mesh=False)
    gen_mod, mpd, msd = vt.gen, vt.mpd, vt.msd
    st = vt.state

    window = jnp.asarray(hann_window(cfg.win_length))
    fb = jnp.asarray(melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min,
                                     cfg.f_max, cfg.n_mels,
                                     cfg.sampling_rate))
    t_mel = cfg.segment_size // cfg.hop_length

    def mel_of(audio):
        logmel, _ = logmel_and_energy(audio, window, fb, cfg.n_fft,
                                      cfg.hop_length, cfg.win_length)
        return logmel[..., :t_mel]

    audio0 = jnp.asarray(vt.sampler.next_batch())
    mel0 = jax.jit(mel_of)(audio0)
    y_hat0 = jax.jit(lambda gp, m: gen_mod.apply(gp, m.swapaxes(1, 2)))(
        st.gen_params, mel0)

    def salt_audio(i):
        return (audio0 + jnp.float32(1e-4 * i),)

    def salt_mel(i):
        return (mel0 + jnp.float32(1e-3 * i),)

    def salt_pair(i):
        return (audio0 + jnp.float32(1e-4 * i),
                y_hat0 + jnp.float32(1e-4 * i))

    def emit(name, timing):
        dt, flops = timing if isinstance(timing, tuple) else (timing, None)
        rec = {"metric": "gan_step_phase", "family": family,
               "batch": batch, "phase": name, "ms": round(dt * 1e3, 2)}
        if flops:
            rec["model_tflop"] = round(flops / 1e12, 3)
            rec["achieved_tflops"] = round(flops / dt / 1e12, 1)
        print(json.dumps(rec), flush=True)

    # params always travel as jit ARGUMENTS: a closure would bake the trees
    # into the HLO as literal constants, and the tunneled remote_compile
    # endpoint 413s on the resulting payload for the bigger phases
    gp, pp, sp_ = st.gen_params, st.mpd_params, st.msd_params

    # mel analysis (target + input mels)
    emit("mel_of", _timed(jax.jit(mel_of), salt_audio))

    # generator forward only
    emit("g_forward", _timed(
        jax.jit(lambda gp, m: gen_mod.apply(gp, m.swapaxes(1, 2))),
        lambda i: (gp, *salt_mel(i))))

    # generator forward + backward (unit cotangent through vjp)
    def g_fwd_bwd(gp, m):
        y, vjp = jax.vjp(
            lambda g: gen_mod.apply(g, m.swapaxes(1, 2)), gp)
        (grads,) = vjp(jnp.ones_like(y))
        return jax.tree.leaves(grads)[0]
    emit("g_forward_backward",
         _timed(jax.jit(g_fwd_bwd), lambda i: (gp, *salt_mel(i))))

    # discriminator forwards (value only)
    emit("mpd_forward", _timed(
        jax.jit(lambda p, y, yh: mpd.apply({"params": p}, y, yh)[0][0]),
        lambda i: (pp, *salt_pair(i))))
    emit("msd_forward", _timed(
        jax.jit(lambda p, y, yh: msd.apply({"params": p}, y, yh)[0][0]),
        lambda i: (sp_, *salt_pair(i))))

    # discriminator updates (fwd+bwd), separately per discriminator
    def mpd_update(p0, y, yh):
        def loss(p):
            pr, pg, _, _ = mpd.apply({"params": p}, y, yh)
            return discriminator_loss(pr, pg)
        return jax.tree.leaves(jax.grad(loss)(p0))[0]
    emit("mpd_update", _timed(jax.jit(mpd_update),
                              lambda i: (pp, *salt_pair(i))))

    def msd_update(p0, y, yh):
        def loss(p):
            sr, sg, _, _ = msd.apply({"params": p}, y, yh)
            return discriminator_loss(sr, sg)
        return jax.tree.leaves(jax.grad(loss)(p0))[0]
    emit("msd_update", _timed(jax.jit(msd_update),
                              lambda i: (sp_, *salt_pair(i))))

    # generator-loss phase: both D forwards + fm + mel L1, backward w.r.t.
    # the waveform (the g-update chain minus the saved generator vjp)
    def g_loss_phase(pp_, sp2, y, yh):
        def loss(y_hat):
            mel_hat = mel_of(y_hat)
            mel_l1 = jnp.mean(jnp.abs(mel_hat - mel_of(y)))
            pr, pg, fpr, fpg = mpd.apply({"params": pp_}, y, y_hat)
            sr, sg, fsr, fsg = msd.apply({"params": sp2}, y, y_hat)
            adv = (generator_adversarial_loss(pg)
                   + generator_adversarial_loss(sg))
            fm = (feature_matching_loss(fpr, fpg)
                  + feature_matching_loss(fsr, fsg))
            return adv + fm + cfg.mel_loss_weight * mel_l1
        return jax.grad(loss)(yh)
    emit("g_loss_phase", _timed(jax.jit(g_loss_phase),
                                lambda i: (pp, sp_, *salt_pair(i))))

    # the fused production step (donated state: thread it like the trainer;
    # must run LAST — the first call consumes the st buffers the other
    # phases close over)
    state = st
    for i in range(2):
        state, m = vt.train_step(state, *salt_audio(i))
        float(jax.device_get(m["g_total"]))
    t0 = time.perf_counter()
    for i in range(5):
        state, m = vt.train_step(state, *salt_audio(2 + i))
    float(jax.device_get(m["g_total"]))
    emit("full_step", (time.perf_counter() - t0) / 5)
    return 0


if __name__ == "__main__":
    sys.exit(main())
