"""Device-compute floor of the fused acoustic+vocoder serving executable.

The HTTP load numbers (bench_serve.py) are dominated by the tunneled
platform's per-dispatch tail; this measures the executable itself —
steady-state time of ONE fused dispatch (full ICASSP acoustic + HiFi-GAN
V1 bf16, 512-frame mel buffer) at the interactive batch (1) and the
serving bucket (16) — i.e. what a directly-attached host would pay per
batch. Timing per CLAUDE.md: device_get of an in-jit checksum, 2 warmups.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator

    MAX_MEL, C, HOP, SR = 512, 8, 256, 22050
    cfg = Config()
    model = VTTS.from_config(cfg, n_vocab=64, max_mel_len=MAX_MEL)
    gen = HiFiGANGenerator(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def batch_of(B):
        return {
            "audiotypes": jnp.asarray((np.arange(B) % 10).astype(np.int32)),
            "texts": jnp.asarray(rng.integers(1, 64, (B, C)).astype(np.int32)),
            "src_lens": jnp.asarray(np.full((B,), C, np.int32)),
            "image_cells": jnp.asarray(
                rng.uniform(0, 1, (B, C, 24, 102)).astype(np.float32)),
        }

    b1 = batch_of(1)
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **b1, use_image=True, deterministic=True))()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    gen_params = jax.jit(gen.init)(jax.random.PRNGKey(2),
                                   jnp.zeros((1, 16, 80), jnp.float32))

    @jax.jit
    def fused(params, batch_stats, gen_params, batch, e_ctl, d_ctl, salt):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"], texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch["image_cells"] + salt,
            use_image=True, e_control=e_ctl, d_control=d_ctl,
            deterministic=True)
        wav = gen.apply(gen_params, out["postnet_mel"])
        return jnp.sum(wav[:, ::4097]) + jnp.sum(out["mel_lens"])

    for B in (1, 16):
        batch = batch_of(B)
        e = jnp.ones((B,), jnp.float32)
        d = jnp.ones((B,), jnp.float32)
        for i in range(2):
            float(jax.device_get(fused(params, batch_stats, gen_params,
                                       batch, e, d, jnp.float32(0.01 * i))))
        iters = 20
        t0 = time.perf_counter()
        for i in range(iters):
            chk = fused(params, batch_stats, gen_params, batch, e, d,
                        jnp.float32(1e-3 * (i + 1)))
        float(jax.device_get(chk))
        dt = (time.perf_counter() - t0) / iters
        audio_s = B * MAX_MEL * HOP / SR
        print(json.dumps({
            "batch": B,
            "fused_dispatch_ms": round(dt * 1e3, 2),
            "audio_sec_per_dispatch": round(audio_s, 1),
            "rtf": round(audio_s / dt, 0),
            "projected_direct_attach_req_per_s": round(B / dt, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
