"""iSTFT-head vocoder families vs HiFi-GAN V1 on TPU.

Times the full generator forwards (same serving shape as bench.py:
B x T mel -> B x T*256 samples) for HiFi-GAN V1, iSTFTNet C8C8I, the
mel-rate preset and Vocos (ConvNeXt trunk, models/vocos.py). The C=64/32 tail the iSTFT head removes is the measured
"small-channel wall" (docs/PERF.md) — this bench quantifies what removing
it architecturally buys.

Methodology per CLAUDE.md: sync via device_get of an in-jit checksum
(block_until_ready is a no-op on the tunneled platform), 2 warmup runs,
salted inputs.

Usage: python benchmarks/bench_istftnet.py [--f32] [--batch N] [--frames T]
Prints one JSON line per generator.
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

    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.models.istftnet import build_istftnet

    B = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 128
    T = int(sys.argv[sys.argv.index("--frames") + 1]) if "--frames" in sys.argv else 512
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(-4, 2, (B, T, 80)).astype(np.float32))
    audio_sec = B * T * 256 / 22050

    from visual_onoma_to_wave_tpu.models.vocos import VocosGenerator

    gens = {
        "hifigan_v1": HiFiGANGenerator(dtype=dtype),
        "istftnet_c8c8i": build_istftnet("c8c8i", dtype=dtype),
        "istftnet_melrate": build_istftnet("melrate", dtype=dtype),
        "vocos": VocosGenerator(dtype=dtype),
    }
    if "--presets" in sys.argv:  # official V2/V3 size presets too
        from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
        gens["hifigan_v2"] = get_vocoder("HiFi-GAN-v2", dtype=dtype)
        gens["hifigan_v3"] = get_vocoder("HiFi-GAN-v3", dtype=dtype)
    if "--bigvgan" in sys.argv:  # snake + anti-aliased family (base size)
        from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
        gens["bigvgan_base"] = get_vocoder("BigVGAN", dtype=dtype)
        gens["bigvgan_base_noaa"] = get_vocoder("BigVGAN", dtype=dtype,
                                                anti_aliased=False)

    if "--only" in sys.argv:  # comma-list filter, e.g. --only bigvgan_base
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        gens = {k: v for k, v in gens.items() if k in keep}

    for name, gen in gens.items():
        params = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 80)))

        @jax.jit
        def fwd(m, salt, gen=gen, params=params):
            wav = gen.apply(params, m + salt)
            return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

        float(jax.device_get(fwd(mel, jnp.float32(0.0))))
        float(jax.device_get(fwd(mel, jnp.float32(0.01))))
        iters = 5
        t0 = time.perf_counter()
        chk = None
        for i in range(iters):
            chk = fwd(mel, jnp.float32(1e-3 * (i + 1)))
        float(jax.device_get(chk))
        dt = (time.perf_counter() - t0) / iters
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree.leaves(params))
        print(json.dumps({
            "generator": name, "ms": round(dt * 1e3, 2),
            "rtf": round(audio_sec / dt, 1),
            "params_m": round(n_params / 1e6, 2),
            "batch": B, "frames": T,
            "dtype": "f32" if dtype == jnp.float32 else "bf16",
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
