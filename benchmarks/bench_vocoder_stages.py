"""Per-stage timing of the HiFi-GAN V1 generator on TPU.

Measures where vocoder time actually goes (upsample conv vs MRF stack, per
channel width 512/256/128/64/32) by timing progressively truncated forwards
and differencing. Motivates / validates the small-channel MRF work: the
C=64/32 stages carry ~32% of the FLOPs but (per the round-1 lane-utilization
model) ~half the runtime.

Usage: python benchmarks/bench_vocoder_stages.py [--f32] [--batch N]
Prints one JSON line per measurement.
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

    from visual_onoma_to_wave_tpu.models import hifigan as hg

    B = 128
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    T = 512
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16

    gen = hg.HiFiGANGenerator(dtype=dtype)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))["params"]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))

    rates = gen.upsample_rates
    kernels = gen.upsample_kernel_sizes
    rks = gen.resblock_kernel_sizes
    rds = gen.resblock_dilations

    def resblock(p, x, k, ds):
        for i, d in enumerate(ds):
            h = jax.nn.leaky_relu(x, hg.LRELU_SLOPE)
            h = hg._conv1d(h, p[f"convs1_{i}_w"], p[f"convs1_{i}_b"],
                           dilation=d, dtype=dtype)
            h = jax.nn.leaky_relu(h, hg.LRELU_SLOPE)
            h = hg._conv1d(h, p[f"convs2_{i}_w"], p[f"convs2_{i}_b"],
                           dilation=1, dtype=dtype)
            x = x + h
        return x

    def forward(mel, salt, n_stages: int, with_mrf: bool):
        """conv_pre + the first n_stages upsample(+MRF) stages."""
        x = hg._conv1d(mel + salt, params["conv_pre_w"],
                       params["conv_pre_b"], dtype=dtype)
        for i in range(n_stages):
            x = jax.nn.leaky_relu(x, hg.LRELU_SLOPE)
            x = hg._conv_transpose1d(
                x, params[f"up_{i}_w"], params[f"up_{i}_b"],
                stride=rates[i], torch_padding=(kernels[i] - rates[i]) // 2,
                dtype=dtype)
            if with_mrf:
                acc = None
                for j, (rk, rd) in enumerate(zip(rks, rds)):
                    y = resblock(params[f"resblock_{i}_{j}"], x, rk, rd)
                    acc = y if acc is None else acc + y
                x = acc / len(rks)
        return jnp.sum(x[:, ::1023].astype(jnp.float32))

    def timed(fn):
        f = jax.jit(fn)
        float(jax.device_get(f(mel, jnp.float32(0.0))))
        float(jax.device_get(f(mel, jnp.float32(0.01))))
        iters = 5
        t0 = time.perf_counter()
        chk = None
        for i in range(iters):
            chk = f(mel, jnp.float32(1e-3 * (i + 1)))
        float(jax.device_get(chk))
        return (time.perf_counter() - t0) / iters

    # FLOP model (MACs per mel frame) for context
    chans = [512 // (2 ** (i + 1)) for i in range(4)]  # 256,128,64,32
    cum_up = 1
    rows = []
    t_prev = timed(lambda m, s: forward(m, s, 0, True))
    rows.append(("conv_pre", t_prev, 80 * 512 * 7))
    for i in range(4):
        cum_up *= rates[i]
        t_noMRF = timed(lambda m, s, i=i: forward(m, s, i + 1, False)) if i == 0 else None
        t_full = timed(lambda m, s, i=i: forward(m, s, i + 1, True))
        c = chans[i]
        mrf_macs = 126 * c * c * cum_up
        rows.append((f"stage{i}_C{c}", t_full - t_prev, mrf_macs))
        t_prev = t_full

    total = timed(lambda m, s: forward(m, s, 4, True))
    audio_sec = B * T * 256 / 22050
    peak = 197e12 if dtype == jnp.bfloat16 else 49e12
    for name, dt, macs in rows:
        flops = 2 * macs * B * T
        print(json.dumps({
            "stage": name, "ms": round(dt * 1e3, 2),
            "tflops": round(flops / dt / 1e12, 1) if dt > 1e-5 else None,
            "pct_peak": round(100 * flops / dt / peak, 1) if dt > 1e-5 else None,
        }))
    print(json.dumps({"stage": "TOTAL_no_post", "ms": round(total * 1e3, 2),
                      "rtf": round(audio_sec / total, 1),
                      "dtype": str(dtype.__name__ if hasattr(dtype, '__name__') else dtype)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
