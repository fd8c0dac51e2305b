"""Fused Pallas ConvNeXt block vs the XLA path, on the real TPU.

Times (a) one ConvNeXt block in isolation (kernel vs XLA) and (b) the
full VocosGenerator forward with fused_kernel on/off at the serving shape
(B=128 x T=512, bf16 trunk). Parity is also checked on-device (max
rel err between the two full forwards). Methodology per CLAUDE.md: sync
via device_get of an in-jit checksum, 2 warmups before timing.

Usage: python benchmarks/bench_vocos_kernel.py [--f32] [--batch N]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def timed(fn, make_args, iters=5):
    import jax
    float(jax.device_get(fn(*make_args(0))))
    float(jax.device_get(fn(*make_args(1))))
    t0 = time.perf_counter()
    chk = None
    for i in range(iters):
        chk = fn(*make_args(2 + i))
    float(jax.device_get(chk))
    return (time.perf_counter() - t0) / iters


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.models.vocos import VocosGenerator
    from visual_onoma_to_wave_tpu.ops.pallas_convnext import convnext_block

    B = 128
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    T, C, M = 512, 512, 1536
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    rng = np.random.default_rng(0)
    audio_sec = B * T * 256 / 22050

    # --- single block: kernel vs XLA -------------------------------------
    from visual_onoma_to_wave_tpu.models.vocos import ConvNeXtBlock
    blk = ConvNeXtBlock(dim=C, intermediate_dim=M, layer_scale_init=0.125,
                        dtype=dtype)
    x = jnp.asarray(rng.normal(0, 1, (B, T, C)).astype(np.float32)).astype(
        dtype)
    p = jax.jit(blk.init)(jax.random.PRNGKey(0), x)["params"]

    @jax.jit
    def xla_block(p, x, salt):
        y = blk.apply({"params": p}, x + salt)
        return jnp.sum(jnp.abs(y[:, ::97, ::63]).astype(jnp.float32))

    def pallas_block_fn(items):
        @jax.jit
        def pallas_block(p, x, salt):
            y = convnext_block(x + salt, p["dwconv_w"], p["dwconv_b"],
                               p["norm_scale"], p["norm_bias"], p["pw1_w"],
                               p["pw1_b"], p["pw2_w"], p["pw2_b"],
                               p["gamma"], items_per_step=items)
            return jnp.sum(jnp.abs(y[:, ::97, ::63]).astype(jnp.float32))
        return pallas_block

    probes = [("block_xla", xla_block)] + [
        (f"block_pallas_i{i}", pallas_block_fn(i)) for i in (1, 2, 4)]
    for tag, fn in probes:
        try:
            dt = timed(fn, lambda i: (p, x, jnp.asarray(1e-3 * i, dtype)))
        except Exception as e:  # VMEM overflow at large items_per_step
            print(json.dumps({"variant": tag,
                              "error": type(e).__name__}), flush=True)
            continue
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 3),
                          "dtype": str(np.dtype(dtype))}), flush=True)

    # --- full generator: fused_kernel off/on ------------------------------
    mel = jnp.asarray(rng.normal(-4, 2, (B, T, 80)).astype(np.float32))
    gen = VocosGenerator(dtype=dtype)
    fgen = VocosGenerator(dtype=dtype, fused_kernel=True)
    params = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))

    @jax.jit
    def fwd(params, m, salt, gen=gen):
        wav = gen.apply(params, m + salt)
        return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

    @jax.jit
    def ffwd(params, m, salt, gen=fgen):
        wav = gen.apply(params, m + salt)
        return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

    from visual_onoma_to_wave_tpu.models.vocos import apply_fused

    @jax.jit
    def mfwd(params, m, salt):
        wav = apply_fused(gen, params, m + salt)
        return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

    @jax.jit
    def mfwd_high(params, m, salt):
        wav = apply_fused(gen, params, m + salt,
                          head_precision=jax.lax.Precision.HIGH)
        return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

    hgen = VocosGenerator(dtype=dtype, fused_kernel=True,
                          head_precision="high")

    @jax.jit
    def hfwd(params, m, salt, gen=hgen):
        wav = gen.apply(params, m + salt)
        return jnp.sum(jnp.abs(wav[:, ::1023]).astype(jnp.float32))

    for tag, fn in (("vocos_xla", fwd), ("vocos_fused", ffwd),
                    ("vocos_fused_headHIGH", hfwd),
                    ("vocos_megakernel", mfwd),
                    ("vocos_megakernel_headHIGH", mfwd_high)):
        dt = timed(fn, lambda i: (params, mel, jnp.float32(1e-3 * i)))
        print(json.dumps({"variant": tag, "ms": round(dt * 1e3, 2),
                          "rtf": round(audio_sec / dt, 1)}), flush=True)

    # --- on-device parity of the two full forwards ------------------------
    w_ref = np.asarray(jax.device_get(
        jax.jit(gen.apply)(params, mel[:2])), np.float32)
    w_fused = np.asarray(jax.device_get(
        jax.jit(fgen.apply)(params, mel[:2])), np.float32)
    scale = max(np.abs(w_ref).max(), 1e-3)
    print(json.dumps({
        "variant": "parity_full_forward",
        "max_rel_err": round(float(np.abs(w_fused - w_ref).max() / scale), 6),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
