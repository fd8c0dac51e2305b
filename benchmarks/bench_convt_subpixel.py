"""Probe two vocoder conv formulations on the real chip.

1. Sub-pixel transposed conv: the generator's ConvTranspose1d layers
   (rates 8,8,2,2 / kernels 16,16,4,4 — reference hifigan/config.json:11-15)
   are currently lhs-dilated convs (models/hifigan.py:_conv_transpose1d).
   If XLA:TPU multiplies through the dilation zeros, a phase-decomposed
   ("sub-pixel" / depth-to-space) formulation does k'/k = 3/16 of the FLOPs
   for the u=8 stages. This measures both at the real stage shapes.

2. int8 conv: v5e MXU int8 peak is 2x bf16. Measures whether an int8
   lax.conv lowers to the fast path at MRF shapes.

Timing per CLAUDE.md: sync via device_get of an in-jit checksum.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from visual_onoma_to_wave_tpu.models.hifigan import _conv_transpose1d  # noqa: E402


def _timed(fn, make_args, iters=8):
    def run(i):
        return fn(*make_args(i))

    float(jax.device_get(run(0)))
    float(jax.device_get(run(1)))
    t0 = time.perf_counter()
    chk = None
    for i in range(iters):
        chk = run(2 + i)
    float(jax.device_get(chk))
    return (time.perf_counter() - t0) / iters


def subpixel_weights(w: np.ndarray, stride: int, torch_padding: int):
    """Repack an (already-flipped) ConvT kernel (K, Cin, Cout) into a dense
    k'=3 conv kernel (3, Cin, stride*Cout) whose output, reshaped
    (B,T,u,Cout)->(B,T*u,Cout), equals _conv_transpose1d exactly.

    Derivation: with lhs_dilation=u and pad p=k-1-torch_padding, output
    n=m*u+r draws on taps i with (n-p+i) % u == 0; for k=2u that is two taps
    i0=(p-r)%u and i0+u at input offsets o=(r-p+i)//u in {-1,0,1}.
    """
    k, cin, cout = w.shape
    u = stride
    p = k - 1 - torch_padding
    W = np.zeros((3, cin, u, cout), w.dtype)
    for r in range(u):
        i0 = (p - r) % u
        for i in range(i0, k, u):
            o = (r - p + i) // u
            assert -1 <= o <= 1, (r, i, o)
            W[o + 1, :, r, :] += w[i]
    return W.reshape(3, cin, u * cout)


def subpixel_convt(x, W3, b, stride, dtype=jnp.bfloat16):
    """x: (B,T,Cin); W3: (3, Cin, u*Cout) from subpixel_weights."""
    B, T, _ = x.shape
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), W3.astype(dtype), window_strides=(1,),
        padding=[(1, 1)], dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32).astype(dtype)
    y = y.reshape(B, T * stride, -1)
    return y + b.astype(dtype) if b is not None else y


def main():
    rng = np.random.default_rng(0)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}))
    B = 128
    stages = [  # (T_in, Cin, Cout, k, u) = ups.0..3 at 512 mel frames
        (512, 512, 256, 16, 8),
        (4096, 256, 128, 16, 8),
        (32768, 128, 64, 4, 2),
        (65536, 64, 32, 4, 2),
    ]
    results = []
    if "--int8-only" in sys.argv:
        stages = []
    for T, cin, cout, k, u in stages:
        tp = (k - u) // 2
        w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.05
        b = rng.standard_normal((cout,)).astype(np.float32) * 0.01
        W3 = subpixel_weights(w, u, tp)
        wd, bd, W3d = map(jax.device_put, (w, b, W3))

        # inputs are generated ON DEVICE: host->device of (B,T,Cin) f32 at
        # these shapes is GBs over the tunneled link (minutes)
        make_x = jax.jit(lambda key: jax.random.normal(
            key, (B, T, cin), jnp.float32))  # noqa: B023
        xd = make_x(jax.random.PRNGKey(T))

        # exactness check on a small on-device slice (f32)
        @jax.jit
        def _err(x):
            ref = _conv_transpose1d(x, wd, bd, u, tp, dtype=jnp.float32)  # noqa: B023
            got = subpixel_convt(x, W3d, bd, u, dtype=jnp.float32)  # noqa: B023
            return jnp.max(jnp.abs(ref - got))

        err = float(jax.device_get(_err(xd[:2, :256])))

        @jax.jit
        def f_dil(x, s):
            y = _conv_transpose1d(x + s, wd, bd, u, tp, dtype=jnp.bfloat16)  # noqa: B023
            return jnp.sum(y.astype(jnp.float32) * 1e-6)

        @jax.jit
        def f_sub(x, s):
            y = subpixel_convt(x + s, W3d, bd, u, dtype=jnp.bfloat16)  # noqa: B023
            return jnp.sum(y.astype(jnp.float32) * 1e-6)

        t_dil = _timed(f_dil, lambda i: (xd, jnp.float32(i * 1e-7)))
        t_sub = _timed(f_sub, lambda i: (xd, jnp.float32(i * 1e-7)))
        useful = 2 * B * T * u * (k / u + 1) * cin * cout  # ~taps/out * 2
        results.append({
            "stage": f"T{T} {cin}->{cout} k{k} u{u}",
            "max_abs_err": err,
            "dilated_ms": round(t_dil * 1e3, 2),
            "subpixel_ms": round(t_sub * 1e3, 2),
            "speedup": round(t_dil / t_sub, 2),
            "dilated_tflops_nominal": round(
                2 * B * T * u * k * cin * cout / t_dil / 1e12, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    # --- int8 MXU probe: chained matmuls with realistic requantization ---
    # NOTE: an int8 lax.conv_general_dilated at MRF shapes stalls >6 min in
    # XLA:TPU compilation on this stack (measured 2026-08-16), so the viable
    # int8 conv path would be shifted-slice dots; this probe measures that
    # dot path's ceiling: a chain of (8192x2048)x(2048x2048) dots where int8
    # requantizes (shift+clip+cast) between layers like a W8A8 network would.
    M, K = 8192, 2048
    CHAIN = 16
    x8 = jax.jit(lambda key: jax.random.randint(
        key, (M, K), -127, 127, jnp.int8))(jax.random.PRNGKey(0))
    w8 = jax.jit(lambda key: jax.random.randint(
        key, (K, K), -5, 5, jnp.int8))(jax.random.PRNGKey(1))
    xb = jax.jit(lambda key: jax.random.normal(
        key, (M, K), jnp.bfloat16))(jax.random.PRNGKey(2))
    wb = jax.jit(lambda key: jax.random.normal(
        key, (K, K), jnp.bfloat16) * 0.02)(jax.random.PRNGKey(3))
    float(jax.device_get(jnp.sum(xb.astype(jnp.float32))))

    @jax.jit
    def f_bf(x, w):
        def body(i, y):
            z = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return z.astype(jnp.bfloat16)
        y = jax.lax.fori_loop(0, CHAIN, body, x)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def f_i8(x, w):
        def body(i, y):
            z = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return jnp.clip(z >> 10, -127, 127).astype(jnp.int8)
        y = jax.lax.fori_loop(0, CHAIN, body, x)
        return jnp.sum(y.astype(jnp.int32)).astype(jnp.float32)

    fl = 2 * M * K * K
    out = {"matmul_chain": f"{M}x{K}x{K} x{CHAIN}"}
    for name, f, x, w in [("bf16", f_bf, xb, wb), ("int8", f_i8, x8, w8)]:
        t = _timed(f, lambda i: (x, w), iters=4) / CHAIN  # noqa: B023
        out[f"{name}_us"] = round(t * 1e6, 1)
        out[f"{name}_tflops"] = round(fl / t / 1e12, 1)
    out["int8_speedup"] = round(out["bf16_us"] / out["int8_us"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
