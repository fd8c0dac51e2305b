"""Training-step benchmark + component breakdown on the real chip.

    python benchmarks/bench_train.py --batch 64 [--bf16]

Measures (steady-state, synced through device_get of in-jit scalars;
2 warmups absorb compile + the one-time executable upload):
  * full train step (fwd+loss+bwd+clip+Adam, donated state)
  * fwd-only loss and fwd+bwd (no optimizer)
  * PostNet-only fwd+bwd (the 512-channel conv stack is the single
    biggest FLOP block in the model)
  * host->device transfer of one batch
  * XLA cost_analysis FLOPs -> achieved TFLOPS vs the v5e peak

Prints one JSON line per metric. Reference anchor for the loop being
measured: /root/reference/scripts/04_train.py:126-175.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

V5E_PEAK_BF16 = 197e12   # TFLOPS, per chip
V5E_PEAK_F32 = 49e12     # MXU f32 ~= bf16/4


def _sync(x):
    import jax
    return float(jax.device_get(x))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mel-len", type=int, default=512)
    ap.add_argument("--profile-dir", default=None,
                    help="also capture a jax.profiler trace of 3 steps here")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.models.layers import PostNet
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)
    from visual_onoma_to_wave_tpu.training.loss import fastspeech2_loss

    B, T, C = args.batch, args.mel_len, 8
    cfg = Config()
    if args.bf16:
        cfg = cfg.replace(train=cfg.train.__class__(
            optimizer=cfg.train.optimizer, step=cfg.train.step,
            max_mel_len=T, seed=0, compute_dtype="bfloat16"))
    model = VTTS.from_config(cfg, n_vocab=64, max_mel_len=T)
    rng = np.random.default_rng(0)
    batch_np = {
        "audiotypes": (np.arange(B) % 10).astype(np.int32),
        "texts": rng.integers(1, 64, (B, C)).astype(np.int32),
        "src_lens": np.full((B,), C, np.int32),
        "image_cells": rng.uniform(0, 1, (B, C, 24, 102)).astype(np.float32),
        "energies": rng.standard_normal((B, C)).astype(np.float32),
        "durations": np.full((B, C), T // C, np.int32),
        "mels": rng.standard_normal((B, T, 80)).astype(np.float32),
    }
    platform = jax.devices()[0].platform
    out = lambda m, ms, **kw: print(json.dumps(  # noqa: E731
        {"metric": m, "ms": round(ms * 1e3, 3), "batch": B,
         "dtype": "bf16" if args.bf16 else "f32", "platform": platform, **kw}))

    # ---- host->device transfer --------------------------------------------
    dev = jax.devices()[0]
    for _ in range(2):
        placed = jax.device_put(batch_np, dev)
        _sync(placed["mels"][0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        placed = jax.device_put(batch_np, dev)
        _sync(placed["mels"][0, 0, 0])
    out("batch_transfer", (time.perf_counter() - t0) / args.iters,
        mbytes=round(sum(v.nbytes for v in batch_np.values()) / 1e6, 1))
    batch = placed

    tx = make_optimizer(init_lr=1e-4, warmup_steps=4000)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, True)
    key = jax.random.PRNGKey(7)

    def apply_loss(params, batch_stats, batch, rng_):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"], texts=batch["texts"],
            src_lens=batch["src_lens"], image_cells=batch["image_cells"],
            energy_targets=batch["energies"],
            duration_targets=batch["durations"],
            use_image=True, deterministic=False,
            max_mel_len=batch["mels"].shape[1],
            rngs={"dropout": rng_}, mutable=["batch_stats"])
        return fastspeech2_loss(outs, batch)["total_loss"]

    fwd = jax.jit(apply_loss)
    fwd_bwd = jax.jit(lambda p, bs, b, r: jax.grad(apply_loss)(p, bs, b, r))

    def timed(fn, *a):
        for i in range(2):
            r = fn(*a)
            _sync(jax.tree.leaves(r)[0].ravel()[0] if not np.isscalar(r) else r)
        t0 = time.perf_counter()
        r = None
        for i in range(args.iters):
            r = fn(*a)
        _sync(jax.tree.leaves(r)[0].ravel()[0])
        return (time.perf_counter() - t0) / args.iters

    out("forward_loss", timed(fwd, state.params, state.batch_stats, batch, key))
    out("forward_backward",
        timed(fwd_bwd, state.params, state.batch_stats, batch, key))

    # ---- PostNet in isolation ----------------------------------------------
    pn = PostNet(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    mels = batch["mels"]
    pn_vars = pn.init({"params": jax.random.PRNGKey(1),
                       "dropout": jax.random.PRNGKey(2)}, mels, True)

    def pn_loss(p, bs, x, r):
        y, _ = pn.apply({"params": p, "batch_stats": bs}, x, False,
                        rngs={"dropout": r}, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    pn_grad = jax.jit(lambda p, bs, x, r: jax.grad(pn_loss)(p, bs, x, r))
    out("postnet_fwd_bwd", timed(pn_grad, pn_vars["params"],
                                 pn_vars.get("batch_stats", {}), mels, key))

    # ---- full train step (donated state: chain states through the loop) ----
    step_fn = make_train_step(model, tx, True)
    s = state
    for _ in range(2):
        s, losses = step_fn(s, batch, key)
        _sync(losses["total_loss"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        s, losses = step_fn(s, batch, key)
    _sync(losses["total_loss"])
    dt = (time.perf_counter() - t0) / args.iters
    out("train_step", dt, frames_per_sec=round(B * T / dt))

    # ---- XLA cost analysis -> achieved TFLOPS ------------------------------
    try:
        ca = jax.jit(step_fn).lower(s, batch, key).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        peak = V5E_PEAK_BF16 if args.bf16 else V5E_PEAK_F32
        print(json.dumps({
            "metric": "train_step_roofline", "batch": B,
            "dtype": "bf16" if args.bf16 else "f32",
            "model_tflop_per_step": round(flops / 1e12, 3),
            "achieved_tflops": round(flops / dt / 1e12, 1),
            "pct_of_v5e_peak": round(100 * flops / dt / peak, 1),
        }))
    except Exception as e:  # cost_analysis availability varies per backend
        print(json.dumps({"metric": "train_step_roofline",
                          "error": str(e)[:120]}))

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
        for _ in range(3):
            s, losses = step_fn(s, batch, key)
        _sync(losses["total_loss"])
        jax.profiler.stop_trace()
        print(json.dumps({"metric": "profile_trace",
                          "dir": args.profile_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
