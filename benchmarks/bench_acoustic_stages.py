"""Per-stage timing of the acoustic (VTTS) forward at the serving shape.

The fused serving path is now acoustic-dominated (~61% with the Vocos
vocoder, docs/PERF.md), so this measures where the ~36 ms goes:
VFE -> encoder FFT stack (T=C=8) -> variance adaptor + length regulator ->
decoder FFT stack (T=512, the FLOP bulk) -> mel linear + PostNet. Each
sub-module is timed standalone with its own params at the exact shapes the
full forward sees (B=128, C=8, T=512, d=256); the full forward is timed
for the cross-check and the adaptor/glue residual. The decoder is further
split into its attention and conv-FFN sub-blocks.

Methodology per CLAUDE.md: sync via device_get of an in-jit checksum,
2 warmups. The tunneled platform adds a ~8-10 ms per-dispatch floor that
dwarfs the small stages, so every standalone stage is timed at 1x and 2x
chained repetitions inside ONE executable (serialized through a scalar of
the previous output so XLA cannot CSE) and reported as the slope — the
floor and input-upload cancel. Usage:
python benchmarks/bench_acoustic_stages.py [--batch N] [--bf16].
One JSON line per measurement.
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
    from visual_onoma_to_wave_tpu.models.layers import (
        FFTBlock, MultiHeadAttention, PositionwiseFeedForward, PostNet)
    from visual_onoma_to_wave_tpu.models.vfe import VisualFeatureExtractor
    from visual_onoma_to_wave_tpu.models.vtts import FFTStack

    B = 128
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    C, T, D = 8, 512, 256
    dtype = jnp.bfloat16 if "--bf16" in sys.argv else jnp.float32
    rng = np.random.default_rng(0)

    def timed(fn, make_args, iters=5):
        f = jax.jit(fn)
        float(jax.device_get(f(*make_args(0))))
        float(jax.device_get(f(*make_args(1))))
        t0 = time.perf_counter()
        chk = None
        for i in range(iters):
            chk = f(*make_args(2 + i))
        float(jax.device_get(chk))
        return (time.perf_counter() - t0) / iters

    def emit(stage, dt, flops=None):
        # pct_peak vs the bf16 MXU peak: default TPU matmul precision for
        # f32 operands is a bf16 pass with f32 accumulation (docs/PERF.md)
        peak = 197e12
        rec = {"stage": stage, "ms": round(dt * 1e3, 2)}
        if flops:
            rec["tflops"] = round(flops / dt / 1e12, 1)
            rec["pct_peak"] = round(100 * flops / dt / peak, 1)
        print(json.dumps(rec), flush=True)
        return dt

    def net(stage, step_fn, x0, flops=None):
        """Time `step_fn` chained r and 2r times inside one jit; report the
        slope (cancels the tunnel's per-dispatch floor). step_fn(x, t) must
        return an array of x's shape; t is a scalar serializer."""
        def tower(reps):
            def run(x, salt):
                t = salt
                for _ in range(reps):
                    x = step_fn(x, t)
                    t = jnp.sum(x[(0,) * (x.ndim - 1)][:4]).astype(
                        jnp.float32) * 1e-12
                return jnp.sum(x[..., ::7].astype(jnp.float32))
            return run
        r = 2
        t1 = timed(tower(r), lambda i: (x0, jnp.float32(1e-3 * i)))
        t2 = timed(tower(2 * r), lambda i: (x0, jnp.float32(1e-3 * i)))
        return emit(stage, max(t2 - t1, 1e-6) / r, flops)

    # ---- full forward (bench.py's exact acoustic configuration) ----------
    cfg = Config()
    model = VTTS.from_config(cfg, n_vocab=64, max_mel_len=T)
    batch = {
        "audiotypes": jnp.asarray((np.arange(B) % 10).astype(np.int32)),
        "texts": jnp.asarray(rng.integers(1, 64, (B, C)).astype(np.int32)),
        "src_lens": jnp.asarray(np.full((B,), C, np.int32)),
        "image_cells": jnp.asarray(
            rng.uniform(0, 1, (B, C, 24, 102)).astype(np.float32)),
    }
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True))()

    def full(params, batch_stats, salt):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"], texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch["image_cells"] + salt,
            use_image=True, deterministic=True)
        return jnp.sum(out["postnet_mel"][:, ::17].astype(jnp.float32))

    params, bstats = variables["params"], variables.get("batch_stats", {})
    t_full = emit("FULL_forward", timed(
        full, lambda i: (params, bstats, jnp.float32(1e-3 * i))))

    # ---- standalone stages ------------------------------------------------
    x_txt = jnp.asarray(rng.standard_normal((B, C, D)).astype(np.float32))
    x_mel = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    no_pad_txt = jnp.zeros((B, C), bool)
    no_pad_mel = jnp.zeros((B, T), bool)

    # VFE (output (B, C, 256) != input shape: serialize via salt only)
    vfe = VisualFeatureExtractor(embed_dim=D)
    pv = vfe.init(jax.random.PRNGKey(0), batch["image_cells"], True)
    t_vfe = net(
        "vfe",
        lambda img, t: img + 1e-12 * jnp.sum(
            vfe.apply(pv, img + t, True)[:, :, ::7]).astype(img.dtype),
        batch["image_cells"])

    # encoder stack (4 layers at T=8)
    enc = FFTStack(4, D, 2, 1024, (9, 1), 0.2, dtype=dtype)
    pe = enc.init(jax.random.PRNGKey(0), x_txt, no_pad_txt, True)
    t_enc = net(
        "encoder_x4_T8",
        lambda x, t: enc.apply(pe, x + t, no_pad_txt, True), x_txt)

    # decoder stack (6 layers at T=512) — the FLOP bulk
    dec = FFTStack(6, D, 2, 1024, (9, 1), 0.2, dtype=dtype)
    pd = dec.init(jax.random.PRNGKey(0), x_mel, no_pad_mel, True)
    # per layer: attn projections 4*B*T*D^2, logits+AV 2*B*H*T^2*dk,
    # FFN 9*B*T*D*1024 + B*T*1024*D  (MACs; *2 for FLOPs)
    attn_macs = 4 * B * T * D * D + 2 * B * 2 * T * T * 128
    ffn_macs = 9 * B * T * D * 1024 + B * T * 1024 * D
    t_dec = net(
        "decoder_x6_T512",
        lambda x, t: dec.apply(pd, x + t, no_pad_mel, True), x_mel,
        flops=2 * 6 * (attn_macs + ffn_macs))

    # decoder split: attention-only / FFN-only (per single sub-block x6)
    # — measured exactly as the model runs it: key_pad_mask fast path
    attn = MultiHeadAttention(2, D, 128, 128, 0.2, dtype=dtype)
    amask = jnp.zeros((B, T, T), bool)
    no_pad_f = jnp.zeros((B, T), bool)
    pa = attn.init(jax.random.PRNGKey(0), x_mel, amask, True)
    ta = net("attn_T512",
             lambda x, t: attn.apply(pa, x + t, None, True,
                                     key_pad_mask=no_pad_f), x_mel,
             flops=2 * attn_macs)
    emit("attn_x6_extrapolated", 6 * ta, flops=2 * 6 * attn_macs)

    # fused Pallas attention core (ops/pallas_attention.py) — same params
    fattn = MultiHeadAttention(2, D, 128, 128, 0.2, dtype=dtype,
                               fused_kernel=True)
    tfa = net("attn_T512_pallas",
              lambda x, t: fattn.apply(pa, x + t, amask, True,
                                       key_pad_mask=no_pad_f), x_mel,
              flops=2 * attn_macs)
    emit("attn_x6_pallas_extrapolated", 6 * tfa, flops=2 * 6 * attn_macs)

    ffn = PositionwiseFeedForward(D, 1024, (9, 1), 0.2, dtype=dtype)
    pf = ffn.init(jax.random.PRNGKey(0), x_mel, True)
    tf_ = net("ffn_T512",
              lambda x, t: ffn.apply(pf, x + t, True), x_mel,
              flops=2 * ffn_macs)
    emit("ffn_x6_extrapolated", 6 * tf_, flops=2 * 6 * ffn_macs)

    # mel linear + postnet
    post = PostNet(n_mel_channels=80, embedding_dim=512, dtype=dtype)
    mel80 = jnp.asarray(rng.standard_normal((B, T, 80)).astype(np.float32))
    pp = post.init({"params": jax.random.PRNGKey(0)}, mel80, True)
    post_macs = B * T * 5 * (80 * 512 + 3 * 512 * 512 + 512 * 80)
    t_post = net(
        "postnet", lambda m, t: post.apply(pp, m + t, True), mel80,
        flops=2 * post_macs)

    # full forward with the fused attention kernel (same param tree) +
    # on-device parity vs the XLA forward
    import dataclasses
    cfg_f = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_attention=True))
    model_f = VTTS.from_config(cfg_f, n_vocab=64, max_mel_len=T)

    def full_f(params, batch_stats, salt):
        out = model_f.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"], texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch["image_cells"] + salt,
            use_image=True, deterministic=True)
        return jnp.sum(out["postnet_mel"][:, ::17].astype(jnp.float32))

    t_full_f = emit("FULL_forward_fused_attn", timed(
        full_f, lambda i: (params, bstats, jnp.float32(1e-3 * i))))

    @jax.jit
    def parity(params, batch_stats):
        kw = dict(audiotypes=batch["audiotypes"], texts=batch["texts"],
                  src_lens=batch["src_lens"],
                  image_cells=batch["image_cells"],
                  use_image=True, deterministic=True)
        a = model.apply({"params": params, "batch_stats": batch_stats},
                        **kw)["postnet_mel"]
        b = model_f.apply({"params": params, "batch_stats": batch_stats},
                          **kw)["postnet_mel"]
        return (jnp.max(jnp.abs(a - b)) /
                jnp.maximum(jnp.max(jnp.abs(a)), 1e-6))
    print(json.dumps({"stage": "fused_attn_max_rel_err",
                      "value": float(jax.device_get(
                          parity(params, bstats)))}), flush=True)

    glue = t_full - (t_vfe + t_enc + t_dec + t_post)
    emit("residual_adaptor_glue_and_dispatch", max(glue, 0.0))
    print(json.dumps({"stage": "SUMMARY", "B": B,
                      "dtype": "bf16" if dtype == jnp.bfloat16 else "f32",
                      "full_ms": round(t_full * 1e3, 2),
                      "decoder_pct": round(100 * t_dec / t_full, 1)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
