"""Training-step tests: schedule parity, tiny overfit, 1-vs-8-device equality."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.models import VTTS
from visual_onoma_to_wave_tpu.parallel import get_mesh, shard_batch
from visual_onoma_to_wave_tpu.training import (
    create_train_state,
    make_optimizer,
    make_train_step,
    noam_schedule,
)


def reference_lr_scale(step, warmup, anneal_steps, anneal_rate):
    """Transcription of reference ScheduledOptim._get_lr_scale (optimizer.py:33-43)."""
    lr = min(np.power(step, -0.5), np.power(warmup, -1.5) * step)
    for s in anneal_steps:
        if step > s:
            lr *= anneal_rate
    return lr


def test_noam_schedule_matches_reference():
    sched = noam_schedule(0.001, 4000, (300000, 400000, 500000), 0.3)
    for optax_count in [0, 1, 10, 3999, 4000, 100000, 299999, 300000, 450000, 600000]:
        # optax count c corresponds to reference current_step c+1 (pre-increment)
        ref = 0.001 * reference_lr_scale(optax_count + 1, 4000, (300000, 400000, 500000), 0.3)
        ours = float(sched(optax_count))
        assert abs(ours - ref) / ref < 1e-5, (optax_count, ours, ref)


def tiny_model_and_batch(use_image=False, batch=4, chars=4, mel_len=32):
    cfg = Config()
    model = VTTS(
        n_vocab=10, n_audiotype=3, hidden=32, encoder_layers=1,
        decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
        max_seq_len=64, max_mel_len=mel_len, n_mels=16,
        vfe_layers=1, is_energy=True, is_kurtosis=False,
        energy_stats=(-2.0, 2.0, 0.0, 1.0),
    )
    rng = np.random.default_rng(0)
    texts = rng.integers(1, 10, (batch, chars)).astype(np.int32)
    durations = np.full((batch, chars), mel_len // chars, np.int32)
    mels = rng.standard_normal((batch, mel_len, 16)).astype(np.float32)
    b = {
        "audiotypes": jnp.asarray(rng.integers(0, 3, batch).astype(np.int32)),
        "texts": jnp.asarray(texts),
        "src_lens": jnp.full((batch,), chars, jnp.int32),
        "mels": jnp.asarray(mels),
        "energies": jnp.asarray(rng.standard_normal((batch, chars)).astype(np.float32)),
        "durations": jnp.asarray(durations),
    }
    if use_image:
        b["image_cells"] = jnp.asarray(
            rng.uniform(0, 1, (batch, chars, 8, 16)).astype(np.float32))
    return model, b


def test_tiny_overfit_loss_decreases():
    model, batch = tiny_model_and_batch()
    tx = make_optimizer(init_lr=1e-2, warmup_steps=10, grad_clip=1.0)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, use_image=False)
    step_fn = make_train_step(model, tx, use_image=False)
    rng = jax.random.PRNGKey(42)
    first = None
    for i in range(60):
        state, losses = step_fn(state, batch, rng)
        if first is None:
            first = float(losses["total_loss"])
    last = float(losses["total_loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


@pytest.mark.slow  # ~46 s: compiles the train step twice (1-dev + 8-dev)
def test_data_parallel_equals_single_device():
    """Same batch, same init: loss after 3 steps must match between a
    1-device run and an 8-device sharded run (the JAX analog of a
    fake-backend distributed test; SURVEY.md §4f)."""
    model, batch = tiny_model_and_batch(batch=8)
    tx = make_optimizer(init_lr=1e-3, warmup_steps=10)
    step_fn = make_train_step(model, tx, use_image=False)
    rng = jax.random.PRNGKey(7)

    # the train step donates its input state, so build one per run
    # (same rng -> identical init)
    def fresh_state():
        return create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                                  use_image=False)

    # single device
    s1 = fresh_state()
    for _ in range(3):
        s1, l1 = step_fn(s1, batch, rng)

    # 8-device mesh: params replicated implicitly, batch sharded
    mesh = get_mesh(8)
    assert mesh.size == 8
    sharded = shard_batch(batch, mesh)
    s8 = fresh_state()
    for _ in range(3):
        s8, l8 = step_fn(s8, sharded, rng)

    # dropout RNG is per-step (not per-shard), so results are identical
    np.testing.assert_allclose(
        float(l1["total_loss"]), float(l8["total_loss"]), rtol=1e-4)
    p1 = jax.tree.leaves(s1.params)[0]
    p8 = jax.tree.leaves(s8.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-4, atol=1e-6)


def test_grad_clip_bounds_update():
    model, batch = tiny_model_and_batch()
    tx = make_optimizer(init_lr=1.0, warmup_steps=1, grad_clip=0.5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, use_image=False)
    step_fn = make_train_step(model, tx, use_image=False)
    state, losses = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(losses["grad_norm"]))


def test_bf16_compute_overfit_and_closeness():
    """bfloat16 compute (f32 params/LN/softmax/mel-head) must train — loss
    decreases on a tiny overfit — and its forward must stay close to f32."""
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)

    kw = dict(n_vocab=16, n_audiotype=2, hidden=32, encoder_layers=1,
              decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
              max_seq_len=64, max_mel_len=64, n_mels=16, vfe_layers=1,
              energy_stats=(-2.0, 2.0, 0.0, 1.0))
    rng = np.random.default_rng(0)
    B, C = 4, 4
    batch = {
        "audiotypes": (np.arange(B) % 2).astype(np.int32),
        "texts": rng.integers(1, 16, (B, C)).astype(np.int32),
        "src_lens": np.full((B,), C, np.int32),
        "image_cells": rng.uniform(0, 1, (B, C, 24, 30)).astype(np.float32),
        "energies": rng.standard_normal((B, C)).astype(np.float32),
        "durations": np.full((B, C), 8, np.int32),
        "mels": rng.standard_normal((B, 64, 16)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    model16 = VTTS(**kw, dtype=jnp.bfloat16)
    tx = make_optimizer(init_lr=2e-3, warmup_steps=5)
    state = create_train_state(model16, tx, jax.random.PRNGKey(0), batch, True)
    # params must remain f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(state.params))
    step = make_train_step(model16, tx, True)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(30):
        state, losses = step(state, batch, key)
        if first is None:
            first = float(losses["total_loss"])
    last = float(losses["total_loss"])
    assert np.isfinite(last) and last < first * 0.8, (first, last)

    # forward closeness vs f32 with identical params
    model32 = VTTS(**kw)
    out16 = model16.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        audiotypes=batch["audiotypes"], texts=batch["texts"],
        src_lens=batch["src_lens"], image_cells=batch["image_cells"],
        energy_targets=batch["energies"], duration_targets=batch["durations"],
        use_image=True, deterministic=True)
    out32 = model32.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        audiotypes=batch["audiotypes"], texts=batch["texts"],
        src_lens=batch["src_lens"], image_cells=batch["image_cells"],
        energy_targets=batch["energies"], duration_targets=batch["durations"],
        use_image=True, deterministic=True)
    m16, m32 = np.asarray(out16["postnet_mel"]), np.asarray(out32["postnet_mel"])
    assert m16.dtype == np.float32
    denom = np.abs(m32).mean() + 1e-6
    assert np.abs(m16 - m32).mean() / denom < 0.1


def test_grad_accumulation_equals_big_batch():
    """grad_acc_steps=2 over two half-batches must match one full-batch step
    (optax.MultiSteps path; reference grad_acc_step at 04_train.py:136-141)."""
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)

    kw = dict(n_vocab=16, n_audiotype=2, hidden=32, encoder_layers=1,
              decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
              max_seq_len=64, max_mel_len=64, n_mels=16, vfe_layers=1,
              encoder_dropout=0.0, decoder_dropout=0.0, vp_dropout=0.0,
              energy_stats=(-2.0, 2.0, 0.0, 1.0))
    model = VTTS(**kw)
    rng = np.random.default_rng(0)
    B, C = 4, 4

    def make_batch(b, seed):
        r = np.random.default_rng(seed)
        return {k: jnp.asarray(v) for k, v in {
            "audiotypes": (np.arange(b) % 2).astype(np.int32),
            "texts": r.integers(1, 16, (b, C)).astype(np.int32),
            "src_lens": np.full((b,), C, np.int32),
            "image_cells": r.uniform(0, 1, (b, C, 24, 30)).astype(np.float32),
            "energies": r.standard_normal((b, C)).astype(np.float32),
            "durations": np.full((b, C), 8, np.int32),
            "mels": r.standard_normal((b, 64, 16)).astype(np.float32),
        }.items()}

    full = make_batch(B, 1)
    halves = [
        {k: v[:B // 2] for k, v in full.items()},
        {k: v[B // 2:] for k, v in full.items()},
    ]
    key = jax.random.PRNGKey(0)

    tx1 = make_optimizer(init_lr=1e-2, warmup_steps=1)
    s1 = create_train_state(model, tx1, jax.random.PRNGKey(7), full, True)
    step1 = make_train_step(model, tx1, True)
    s1, _ = step1(s1, full, key)

    tx2 = make_optimizer(init_lr=1e-2, warmup_steps=1, grad_acc_steps=2)
    s2 = create_train_state(model, tx2, jax.random.PRNGKey(7), halves[0], True)
    # host copy: the train step donates its input state's buffers
    init_params = jax.tree.map(lambda x: np.asarray(x).copy(), s2.params)
    step2 = make_train_step(model, tx2, True)
    s2, _ = step2(s2, halves[0], key)
    # mid-accumulation: params must be UNCHANGED (MultiSteps holds the grad)
    same = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                        init_params, s2.params)
    assert all(jax.tree.leaves(same))
    s2, _ = step2(s2, halves[1], key)
    changed = jax.tree.map(lambda a, b: bool(jnp.any(a != b)),
                           init_params, s2.params)
    assert any(jax.tree.leaves(changed))

    # accumulated update ~ full-batch update (PostNet BatchNorm uses
    # per-micro-batch statistics, so equality is approximate by design)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     s1.params, s2.params)
    worst = max(jax.tree.leaves(d))
    assert worst < 0.05, worst


def test_training_is_deterministic():
    """Same seed + same data -> bitwise-identical losses across two runs
    (jit + threefry PRNG; no nondeterministic ops in the train step)."""
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)

    kw = dict(n_vocab=16, n_audiotype=2, hidden=32, encoder_layers=1,
              decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
              max_seq_len=64, max_mel_len=64, n_mels=16, vfe_layers=1,
              energy_stats=(-2.0, 2.0, 0.0, 1.0))
    rng = np.random.default_rng(0)
    B, C = 4, 4
    batch = {k: jnp.asarray(v) for k, v in {
        "audiotypes": (np.arange(B) % 2).astype(np.int32),
        "texts": rng.integers(1, 16, (B, C)).astype(np.int32),
        "src_lens": np.full((B,), C, np.int32),
        "image_cells": rng.uniform(0, 1, (B, C, 24, 30)).astype(np.float32),
        "energies": rng.standard_normal((B, C)).astype(np.float32),
        "durations": np.full((B, C), 8, np.int32),
        "mels": rng.standard_normal((B, 64, 16)).astype(np.float32),
    }.items()}

    def run():
        model = VTTS(**kw)
        tx = make_optimizer(init_lr=1e-3, warmup_steps=5)
        state = create_train_state(model, tx, jax.random.PRNGKey(3), batch, True)
        step = make_train_step(model, tx, True)
        losses = []
        for i in range(5):
            state, l = step(state, batch, jax.random.PRNGKey(100 + i))
            losses.append(float(l["total_loss"]))
        return losses

    a, b = run(), run()
    assert a == b, (a, b)
