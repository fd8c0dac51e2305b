"""Checkpoint utilities: orbax manager + save_params/load_params roundtrips."""
import numpy as np
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.utils.checkpoint import (
    CheckpointManager, load_params, save_params)


def test_save_load_params_roundtrip(tmp_path):
    tree = {
        "params": {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                             "bias": jnp.zeros(3)}},
        "batch_stats": {"bn": {"mean": jnp.ones(4), "var": jnp.full(4, 2.0)}},
    }
    save_params(tmp_path / "v", tree)
    got = load_params(tmp_path / "v")
    for path in (("params", "dense", "kernel"), ("params", "dense", "bias"),
                 ("batch_stats", "bn", "mean"), ("batch_stats", "bn", "var")):
        a, b = tree, got
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_keep_and_latest(tmp_path):
    import optax
    from visual_onoma_to_wave_tpu.training.train_state import TrainState

    tx = optax.sgd(1e-2)
    params = {"w": jnp.zeros((2, 2))}
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params))
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    for step in (1, 2, 3):
        mgr.save(state.replace(step=step,
                               params={"w": jnp.full((2, 2), float(step))}))
    assert mgr.latest_step() == 3
    assert len(mgr.all_steps()) <= 2          # max_to_keep enforced
    restored = mgr.restore(state, 3)
    assert int(restored.step) == 3
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.full((2, 2), 3.0))
    mgr.close()
