"""Multi-process (multi-host analog) data-parallel training.

Spawns 2 OS processes x 4 virtual CPU devices federated with gloo
collectives (parallel.init_distributed) and asserts the sharded result
equals the single-process 8-device run — the hermetic stand-in for a
2-host TPU pod slice (reference ceiling: single-process DataParallel,
scripts/04_train.py:75).
"""
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
WORKER = pathlib.Path(__file__).resolve().parent / "distributed_worker.py"

# every test here spawns a real 2-process gloo cluster (~2-3 min each on
# the 1-core CI host) — fast lane skips them (`pytest -m 'not slow'`)
pytestmark = pytest.mark.slow


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# cluster-bringup failures that are load/timing artifacts of an
# oversubscribed CI host (gloo's context init has a hard 30 s key-value
# deadline), not product bugs — retried once on a fresh port
_INFRA_ERRORS = ("Gloo context initialization failed", "DEADLINE_EXCEEDED",
                 "BarrierError", "Coordination service")


def _spawn_cluster(mode, extra_args, tmp_path, n_proc=2, devs=4,
                   timeout=900, retries=1):
    """Launch the worker in n_proc processes; return their JSON results."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = str(REPO)
    for attempt in range(retries + 1):
        port = _free_port()
        procs, outs = [], []
        for pid in range(n_proc):
            out = tmp_path / f"result_{pid}.json"
            out.unlink(missing_ok=True)
            outs.append(out)
            args = [sys.executable, str(WORKER), mode, str(pid), str(n_proc),
                    str(port), str(devs)] + [str(a)
                                             for a in extra_args(pid, out)]
            procs.append(subprocess.Popen(
                args, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        logs = [p.communicate(timeout=timeout)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            return [json.loads(o.read_text()) for o in outs]
        infra = any(e in log for log in logs for e in _INFRA_ERRORS)
        if not (infra and attempt < retries):
            for p, log in zip(procs, logs):
                assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    raise AssertionError("unreachable")


def test_multiprocess_step_equals_single_process(tmp_path):
    """3 sharded train steps over 2 procs x 4 devices == the same steps on
    the in-process 8-device mesh (loss and full-parameter digest)."""
    results = _spawn_cluster("step", lambda pid, out: [out], tmp_path)
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 8 for r in results)
    # both processes hold the same replicated outcome
    assert results[0]["total_loss"] == results[1]["total_loss"]
    assert results[0]["digest"] == results[1]["digest"]

    # single-process reference on this test process's own 8-device mesh
    import jax

    from distributed_worker import build_step_problem, params_digest
    from visual_onoma_to_wave_tpu.parallel import get_mesh, shard_batch
    from visual_onoma_to_wave_tpu.training import (
        create_train_state, make_optimizer, make_train_step)

    model, batch = build_step_problem()
    tx = make_optimizer(init_lr=1e-3, warmup_steps=10)
    step_fn = make_train_step(model, tx, use_image=False)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch,
                               use_image=False)
    mesh = get_mesh(8)
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(7)
    for _ in range(3):
        state, losses = step_fn(state, sharded, rng)

    np.testing.assert_allclose(results[0]["total_loss"],
                               float(losses["total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(results[0]["digest"], params_digest(state.params),
                               rtol=1e-5)


def test_multiprocess_trainer_end_to_end(tmp_path):
    """Full Trainer (loader -> sharded steps -> shared-dir orbax checkpoint
    -> evaluate with quality metrics) across 2 processes matches the
    single-process run, and the multi-host checkpoint is complete."""
    from distributed_worker import tiny_trainer_config
    from test_trainer_synthesis import make_preprocessed

    pre = tmp_path / "pre"
    pre.mkdir()
    make_preprocessed(pre, n_clips=16)

    shared_out = tmp_path / "mp_out"
    results = _spawn_cluster(
        "trainer", lambda pid, out: [pre, shared_out, out], tmp_path)
    assert all(r["final_step"] >= 3 for r in results)
    assert results[0]["digest"] == results[1]["digest"]
    assert results[0]["ckpt_steps"], "no checkpoint written"

    # single-process reference (8-device in-process mesh, same config)
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_trainer_config(pre, tmp_path / "sp_out")
    trainer = Trainer(cfg)
    state = trainer.train()
    val = trainer.evaluate(metrics=True)
    from distributed_worker import params_digest
    np.testing.assert_allclose(results[0]["digest"], params_digest(state.params),
                               rtol=1e-5)
    for k, v in results[0]["val"].items():
        np.testing.assert_allclose(v, val[k], rtol=1e-3, atol=1e-5,
                                   err_msg=k)

    # the shared checkpoint restores into a fresh single-process Trainer
    cfg2 = tiny_trainer_config(pre, shared_out)
    t2 = Trainer(cfg2, restore_step=-1)
    assert int(t2.state.step) >= 3
    np.testing.assert_allclose(params_digest(t2.state.params),
                               results[0]["digest"], rtol=1e-6)
    trainer.ckpt.close()
    t2.ckpt.close()


def test_multiprocess_vocoder_gan_training(tmp_path):
    """The GAN vocoder trainer over 2 processes x 4 devices (incl. EMA and
    primary-only shared-dir checkpointing) matches the single-process
    8-device mesh run, and the checkpoint restores cross-topology."""
    shared_ckpt = tmp_path / "voc_ckpt"
    results = _spawn_cluster(
        "vocoder", lambda pid, out: [shared_ckpt, out], tmp_path)
    assert results[0]["digest"] == results[1]["digest"]
    assert (shared_ckpt / "2" / "generator").exists()
    assert (shared_ckpt / "2" / "generator_ema").exists()

    from distributed_worker import params_digest, vocoder_problem

    trainer = vocoder_problem()  # single-process, 8-device mesh
    state = trainer.train(steps=2)
    np.testing.assert_allclose(results[0]["digest"],
                               params_digest(state.gen_params), rtol=1e-5)
    np.testing.assert_allclose(results[0]["ema_digest"],
                               params_digest(state.gen_ema), rtol=1e-5)
    np.testing.assert_allclose(
        results[0]["disc_digest"],
        params_digest((state.mpd_params, state.msd_params)), rtol=1e-5)

    # the multi-host checkpoint restores into a fresh single-process trainer
    t2 = vocoder_problem(ckpt_dir=shared_ckpt)
    assert t2.restore(2) == 2
    np.testing.assert_allclose(params_digest(t2.state.gen_params),
                               results[0]["digest"], rtol=1e-6)
