"""Process-parallel training loader (data/loader.py) + the batch_plan
refactor it builds on: the planned composition must equal the legacy
sample-object flow, and the pooled stream must equal the serial stream
byte-for-byte (reference analog: DataLoader(num_workers=10),
04_train.py:50-58)."""
import numpy as np
import pytest

from test_trainer_synthesis import tiny_env  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def train_ds(tiny_env):  # noqa: F811
    from visual_onoma_to_wave_tpu.data.dataset import OnomaDataset

    return OnomaDataset("train.txt", tiny_env, sort=True, drop_last=True)


def test_batch_plan_matches_sample_sort(train_ds):
    """The metadata-only sort key (cleaned text length) reproduces the
    legacy sort over loaded Sample.text_ids exactly (stable order)."""
    plan = train_ds.batch_plan(group_size=4, seed=123)
    # recompute with the original strategy: load samples, sort the pool
    order = np.arange(len(train_ds.rows))
    rng = np.random.default_rng(123)
    rng.shuffle(order)
    pool_size = 4 * train_ds.batch_size
    expected = []
    for start in range(0, len(order), pool_size):
        pool_idx = [int(i) for i in order[start:start + pool_size]]
        pool = [(i, train_ds[i]) for i in pool_idx]
        pool.sort(key=lambda p: -len(p[1].text_ids))
        for b in range(0, len(pool), train_ds.batch_size):
            chunk = pool[b:b + train_ds.batch_size]
            if len(chunk) < train_ds.batch_size and train_ds.drop_last:
                continue
            expected.append([p[0] for p in chunk])
    assert plan == expected


def test_batches_equals_plan_load(train_ds):
    """batches() is exactly plan -> load_batch (same stream)."""
    a = list(train_ds.batches(group_size=2, seed=7))
    b = [train_ds.load_batch(c) for c in train_ds.batch_plan(2, seed=7)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.keys() == y.keys()
        for k in x:
            if k == "names":
                assert x[k] == y[k]
            else:
                np.testing.assert_array_equal(x[k], y[k])


def test_process_loader_serial_fallback(train_ds):
    """On this host (or num_workers=1) the loader stays serial and streams
    the identical batches."""
    from visual_onoma_to_wave_tpu.data.loader import ProcessLoader

    with ProcessLoader(train_ds, "train.txt", num_workers=1) as loader:
        assert loader.backend == "serial"
        got = list(loader.epoch(group_size=4, seed=5))
    ref = list(train_ds.batches(group_size=4, seed=5))
    assert len(got) == len(ref)
    for x, y in zip(got, ref):
        for k in x:
            if k == "names":
                assert x[k] == y[k]
            else:
                np.testing.assert_array_equal(x[k], y[k])


def test_process_loader_pooled_equals_serial(train_ds, monkeypatch):
    """Force the process pool on (the CI host is 1-core, which normally
    falls back) and check the pooled stream is byte-identical and ordered."""
    import visual_onoma_to_wave_tpu.data.loader as loader_mod

    monkeypatch.setattr(loader_mod, "_cpu_count", lambda: 8)
    monkeypatch.setattr(loader_mod.ProcessLoader, "MIN_BATCHES_FOR_PROCS", 1)
    with loader_mod.ProcessLoader(train_ds, "train.txt",
                                  num_workers=2) as loader:
        if loader.backend != "process":
            pytest.skip("spawn pool unavailable on this host")
        got = list(loader.epoch(group_size=4, seed=11))
    ref = list(train_ds.batches(group_size=4, seed=11))
    assert len(got) == len(ref) and len(got) > 1
    for x, y in zip(got, ref):
        assert x.keys() == y.keys()
        for k in x:
            if k == "names":
                assert x[k] == y[k]
            else:
                np.testing.assert_array_equal(x[k], y[k])


def test_process_loader_worker_error_propagates(train_ds, monkeypatch):
    """A failing batch load re-raises at the consumer instead of hanging."""
    import visual_onoma_to_wave_tpu.data.loader as loader_mod

    monkeypatch.setattr(loader_mod, "_cpu_count", lambda: 8)
    monkeypatch.setattr(loader_mod.ProcessLoader, "MIN_BATCHES_FOR_PROCS", 1)
    with loader_mod.ProcessLoader(train_ds, "train.txt",
                                  num_workers=2) as loader:
        if loader.backend != "process":
            pytest.skip("spawn pool unavailable on this host")
        plan = train_ds.batch_plan(4, seed=1)
        plan[1] = [10**9]  # out-of-range row index -> worker raises
        monkeypatch.setattr(train_ds, "batch_plan",
                            lambda *a, **k: plan)
        with pytest.raises(Exception):
            list(loader.epoch(group_size=4, seed=1))


def test_partitioned_local_slices_match_full_batches(train_ds):
    """plan_pad_shapes must reproduce collate's derived shapes exactly, and
    a per-process local slice collated against those shapes must equal the
    corresponding rows of the full batch byte-for-byte — the invariant the
    multi-host partitioned loader rests on (data/loader.py local_slice)."""
    ds = train_ds
    plan = ds.batch_plan(group_size=2, seed=3, shuffle=True)
    shapes = ds.plan_pad_shapes(plan)
    assert plan and len(shapes) == len(plan)
    n = 2
    for chunk, pad in zip(plan, shapes):
        full = ds.load_batch(chunk)
        assert full["texts"].shape[1] == pad[0]
        assert full["mels"].shape[1] == pad[1]
        rows = len(chunk) // n
        assert rows * n == len(chunk)
        for p in range(n):
            local = ds.load_batch(chunk[p * rows:(p + 1) * rows], pad_to=pad)
            for k, v in local.items():
                sl = slice(p * rows, (p + 1) * rows)
                if k == "names":
                    assert v == full[k][sl]
                else:
                    np.testing.assert_array_equal(v, full[k][sl], err_msg=k)


def test_loader_local_slice_stream(train_ds):
    """ProcessLoader.epoch(local_slice=(p, n)) yields exactly each planned
    batch's p-th row slice, in plan order."""
    from visual_onoma_to_wave_tpu.data.loader import ProcessLoader

    ds = train_ds
    plan = ds.batch_plan(group_size=2, seed=5, shuffle=True)
    shapes = ds.plan_pad_shapes(plan)
    loader = ProcessLoader(ds, "train.txt", num_workers=1)
    try:
        got = list(loader.epoch(group_size=2, seed=5, local_slice=(1, 2)))
    finally:
        loader.close()
    assert len(got) == len(plan)
    for batch, chunk, pad in zip(got, plan, shapes):
        rows = len(chunk) // 2
        want = ds.load_batch(chunk[rows:], pad_to=pad)
        for k, v in want.items():
            if k == "names":
                assert batch[k] == v
            else:
                np.testing.assert_array_equal(batch[k], v, err_msg=k)
