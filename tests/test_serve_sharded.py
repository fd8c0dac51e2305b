"""HTTP-level sharded serving: a BatchingServer over a mesh-configured
Synthesizer must return exactly what the single-device stack returns, with
per-item e/d controls, on the virtual 8-device CPU mesh (VERDICT r2 #1 —
`cli serve` then uses every chip of a pod with no code change)."""
import base64
import http.client
import json
import threading

import numpy as np
import pytest

from test_trainer_synthesis import tiny_env  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def synth_pair(tiny_env):  # noqa: F811
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.parallel import get_mesh
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    assert len(jax.devices()) >= 8
    trainer = Trainer(tiny_env, use_mesh=False)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))
    single = Synthesizer(tiny_env, trainer.model, trainer.state,
                         trainer.metadata, trainer.train_ds.symbol_map, gp,
                         vocoder=gen)
    sharded = Synthesizer(tiny_env, trainer.model, trainer.state,
                          trainer.metadata, trainer.train_ds.symbol_map, gp,
                          vocoder=gen, mesh=get_mesh(8))
    yield single, sharded
    trainer.ckpt.close()


def _request(port, method, path, body=None, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request(method, path,
                 json.dumps(body) if body is not None else None,
                 {"Content-Type": "application/json"} if body else {})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, json.loads(data)


def test_mesh_batch_signature_pads_to_mesh_multiple(synth_pair):
    single, sharded = synth_pair
    assert single.batch_signature(["ab"]) == (1, 4)
    # the sharded batch axis must divide the 8-device mesh
    assert sharded.batch_signature(["ab"]) == (8, 4)
    assert sharded.batch_signature(["ab"] * 9) == (16, 4)


def test_sharded_synthesize_batch_equals_single_device(synth_pair):
    """Library level: identical waveforms/durations/mel_lens for a
    mixed-per-item-control batch, sharded vs single-device."""
    single, sharded = synth_pair
    texts = ["パン", "ドンドン", "パ", "ドドパ", "パンパ"]
    atypes = ["drum"] * len(texts)
    d_ctl = [1.0, 1.5, 1.0, 2.0, 1.25]
    e_ctl = [1.0, 0.8, 1.2, 1.0, 1.0]
    a = single.synthesize_batch(texts, atypes, d_control=d_ctl,
                                e_control=e_ctl)
    b = sharded.synthesize_batch(texts, atypes, d_control=d_ctl,
                                 e_control=e_ctl)
    for ra, rb in zip(a, b):
        assert ra.mel_len == rb.mel_len
        np.testing.assert_array_equal(ra.durations, rb.durations)
        np.testing.assert_allclose(ra.mel, rb.mel, atol=2e-5)
        np.testing.assert_allclose(ra.wav, rb.wav, atol=2e-5)


def test_http_sharded_equals_single_device(synth_pair):
    """End to end through HTTP: two BatchingServers (one per synthesizer),
    concurrent mixed-control requests — byte-identical response fields."""
    from visual_onoma_to_wave_tpu.serve import BatchingServer

    single, sharded = synth_pair
    srv1 = BatchingServer(single, port=0, max_batch=8, batch_window_ms=200.0)
    srv8 = BatchingServer(sharded, port=0, max_batch=8, batch_window_ms=200.0)
    srv1.start()
    srv8.start()
    try:
        reqs = [{"text": "パンパン", "audiotype": "drum",
                 "d_control": 1.0 + 0.25 * (i % 3),
                 "e_control": 0.9 + 0.1 * (i % 2)} for i in range(5)]

        def fire_all(srv):
            out = [None] * len(reqs)

            def one(i):
                out[i] = _request(srv.port, "POST", "/v1/synthesize", reqs[i])

            ts = [threading.Thread(target=one, args=(i,))
                  for i in range(len(reqs))]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            return out

        r1 = fire_all(srv1)
        r8 = fire_all(srv8)
        for (s1, o1), (s8, o8) in zip(r1, r8):
            assert s1 == 200 and s8 == 200, (o1, o8)
            assert o1["mel_frames"] == o8["mel_frames"]
            assert o1["durations"] == o8["durations"]
            w1 = np.frombuffer(base64.b64decode(o1["wav_b64"]), np.int16)
            w8 = np.frombuffer(base64.b64decode(o8["wav_b64"]), np.int16)
            assert w1.shape == w8.shape
            # 16-bit PCM of float32 waveforms equal to ~2e-5: at most 1 LSB
            assert np.max(np.abs(w1.astype(int) - w8.astype(int))) <= 1
        # the sharded server micro-batched them (not item-by-item)
        stats = _request(srv8.port, "GET", "/v1/stats")[1]
        assert stats["mean_batch_size"] > 1.0
    finally:
        srv1.stop()
        srv8.stop()
