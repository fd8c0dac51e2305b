"""Production batch-serving API (serve.BatchingServer).

Pins: concurrent single requests share one device batch (micro-batching),
the explicit /v1/batch path, validation errors, stats, and wav payloads.
"""
import base64
import http.client
import io
import json
import threading
import wave

import numpy as np
import pytest

from test_trainer_synthesis import tiny_env  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def server(tiny_env):  # noqa: F811
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.serve import BatchingServer
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))
    synth = Synthesizer(tiny_env, trainer.model, trainer.state,
                        trainer.metadata, trainer.train_ds.symbol_map, gp,
                        vocoder=gen)
    srv = BatchingServer(synth, port=0, max_batch=8, batch_window_ms=200.0)
    srv.start()
    yield srv
    srv.stop()
    trainer.ckpt.close()


def _request(srv, method, path, body=None, timeout=300):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=timeout)
    conn.request(method, path,
                 json.dumps(body) if body is not None else None,
                 {"Content-Type": "application/json"} if body else {})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, json.loads(data)


def test_health_and_meta(server):
    status, h = _request(server, "GET", "/healthz")
    assert status == 200 and h["ok"] is True
    status, m = _request(server, "GET", "/v1/meta")
    assert status == 200
    assert m["audiotypes"] == ["drum"]
    assert m["sampling_rate"] == 22050 and m["max_batch"] == 8


def test_single_request_roundtrip(server):
    status, r = _request(server, "POST", "/v1/synthesize",
                         {"text": "パン", "audiotype": "drum"})
    assert status == 200, r
    assert len(r["durations"]) == 2 and r["mel_frames"] >= 1
    with wave.open(io.BytesIO(base64.b64decode(r["wav_b64"])), "rb") as w:
        assert w.getframerate() == r["sample_rate"] == 22050
        assert w.getnframes() == r["mel_frames"] * 256
    assert r["seconds"] == pytest.approx(r["mel_frames"] * 256 / 22050)


def test_concurrent_requests_are_microbatched(server):
    b0 = _request(server, "GET", "/v1/stats")[1]["batches"]
    results = [None] * 6

    def fire(i):
        results[i] = _request(server, "POST", "/v1/synthesize",
                              {"text": "ドンドン", "audiotype": "drum",
                               "width_rates": [1.0, 0.5 + 0.1 * i, 1.0, 1.0]})

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results), results
    _, stats = _request(server, "GET", "/v1/stats")
    batches = stats["batches"] - b0
    # 6 concurrent requests within a 200ms window must share batches
    assert 1 <= batches < 6
    assert stats["mean_batch_size"] > 1.0
    assert "latency_ms_p50" in stats


def test_batch_endpoint(server):
    status, out = _request(server, "POST", "/v1/batch", {"items": [
        {"text": "パン", "audiotype": "drum"},
        {"text": "ドドド", "audiotype": 0, "width_rates": [1.0, 1.0, 2.0]},
    ]})
    assert status == 200, out
    assert len(out["items"]) == 2
    assert len(out["items"][0]["durations"]) == 2
    assert len(out["items"][1]["durations"]) == 3


def test_validation_errors(server):
    assert _request(server, "POST", "/v1/synthesize", {"text": ""})[0] == 400
    assert _request(server, "POST", "/v1/synthesize",
                    {"text": "パ", "audiotype": "nope"})[0] == 400
    assert _request(server, "POST", "/v1/synthesize",
                    {"text": "パン", "audiotype": "drum",
                     "width_rates": [1.0]})[0] == 400
    assert _request(server, "POST", "/v1/batch", {"items": []})[0] == 400
    assert _request(server, "POST", "/nope", {})[0] == 404


def test_non_numeric_controls_rejected_not_wedged(server):
    """A malformed control must be a 400 at validation, never reach the
    singleton worker (where it would kill it and wedge every later
    request)."""
    status, out = _request(server, "POST", "/v1/synthesize",
                           {"text": "パ", "audiotype": "drum",
                            "d_control": "fast"})
    assert status == 400 and "d_control" in out["error"]
    status, _ = _request(server, "POST", "/v1/synthesize",
                         {"text": "パ", "audiotype": "drum",
                          "e_control": float("nan")})
    assert status == 400
    # the server still serves afterwards
    status, r = _request(server, "POST", "/v1/synthesize",
                         {"text": "パ", "audiotype": "drum"})
    assert status == 200 and r["mel_frames"] >= 1


def test_reset_stats(server):
    _request(server, "POST", "/v1/synthesize",
             {"text": "パ", "audiotype": "drum"})
    assert _request(server, "GET", "/v1/stats")[1]["requests"] > 0
    server.reset_stats()
    s = _request(server, "GET", "/v1/stats")[1]
    assert s["requests"] == 0 and s["batches"] == 0
    assert "latency_ms_p50" not in s


def test_distinct_controls_split_groups(server):
    """Requests with different d_control must not share a device batch but
    must all be served correctly."""
    results = [None] * 2

    def fire(i, d):
        results[i] = _request(server, "POST", "/v1/synthesize",
                              {"text": "パンパン", "audiotype": "drum",
                               "d_control": d})

    threads = [threading.Thread(target=fire, args=(0, 1.0)),
               threading.Thread(target=fire, args=(1, 1.5))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][0] == 200 and results[1][0] == 200
    # longer duration control should never shorten the clip
    assert results[1][1]["mel_frames"] >= results[0][1]["mel_frames"]
