"""Interactive demo server: the prediction.ipynb GUI equivalent
(katakana keypad + per-char width-rate sliders + audio playback) served by
visual_onoma_to_wave_tpu.demo_server over stdlib HTTP."""
import base64
import io
import json
import http.client
import wave

import numpy as np
import pytest

from test_trainer_synthesis import tiny_env  # noqa: F401 (fixture reuse)


@pytest.fixture(scope="module")
def server(tiny_env):  # noqa: F811
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.demo_server import DemoServer
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))
    synth = Synthesizer(tiny_env, trainer.model, trainer.state,
                        trainer.metadata, trainer.train_ds.symbol_map, gp,
                        vocoder=gen)
    srv = DemoServer(synth, port=0)
    srv.start()
    yield srv
    srv.stop()
    trainer.ckpt.close()


def _request(srv, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
    headers = {"Content-Type": "application/json"} if body else {}
    conn.request(method, path,
                 json.dumps(body) if body is not None else None, headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def test_page_and_meta(server):
    status, page = _request(server, "GET", "/")
    assert status == 200
    html = page.decode()
    assert "keypad" in html and "width" in html.lower()
    status, meta = _request(server, "GET", "/api/meta")
    assert status == 200
    m = json.loads(meta)
    assert m["audiotypes"] == ["drum"]
    assert m["has_vocoder"] is True
    assert m["sampling_rate"] == 22050


def test_synthesize_endpoint(server):
    status, body = _request(server, "POST", "/api/synthesize", {
        "text": "パンパン", "audiotype": "drum",
        "width_rates": [1.0, 0.5, 1.5, 0.5],
        "e_control": 1.0, "d_control": 1.0,
    })
    assert status == 200, body[:500]
    r = json.loads(body)
    assert len(r["durations"]) == 4
    assert r["mel_frames"] >= 1
    assert r["image_b64"] and r["mel_b64"] and r["wav_b64"]
    # the wav payload must be a decodable 16-bit mono file of the right length
    with wave.open(io.BytesIO(base64.b64decode(r["wav_b64"])), "rb") as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() == r["mel_frames"] * 256
    # the strip preview is a PNG
    from PIL import Image
    img = Image.open(io.BytesIO(base64.b64decode(r["image_b64"])))
    assert img.height == 24

    # width-rate control is live: wider glyphs -> longer predicted durations
    # is model-dependent, but the rendered strip must change
    status2, body2 = _request(server, "POST", "/api/synthesize", {
        "text": "パンパン", "audiotype": "drum",
        "width_rates": [3.0, 3.0, 3.0, 3.0],
    })
    r2 = json.loads(body2)
    a = np.asarray(Image.open(io.BytesIO(base64.b64decode(r["image_b64"]))))
    b = np.asarray(Image.open(io.BytesIO(base64.b64decode(r2["image_b64"]))))
    assert a.shape == b.shape and not np.array_equal(a, b)


def test_synthesize_errors(server):
    status, body = _request(server, "POST", "/api/synthesize", {"text": ""})
    assert status == 400
    status, _ = _request(server, "GET", "/nope")
    assert status == 404


def test_request_limits(server):
    from visual_onoma_to_wave_tpu.demo_server import MAX_TEXT_LEN

    # oversized body -> 413 without being read/parsed
    conn = __import__("http.client", fromlist=["HTTPConnection"]
                      ).HTTPConnection("127.0.0.1", server.port, timeout=120)
    conn.putrequest("POST", "/api/synthesize")
    conn.putheader("Content-Type", "application/json")
    conn.putheader("Content-Length", str(16 << 20))
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()

    # over-long text -> 400 with the cap in the message
    status, body = _request(server, "POST", "/api/synthesize",
                            {"text": "ア" * (MAX_TEXT_LEN + 1),
                             "audiotype": 0})
    assert status == 400 and b"too long" in body
    # non-string text -> 400, not a crash
    status, _ = _request(server, "POST", "/api/synthesize",
                         {"text": 123, "audiotype": 0})
    assert status == 400
