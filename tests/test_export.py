"""AOT export (export.py): serialize the fused serving step with jax.export
and serve it back from the self-contained artifact.

Pins: (a) exported output == live Synthesizer output for the same requests
(mixed per-item controls included), (b) the artifact is self-contained (no
checkpoint / preprocessed dir read at load), (c) bucket dispatch pads up to
a shipped bucket and errors clearly past the artifact's limits, (d) the
HTTP server takes an ExportedSynthesizer unchanged.

The reference has no deployment-artifact analog (its serving story is
loading the torch checkpoint in prediction.ipynb); this is beyond-reference
surface, so the tests pin our own semantics.
"""
import json
import pathlib
import shutil

import numpy as np
import pytest

DEMO = pathlib.Path(__file__).resolve().parents[1] / (
    "examples/checkpoints/demo")

pytestmark = pytest.mark.skipif(
    not (DEMO / "config.json").exists(),
    reason="demo checkpoints not built (examples/train_demo_artifacts.py)")


def _demo_config(tmp_root: str):
    from visual_onoma_to_wave_tpu.cli import load_config
    cfg = load_config(str(DEMO / "config.json"))
    return cfg.replace(path=cfg.path.__class__(
        corpus="", formatted="", preprocessed=str(DEMO / "preprocessed"),
        font="", ckpt=f"{tmp_root}/ckpt", log=f"{tmp_root}/log",
        result=f"{tmp_root}/result"))


@pytest.fixture(scope="module")
def live_synth(tmp_path_factory):
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    cfg = _demo_config(str(tmp_path_factory.mktemp("live")))
    # mesh=None: the exported artifact is single-program-per-bucket, so the
    # equality comparison must use unsharded live bucket signatures
    return Synthesizer.from_checkpoint(
        cfg, acoustic=str(DEMO / "acoustic"), vocoder=str(DEMO / "vocoder"),
        mesh=None)


@pytest.fixture(scope="module")
def artifact(live_synth, tmp_path_factory):
    from visual_onoma_to_wave_tpu.export import export_synthesizer
    out = tmp_path_factory.mktemp("exported")
    manifest = export_synthesizer(live_synth, out, max_batch=4,
                                  text_lens=(4, 8))
    return out, manifest


@pytest.fixture(scope="module")
def exported_synth(artifact):
    from visual_onoma_to_wave_tpu.export import ExportedSynthesizer
    return ExportedSynthesizer.load(artifact[0])


def _audiotype():
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    return next(iter(meta))


def test_manifest_and_files(artifact):
    out, manifest = artifact
    assert manifest["format_version"] == 1
    assert sorted(manifest["buckets"]) == [
        [b, c] for b in (1, 2, 4) for c in (4, 8)]
    assert (out / "config.json").exists()
    assert (out / "symbols.json").exists()
    assert (out / "metadata" / "audiotype.json").exists()
    for b, c in manifest["buckets"]:
        assert (out / f"fused_b{b}_c{c}.jexp").stat().st_size > 0


def test_exported_matches_live(live_synth, exported_synth):
    at = _audiotype()
    texts = ["パン", "ドンドン", "パパパ"]
    kwargs = dict(e_control=[1.0, 0.8, 1.2], d_control=[1.0, 1.3, 0.7])
    live = live_synth.synthesize_batch(texts, [at] * 3, **kwargs)
    exp = exported_synth.synthesize_batch(texts, [at] * 3, **kwargs)
    for r_live, r_exp in zip(live, exp):
        assert r_exp.mel_len == r_live.mel_len
        np.testing.assert_array_equal(r_exp.durations, r_live.durations)
        np.testing.assert_allclose(r_exp.wav, r_live.wav,
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(r_exp.mel, r_live.mel,
                                   atol=1e-4, rtol=1e-4)


def test_exported_single_item_and_controls(live_synth, exported_synth):
    at = _audiotype()
    r_live = live_synth.synthesize("パンパン", at, d_control=1.4)
    r_exp = exported_synth.synthesize("パンパン", at, d_control=1.4)
    assert r_exp.mel_len == r_live.mel_len
    np.testing.assert_allclose(r_exp.wav, r_live.wav, atol=1e-5, rtol=1e-5)


def test_self_contained(artifact, tmp_path):
    """Loading reads nothing outside the artifact directory."""
    from visual_onoma_to_wave_tpu.export import ExportedSynthesizer
    moved = tmp_path / "moved_artifact"
    shutil.copytree(artifact[0], moved)
    s = ExportedSynthesizer.load(moved)
    res = s.synthesize_batch(["パン"], [_audiotype()], return_mel=False)
    assert res[0].wav is not None and np.isfinite(res[0].wav).all()
    assert res[0].wav.shape[0] == res[0].mel_len * 256


def test_bucket_pad_up_and_limits(live_synth, exported_synth):
    at = _audiotype()
    # 3 items -> b_pad 4 (shipped); 5-char text -> C=8 via pad-up inside
    # dispatch is NOT needed (8 shipped) but 3 items at C=4 with one
    # 5-char text exercises the (4, 8) bucket directly; equality again
    texts = ["パンパンパ", "パン", "ドン"]
    live = live_synth.synthesize_batch(texts, [at] * 3, return_mel=False)
    exp = exported_synth.synthesize_batch(texts, [at] * 3, return_mel=False)
    for r_live, r_exp in zip(live, exp):
        assert r_exp.mel_len == r_live.mel_len
        np.testing.assert_allclose(r_exp.wav, r_live.wav,
                                   atol=1e-5, rtol=1e-5)
    # past the artifact's limits: clear errors, not shape crashes
    with pytest.raises(ValueError, match="re-export"):
        exported_synth.synthesize_batch(["パン"] * 5, [at] * 5,
                                        return_mel=False)
    with pytest.raises(ValueError, match="re-export"):
        exported_synth.synthesize("パンパンパンパンパ", at)


def test_max_text_len_property(exported_synth):
    assert exported_synth.max_text_len == 8
    assert exported_synth.max_batch == 4


def test_http_edge_enforces_artifact_text_limit(exported_synth):
    """A text longer than the artifact's largest text bucket gets a clean
    400 naming the limit at the HTTP edge — it must never reach the worker
    where _pick_bucket would fail the whole co-batched group (ADVICE r3)."""
    import urllib.error
    import urllib.request

    from visual_onoma_to_wave_tpu.serve import BatchingServer
    server = BatchingServer(exported_synth, port=0, max_batch=4,
                            batch_window_ms=2.0)
    assert server.max_text_len == 8
    assert server.meta()["max_text_len"] == 8
    server.start()
    try:
        body = json.dumps({"text": "パ" * 9, "audiotype": _audiotype()}
                          ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 400
        msg = ei.value.read().decode()
        assert "1..8" in msg and "text bucket" in msg
        # an in-limit request on the same server still serves fine
        ok = json.dumps({"text": "パン", "audiotype": _audiotype()}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/synthesize", data=ok,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["mel_frames"] >= 1
    finally:
        server.stop()


def test_cli_export_platform_validation(tmp_path, capsys):
    """--platforms is stripped/validated before any checkpoint load."""
    from visual_onoma_to_wave_tpu.cli import main as cli_main
    with pytest.raises(SystemExit, match="platforms"):
        cli_main(["export", "nonexistent-config.json", "--out",
                  str(tmp_path), "--platforms", "cpu, bogus"])


def test_cli_serve_exported_warns_on_ignored_args(artifact, capsys,
                                                  monkeypatch):
    """cli serve --exported with a config/--vocoder warns they are ignored
    (ADVICE r3) and forwards the artifact-capped limits to the server."""
    from visual_onoma_to_wave_tpu import cli as cli_mod

    captured = {}

    class FakeServer:
        def __init__(self, synth, **kw):
            captured["synth"] = synth
            captured["kw"] = kw

        def serve_forever(self):
            captured["served"] = True

    monkeypatch.setattr("visual_onoma_to_wave_tpu.serve.BatchingServer",
                        FakeServer)
    cli_mod.main(["serve", str(DEMO / "config.json"),
                  "--exported", str(artifact[0]),
                  "--vocoder", "some/dir", "--max-batch", "32"])
    out = capsys.readouterr().out
    assert "ignored" in out and "--vocoder" in out and "config" in out
    # the printed cap is the EFFECTIVE one: min(artifact buckets, server cap)
    assert "requests capped at 8 characters" in out
    assert captured["kw"]["max_batch"] == 4
    assert captured["served"]


def test_vocode_is_live_only(exported_synth):
    with pytest.raises(RuntimeError, match="live"):
        exported_synth.vocode(np.zeros((1, 64, 80), np.float32), [64])


def test_http_serving_from_artifact(exported_synth):
    import urllib.request

    from visual_onoma_to_wave_tpu.serve import BatchingServer
    server = BatchingServer(exported_synth, port=0, max_batch=4,
                            batch_window_ms=2.0)
    server.start()
    try:
        body = json.dumps({"text": "パン", "audiotype": _audiotype()}
                          ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["mel_frames"] >= 1 and out["wav_b64"]
    finally:
        server.stop()
