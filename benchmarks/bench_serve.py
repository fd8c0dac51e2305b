"""Served-throughput benchmark: concurrent HTTP clients -> BatchingServer
-> TPU micro-batches (full ICASSP-size acoustic model + HiFi-GAN V1 bf16).

Measures the end-to-end production path — HTTP parse, host-side visual-text
cell rendering, device batch, wav encode — not just the device step.
Prints one JSON line with requests/s, audio-seconds/s, latency quantiles
and the realized mean device batch size.

Usage: python benchmarks/bench_serve.py [--clients N] [--requests N]
"""
from __future__ import annotations

import http.client
import json
import pathlib
import sys
import threading
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tests"))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from test_trainer_synthesis import make_preprocessed
    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.data.dataset import OnomaDataset
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.serve import BatchingServer
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.train_state import TrainState

    clients = 32
    if "--clients" in sys.argv:
        clients = int(sys.argv[sys.argv.index("--clients") + 1])
    per_client = 8
    if "--requests" in sys.argv:
        per_client = int(sys.argv[sys.argv.index("--requests") + 1])

    import tempfile


    # metadata/vocab from a synthetic preprocessed dir; full-size model
    root = pathlib.Path(tempfile.mkdtemp(prefix="bench_serve_pre"))
    meta = make_preprocessed(root)
    cfg = Config()
    cfg = cfg.replace(path=cfg.path.__class__(
        preprocessed=str(root), ckpt="/tmp/bs_ckpt", log="/tmp/bs_log",
        result="/tmp/bs_res", font=""))
    if "--tiny" in sys.argv:  # CPU smoke-test configuration
        cfg = cfg.replace(model=cfg.model.__class__(
            transformer=cfg.model.transformer.__class__(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64,
                conv_kernel_size=(3, 1)),
            visual_feature_extractor=cfg.model.visual_feature_extractor.__class__(
                layer_num=1),
            max_seq_len=256))
    ds = OnomaDataset("train.txt", cfg, metadata=meta)
    model = VTTS.from_config(cfg, meta, n_vocab=len(ds.symbol_map) + 1,
                             max_mel_len=cfg.train.max_mel_len)
    sample = ds.collate([ds[0], ds[1]])
    batch = {k: jnp.asarray(v) for k, v in sample.items()
             if k in ("audiotypes", "texts", "src_lens", "image_cells")}
    variables = jax.jit(lambda: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True))()
    # bias the duration predictor so the untrained model emits a realistic
    # ~20 frames/char (exp(3)-1); exp(noise)-1 alone rounds/clamps to ~0
    params = variables["params"]
    dp = params["variance_adaptor"]["duration_predictor"]["linear_layer"]
    dp["bias"] = dp["bias"] + 3.0
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params=params,
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    gen = (HiFiGANGenerator(upsample_initial_channel=32)
           if "--tiny" in sys.argv else HiFiGANGenerator(dtype=jnp.bfloat16))
    gp = jax.jit(gen.init)(jax.random.PRNGKey(2),
                           jnp.zeros((1, 16, 80), jnp.float32))
    synth = Synthesizer(cfg, model, state, meta, ds.symbol_map, gp,
                        vocoder=gen)
    # serving-shape discipline on the tunneled chip: every distinct
    # (batch, text, mel) bucket triple is a new executable AND a one-time
    # ~minutes parameter upload; a coarse mel bucket keeps the warm set to
    # 1-2 vocoder executables (what a production deployment would pin too)
    synth.mel_bucket = 512
    max_batch = 16
    # request_timeout_s: the warm phase drives cold executables through the
    # HTTP path (compile + one-time upload can exceed the 30 s production
    # default); the load phase itself runs far below this
    pipeline = 2
    if "--pipeline" in sys.argv:
        pipeline = int(sys.argv[sys.argv.index("--pipeline") + 1])
    srv = BatchingServer(synth, port=0, max_batch=max_batch,
                         batch_window_ms=8.0, request_timeout_s=600.0,
                         pipeline_depth=pipeline)
    srv.start()
    print(f"server up on :{srv.port}", flush=True)

    # one text bucket (<=4 chars): distinct executables are expensive to
    # warm over the tunnel (compile + one-time upload per shape)
    texts = ["パンパン", "カンカン", "トントン", "パパパパ", "ドドド"]

    def fire(path, body):
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=600)
        conn.request("POST", path, json.dumps(body),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        data = json.loads(r.read())
        conn.close()
        assert r.status == 200, data
        return data

    d_control = 1.0  # durations handled by the predictor bias above

    # warm every pow-2 batch bucket (ramp-down batches will hit the small
    # ones); each is a compile + one-time upload on the tunneled platform.
    # Tunnel stalls >10 min trip the server's cold watchdog into a 504
    # (observed on degraded days) — retry instead of killing a 20-min run.
    b = max_batch
    while b >= 1:
        t0 = time.perf_counter()
        for attempt in range(5):
            try:
                fire("/v1/batch", {"items": [
                    {"text": texts[i % len(texts)], "audiotype": 0,
                     "d_control": d_control} for i in range(b)]})
                break
            except (AssertionError, OSError, http.client.HTTPException,
                    json.JSONDecodeError) as e:
                # AssertionError = server-side 504/503; OSError covers
                # socket.timeout/ConnectionError when the client's own 600 s
                # socket deadline fires first (stall windows are measured
                # from enqueue/dispatch, later than the client's send).
                # 60 s: the wedged upload usually completes within a few
                # minutes, after which the circuit closes and the retry warms
                print(f"warm bucket {b} attempt {attempt + 1} failed: {e}; "
                      f"retrying in 60s", flush=True)
                time.sleep(60.0)
        else:
            raise RuntimeError(f"warm bucket {b} failed after 5 attempts")
        print(f"warm bucket {b}: {time.perf_counter() - t0:.1f}s", flush=True)
        b //= 2
    srv.reset_stats()  # measure the load phase only, not the warm batches

    results, failures = [], []
    lock = threading.Lock()

    # --mixed-controls: every request draws its own continuous e/d control.
    # Controls are per-item traced inputs of the fused executable, so this
    # must coalesce into the same batches/executables as the uniform load
    # (with per-value static controls it would recompile per request).
    mixed = "--mixed-controls" in sys.argv

    def client(ci):
        r = np.random.default_rng(ci)
        for _ in range(per_client):
            t = texts[int(r.integers(0, len(texts)))]
            try:
                out = fire("/v1/synthesize", {
                    "text": t, "audiotype": 0,
                    "d_control": (float(r.uniform(0.8, 1.25)) if mixed
                                  else d_control),
                    "e_control": (float(r.uniform(0.8, 1.25)) if mixed
                                  else 1.0),
                    "width_rates": [float(x) for x in
                                    r.uniform(0.7, 1.4, len(t))]})
            except Exception as e:
                with lock:
                    failures.append(f"{type(e).__name__}: {e}")
                continue
            with lock:
                results.append(out["seconds"])

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    stats = srv.snapshot_stats()
    srv.stop()

    print(json.dumps({
        "metric": "served_synthesis",
        "mixed_controls": mixed,
        "pipeline_depth": pipeline,
        "clients": clients,
        "requests_completed": len(results),
        "requests_failed": len(failures),
        "requests_per_sec": round(len(results) / dt, 1),
        "audio_sec_per_sec": round(sum(results) / dt, 1),
        "latency_ms_p50": stats.get("latency_ms_p50"),
        "latency_ms_p95": stats.get("latency_ms_p95"),
        "mean_batch_size": stats.get("mean_batch_size"),
    }))
    if failures:
        print("failures:", failures[:5])
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
