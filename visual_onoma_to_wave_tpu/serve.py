"""Production batch-serving HTTP API over the Synthesizer.

BEYOND-REFERENCE extension: the reference's only serving surface is the
interactive notebook (reference prediction.ipynb); `demo_server.py`
reproduces that. This module adds the production path: a JSON API whose
concurrent single requests are micro-batched onto the TPU through
`Synthesizer.synthesize_batch` — one fused acoustic+vocoder device dispatch
per batch, with pow-2 batch / text-length bucketing so a small fixed set
of executables serves all traffic (the shapes bench.py's 2400x-realtime
headline is measured on).

Design:
  * handler threads enqueue requests and wait on per-request events;
  * ONE worker thread drains the queue into batches of up to max_batch
    within a batch_window_ms collection window; the device call itself runs
    on a dispatch thread so the worker can collect + dispatch batch n+1
    while batch n round-trips the device (pipeline_depth in-flight
    dispatches, default 2 — so up to that many threads touch JAX
    concurrently; the Synthesizer's lazy executable construction is
    internally locked for this);
  * e/d controls are per-item traced inputs of the fused executable, so
    requests with different controls share one device batch and any
    control value reuses the compiled executable (no recompile risk from
    untrusted input);
  * a request that fails inside the device call is retried individually so
    it cannot fail innocent requests batched with it; malformed requests
    (types, lengths, unknown audiotypes, non-finite numbers) are rejected
    with 400 at the HTTP edge before reaching the worker;
  * every request carries a deadline (request_timeout_s, default 30 s):
    expired queued requests are failed with 504 without device work, and
    the device call itself runs under a watchdog — a wedged dispatch fails
    its group with 504 and the worker keeps serving instead of freezing
    every client behind it (the tunneled-TPU tail-latency failure mode);
  * /v1/batch admission is atomic (a batch is enqueued whole or 503'd
    whole, never a half-served prefix) and cannot own the queue: a reserve
    of slots is held back for /v1/synthesize singles;
  * device/encode failure details are logged server-side only — clients
    get a generic 'synthesis failed' (no internal shapes/paths leak).

Endpoints:
    GET  /healthz          -> {"ok": true}
    GET  /v1/meta          -> audiotypes, sampling rate, limits
    GET  /v1/stats         -> request/batch counters, mean batch size,
                              latency quantiles (ms)
    POST /v1/synthesize    -> {"text", "audiotype", "width_rates"?,
                               "e_control"?, "d_control"?}
         returns {"wav_b64"?, "sample_rate", "mel_frames", "durations",
                  "seconds"}
    POST /v1/batch         -> {"items": [<same as /v1/synthesize>, ...]}
         returns {"items": [...]} in order (one device batch directly).
"""
from __future__ import annotations

import base64
import collections
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_log = logging.getLogger("visual_onoma_to_wave_tpu.serve")

MAX_TEXT_LEN = 64
LATENCY_WINDOW = 1000      # latency samples kept for the stats quantiles
MAX_BODY_BYTES = 1 << 20   # request-body cap; real requests are << 64 KB
WIDTH_RATE_RANGE = (0.05, 8.0)   # sane glyph-stretch bounds (demo UI ~0.5-2)
CONTROL_RANGE = (0.05, 20.0)     # e/d control bounds


def _in_range(v, lo: float, hi: float) -> bool:
    """Bounds-check an untrusted JSON number WITHOUT raising: rejects bools,
    non-numbers, NaN/inf, out-of-range values, and integers too large for a
    float (json parses arbitrary-precision ints; float() on them raises
    OverflowError and np.isfinite raises TypeError)."""
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        return False
    try:
        f = float(v)
    except OverflowError:
        return False
    return lo <= f <= hi


class _Pending:
    __slots__ = ("req", "event", "result", "error", "error_code",
                 "t0", "deadline")

    def __init__(self, req: dict, timeout_s: float):
        self.req = req
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.error_code = 500
        self.t0 = time.perf_counter()
        self.deadline = self.t0 + timeout_s


class BatchingServer:
    """Micro-batching HTTP front-end for a `Synthesizer`."""

    def __init__(self, synthesizer, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 32, batch_window_ms: float = 5.0,
                 max_queue: int = 1024, request_timeout_s: float = 30.0,
                 device_timeout_s: float | None = None,
                 batch_queue_reserve: int | None = None,
                 pipeline_depth: int = 2):
        self.synth = synthesizer
        self.max_batch = int(max_batch)
        # text-length cap: the server default, tightened to the artifact's
        # largest shipped text bucket when serving an ExportedSynthesizer —
        # an over-limit text must 400 at the edge, not reach the worker and
        # fail its whole co-batched group at _pick_bucket dispatch time
        self.max_text_len = min(
            MAX_TEXT_LEN,
            int(getattr(synthesizer, "max_text_len", MAX_TEXT_LEN)))
        self.window_s = float(batch_window_ms) / 1e3
        # per-request deadline: enforced while queued (worker skips expired
        # items without device work) and while in flight (handler returns
        # 504 when its wait outlives the deadline)
        self.timeout_s = float(request_timeout_s)
        # watchdog cap on one device call; a wedged dispatch fails its group
        # instead of freezing the singleton worker forever. Warm the
        # executables first (warmup()) so a first-dispatch compile/upload is
        # never mistaken for a wedge.
        self.device_timeout_s = (float(device_timeout_s)
                                 if device_timeout_s is not None
                                 else self.timeout_s)
        # the FIRST dispatch at a new (batch, text-len) bucket compiles a
        # fresh executable (and on the tunneled TPU pays a one-time param
        # upload, observed 1-6 min) — give it a generous cap so the watchdog
        # never misreads a cold compile as a wedge. Signatures that have
        # served once get the tight cap.
        self.cold_timeout_s = max(600.0, self.device_timeout_s)
        self._warm_sigs: set = set()
        # circuit breaker: timed-out device calls whose threads are STILL
        # running (totally wedged device/link) — dispatching more work would
        # wedge too, and each group would slow-fail through its own full
        # watchdog window while leaking one stuck thread. While any is
        # alive, groups fail fast with 503.
        self._stuck_calls: list[threading.Thread] = []
        # device calls pipelined by the worker: while group n round-trips
        # the device, group n+1 is collected and dispatched (1 = serial)
        self.pipeline_depth = max(1, int(pipeline_depth))
        # queue slots held back from /v1/batch so an explicit batch can
        # never own the whole queue and starve singles
        self.batch_reserve = (int(batch_queue_reserve)
                              if batch_queue_reserve is not None
                              else max(1, int(max_queue) // 8))
        # bounded queue = backpressure: past max_queue waiting requests the
        # server answers 503 immediately instead of building unbounded
        # latency (each queued request also pins a handler thread)
        self._q: "queue.Queue[_Pending]" = queue.Queue(maxsize=int(max_queue))
        self._stop = threading.Event()
        # taken around {check _stop, enqueue} and around {set _stop, final
        # drain}: without it a submitter preempted between the check and the
        # put could enqueue AFTER the shutdown drain and hang forever
        self._submit_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "batched_requests": 0,
                      "errors": 0, "timeouts": 0, "breaker_fast_fails": 0}
        # bounded: a long-running server must not accumulate one float per
        # request forever (the quantiles only ever read the last window)
        self._latencies: collections.deque = collections.deque(
            maxlen=LATENCY_WINDOW)

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"ok": True})
                elif self.path == "/v1/meta":
                    self._send(200, server.meta())
                elif self.path == "/v1/stats":
                    self._send(200, server.snapshot_stats())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    if n > MAX_BODY_BYTES:  # never buffer attacker-sized bodies
                        return self._send(
                            413, {"error": f"body exceeds {MAX_BODY_BYTES} bytes"})
                    req = json.loads(self.rfile.read(n) or b"{}")
                except Exception as e:  # malformed body
                    return self._send(400, {"error": str(e)})
                if not isinstance(req, dict):
                    return self._send(
                        400, {"error": "request body must be a JSON object"})
                if self.path == "/v1/synthesize":
                    code, out = server.submit(req)
                    self._send(code, out)
                elif self.path == "/v1/batch":
                    code, out = server.run_batch(req.get("items", []))
                    self._send(code, out)
                else:
                    self._send(404, {"error": "not found"})

        class _Server(ThreadingHTTPServer):
            # default accept backlog (5) resets connections under bursty
            # concurrent load — measured at 48 clients (benchmarks/
            # bench_serve.py); size it to worst-case concurrency
            request_queue_size = 256

        self.httpd = _Server((host, port), Handler)
        self.port = self.httpd.server_port
        self.host = host
        self._worker = threading.Thread(target=self._work, daemon=True)
        self._server_thread: threading.Thread | None = None

    # ------------------------------------------------------------- control
    def start(self) -> None:
        self._worker.start()
        self._server_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._server_thread.start()

    def warmup(self) -> None:
        """Compile + upload the serving executable before taking traffic.
        On the tunneled TPU platform the FIRST dispatch of a new executable
        pays a one-time parameter upload (observed 1-6 min for big param
        sets) — without warmup the device watchdog would misread that as a
        wedged call and 504 the first real requests."""
        at = next(iter(self.synth.metadata.audiotype_map))
        t0 = time.perf_counter()
        self.synth.synthesize_batch(["a"], [at], return_mel=False)
        self._warm_sigs.add(self.synth.batch_signature(["a"]))
        _log.info("warmup dispatch done in %.1fs", time.perf_counter() - t0)

    def serve_forever(self) -> None:
        print("warming up the serving executable...")
        self.warmup()
        self._worker.start()
        print(f"serving on http://{self.host}:{self.port} "
              f"(max_batch={self.max_batch}, "
              f"window={self.window_s * 1e3:.0f}ms, "
              f"timeout={self.timeout_s:.0f}s)")
        try:
            self.httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    def stop(self) -> None:
        self._stop.set()
        if self._worker.is_alive():
            # the worker drains still-queued requests with an error on exit
            # (a queued client must never hang forever); give it a moment
            self._worker.join(timeout=30.0)
        with self._submit_lock:   # no submitter can enqueue after this drain
            self._drain_queue()
        self.httpd.shutdown()
        self.httpd.server_close()

    def _drain_queue(self) -> None:
        """Fail any still-queued requests so their handler threads return."""
        while True:
            try:
                p = self._q.get_nowait()
            except queue.Empty:
                return
            p.error = "server is shutting down"
            p.error_code = 503
            p.event.set()

    # ------------------------------------------------------------ requests
    def meta(self) -> dict:
        return {
            "audiotypes": list(self.synth.metadata.audiotype_map),
            "has_vocoder": self.synth.vocoder_params is not None,
            "sampling_rate": self.synth.config.audio.sampling_rate,
            "max_batch": self.max_batch,
            "max_text_len": self.max_text_len,
            "max_queue": self._q.maxsize,
            "pipeline_depth": self.pipeline_depth,
            "request_timeout_s": self.timeout_s,
            "batch_queue_reserve": self.batch_reserve,
            "width_rate_range": list(WIDTH_RATE_RANGE),
            "control_range": list(CONTROL_RANGE),
        }

    def reset_stats(self) -> None:
        """Zero the counters/latency window (e.g. after benchmark warmup)."""
        with self._stats_lock:
            self.stats = {k: 0 for k in self.stats}
            self._latencies.clear()

    def snapshot_stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            s = dict(self.stats)
        if lat:
            s["latency_ms_p50"] = round(1e3 * lat[len(lat) // 2], 2)
            s["latency_ms_p95"] = round(1e3 * lat[int(len(lat) * 0.95)], 2)
        s["mean_batch_size"] = round(
            s["batched_requests"] / s["batches"], 2) if s["batches"] else 0.0
        # live breaker state: operators watching /v1/stats during an outage
        # see WHY traffic is fast-503ing. Read-only on purpose —
        # _circuit_open() prunes/reassigns the list and belongs to the
        # worker thread alone (a concurrent prune could drop a
        # just-appended stuck thread)
        s["breaker_open"] = any(t.is_alive() for t in self._stuck_calls)
        return s

    def _validate(self, req) -> str | None:
        """Full type/range validation at the HTTP edge: anything that would
        raise inside the singleton worker thread must be a 400 here, so a
        malformed request can neither wedge the worker nor fail the
        micro-batch it would have joined."""
        if not isinstance(req, dict):
            return "each request must be a JSON object"
        text = req.get("text", "")
        if not isinstance(text, str) or not 1 <= len(text) <= self.max_text_len:
            return (f"text must be a string of 1..{self.max_text_len} "
                    f"characters"
                    + (" (the exported artifact's largest text bucket)"
                       if self.max_text_len < MAX_TEXT_LEN else ""))
        if any(c in "{}\n\r" for c in text):
            return "text must not contain braces or newlines"
        at = req.get("audiotype", 0)
        atypes = self.synth.metadata.audiotype_map
        if isinstance(at, str):
            if at not in atypes:
                return f"unknown audiotype {at!r}"
        elif isinstance(at, int) and not isinstance(at, bool):
            if not 0 <= at < len(atypes):
                return f"audiotype id must be 0..{len(atypes) - 1}"
        else:
            return "audiotype must be a class name or integer id"
        if not self.synth.use_image:
            # the text path synthesizes from token ids: OOV is a hard error
            missing = sorted({c for c in text
                              if c not in self.synth.symbol_map})
            if missing:
                return f"characters not in the vocabulary: {missing[:5]}"
        lo, hi = WIDTH_RATE_RANGE
        wr = req.get("width_rates")
        if wr is not None:
            if not isinstance(wr, list) or not all(
                    _in_range(x, lo, hi) for x in wr):
                return (f"width_rates must be a list of numbers in "
                        f"[{lo}, {hi}]")
            if len(wr) != len(text):
                return "width_rates length must match text"
        clo, chi = CONTROL_RANGE
        for key in ("e_control", "d_control"):
            if not _in_range(req.get(key, 1.0), clo, chi):
                return f"{key} must be a number in [{clo}, {chi}]"
        return None

    def submit(self, req: dict) -> tuple[int, dict]:
        """Queue one request for micro-batching; blocks until served or
        until the request deadline passes (-> 504)."""
        err = self._validate(req)
        if err:
            return 400, {"error": err}
        p = _Pending(req, self.timeout_s)
        with self._submit_lock:
            if self._stop.is_set():
                return 503, {"error": "server is shutting down"}
            try:
                self._q.put_nowait(p)
            except queue.Full:
                with self._stats_lock:
                    self.stats["errors"] += 1
                return 503, {"error": "server overloaded (queue full)"}
        served = p.event.wait(
            timeout=max(0.0, p.deadline - time.perf_counter()) + 0.05)
        with self._stats_lock:
            self.stats["requests"] += 1
            self._latencies.append(time.perf_counter() - p.t0)
            if not served or p.error:
                self.stats["errors"] += 1
            if not served or p.error_code == 504:
                self.stats["timeouts"] += 1
        if not served:
            # still queued or in a wedged device call past the deadline;
            # whoever eventually sets the event finds no reader
            return 504, {"error": "request deadline exceeded"}
        if p.error:
            return p.error_code, {"error": p.error}
        return 200, p.result

    def run_batch(self, items) -> tuple[int, dict]:
        """Explicit batch: one device call for the whole list.

        Admission is all-or-nothing INSIDE the submit lock (no half-enqueued
        prefix the worker might already be serving), and an explicit batch
        may never take the last `batch_reserve` queue slots — those are held
        for /v1/synthesize singles so one bulk client cannot own the queue.
        """
        if not isinstance(items, list) or not items:
            return 400, {"error": "items must be a non-empty list"}
        for it in items:
            err = self._validate(it)
            if err:
                return 400, {"error": err}
        pend = [_Pending(it, self.timeout_s) for it in items]
        with self._submit_lock:
            if self._stop.is_set():
                return 503, {"error": "server is shutting down"}
            # qsize is exact under the submit lock (all producers hold it;
            # concurrent worker gets only FREE slots, so the check is
            # conservative-safe)
            free = self._q.maxsize - self._q.qsize()
            if len(pend) > max(0, free - self.batch_reserve):
                with self._stats_lock:
                    self.stats["errors"] += len(pend)
                return 503, {"error": "server overloaded (queue full)"}
            for p in pend:
                self._q.put_nowait(p)
        deadline = pend[0].deadline
        timed_out = False
        for p in pend:
            if not p.event.wait(
                    timeout=max(0.0, deadline - time.perf_counter()) + 0.05):
                timed_out = True
                break
        with self._stats_lock:
            self.stats["requests"] += len(pend)
            self._latencies.extend(
                time.perf_counter() - p.t0 for p in pend)
            n_err = sum(1 for p in pend if p.error) if not timed_out else len(pend)
            self.stats["errors"] += n_err
            if timed_out:
                self.stats["timeouts"] += 1
        if timed_out:
            return 504, {"error": "request deadline exceeded"}
        first_err = next((p for p in pend if p.error), None)
        if first_err is not None:
            return first_err.error_code, {"error": first_err.error}
        return 200, {"items": [p.result for p in pend]}

    # -------------------------------------------------------------- worker
    def _work(self) -> None:
        try:
            self._work_loop()
        finally:
            self._drain_queue()

    def _collect_group(self, block: bool) -> list[_Pending]:
        """Drain up to max_batch requests within the batching window.
        block=True waits briefly for a first item (idle worker); block=False
        returns [] immediately when the queue is empty (pipeline already has
        work in flight — never delay it)."""
        try:
            first = (self._q.get(timeout=0.1) if block
                     else self._q.get_nowait())
        except queue.Empty:
            return []
        # e/d controls are per-item traced inputs, so ANY mix of requests
        # shares one device batch — no grouping, no re-queueing, no
        # starvation of minority control values
        group = [first]
        window_end = time.perf_counter() + self.window_s
        while len(group) < self.max_batch:
            left = window_end - time.perf_counter()
            if left <= 0:
                break
            try:
                group.append(self._q.get(timeout=left))
            except queue.Empty:
                break
        # expired-while-queued requests get 504 with NO device work (their
        # handler threads have already answered or will on their own wait
        # timeout)
        now = time.perf_counter()
        for p in group:
            if p.deadline < now:
                p.error = "request deadline exceeded"
                p.error_code = 504
                p.event.set()
        return [p for p in group if not p.event.is_set()]

    def _work_loop(self) -> None:
        """Singleton worker: it must never die, or every queued and future
        request would block forever on its event.

        Groups are PIPELINED up to pipeline_depth device calls in flight:
        while group n's dispatch round-trips the device (the dominant cost
        on a tunneled TPU — docs/PERF.md measures the per-dispatch tail at
        ~0.5 s against 77 ms of device compute), the worker collects and
        dispatches group n+1. Retirement is in dispatch order, so responses
        stay FIFO-fair and each flight keeps its own watchdog deadline."""
        inflight: collections.deque = collections.deque()
        while not self._stop.is_set():
            group = []
            try:
                while len(inflight) < self.pipeline_depth:
                    group = self._collect_group(block=not inflight)
                    if not group:
                        break
                    flight = self._dispatch_group(group)
                    group = []
                    if flight is not None:
                        inflight.append(flight)
                if not inflight:
                    continue
                if len(inflight) >= self.pipeline_depth:
                    # no dispatch capacity left: block on the head until it
                    # completes or its watchdog deadline fails it
                    self._retire_safe(inflight.popleft())
                else:
                    # capacity remains: poll the head briefly, then loop to
                    # re-check the queue — a blocking join here would stall
                    # new arrivals behind the in-flight call (the whole
                    # point of the pipeline is to dispatch them under it)
                    head = inflight[0]
                    head.thread.join(timeout=0.005)
                    if (not head.thread.is_alive()
                            or time.perf_counter() >= head.deadline):
                        inflight.popleft()
                        self._retire_safe(head)
            except Exception as e:  # pragma: no cover - defensive
                # whatever happened, EVERY collected-but-undispatched member
                # must be released — a missed event hangs that client forever
                _log.exception("worker loop error", exc_info=e)
                for p in group:
                    if not p.event.is_set():
                        p.error = p.error or "synthesis failed"
                        p.event.set()
        while inflight:  # shutdown: settle every in-flight group
            self._retire_safe(inflight.popleft())

    def _retire_safe(self, f: "_Flight") -> None:
        """_retire that can never hang the flight's clients: on an
        unexpected retire error every unreleased member is failed."""
        try:
            self._retire(f)
        except Exception as e:  # pragma: no cover - defensive
            _log.exception("retire error", exc_info=e)
            for p in f.live:
                if not p.event.is_set():
                    p.error = p.error or "synthesis failed"
                    p.event.set()

    class _Flight:
        __slots__ = ("live", "outcome", "thread", "sig", "deadline",
                     "record_stats")

    def _circuit_open(self) -> bool:
        """True while any timed-out device call is still running. Dead
        threads are pruned; a brief grace join lets a just-cleared wedge
        serve instead of 503ing."""
        if not self._stuck_calls:
            return False
        self._stuck_calls[0].join(timeout=0.25)
        self._stuck_calls = [t for t in self._stuck_calls if t.is_alive()]
        return bool(self._stuck_calls)

    def _dispatch_group(self, live: list[_Pending],
                        record_stats: bool = True) -> "_Flight | None":
        """Start one micro-batch's device call; returns the in-flight handle
        (or None when the group was failed fast by the circuit breaker)."""
        if self._circuit_open():
            _log.error("circuit open: a timed-out device call is still "
                       "running; failing a %d-item group fast", len(live))
            for p in live:
                p.error = ("device unavailable (recovering from a stuck "
                           "dispatch)")
                p.error_code = 503
            with self._stats_lock:
                self.stats["breaker_fast_fails"] += len(live)
            # record_stats=False: these groups never touched the device —
            # counting them as batches would report healthy-looking
            # mean_batch_size/batches during an outage
            self._finish(live, record_stats=False)
            return None
        f = BatchingServer._Flight()
        f.live = live
        f.outcome = {}
        f.record_stats = record_stats
        f.sig = self.synth.batch_signature([p.req["text"] for p in live])
        timeout = (self.device_timeout_s if f.sig in self._warm_sigs
                   else self.cold_timeout_s)
        f.deadline = time.perf_counter() + timeout
        f.thread = threading.Thread(
            target=self._device_call, args=(f.live, f.outcome), daemon=True,
            name="vow-serve-device-call")
        f.thread.start()
        return f

    def _retire(self, f: "_Flight") -> None:
        """Settle one in-flight group: join its device call under the
        watchdog deadline, then fill results / isolate faults."""
        live, outcome, record_stats = f.live, f.outcome, f.record_stats
        f.thread.join(timeout=max(0.0, f.deadline - time.perf_counter()))
        if f.thread.is_alive():
            # wedged device call (the tunneled-TPU stall mode: dispatches
            # observed to take 0.2 s .. minutes, docs/PERF.md): fail this
            # group and keep the worker alive. The stuck thread eventually
            # finishes into `outcome`, which nobody reads — `live` is never
            # touched by it after this point (_device_call only fills
            # `outcome`).
            _log.error("device call exceeded its %.1fs watchdog for a "
                       "%d-item group; failing the group",
                       self.device_timeout_s if f.sig in self._warm_sigs
                       else self.cold_timeout_s, len(live))
            self._stuck_calls.append(f.thread)
            for p in live:
                p.error = "synthesis timed out"
                p.error_code = 504
            self._finish(live, record_stats)
            return
        self._warm_sigs.add(f.sig)  # executable exists now; tight cap next
        if "exc" in outcome:
            e = outcome["exc"]
            # full details server-side only; clients get a generic message
            # (exception text can carry internal shapes/paths)
            _log.exception("synthesis failed for a %d-item group",
                           len(live), exc_info=e)
            if len(live) > 1:
                # isolate the fault: retry items individually so one bad
                # request cannot fail the innocent requests batched with it.
                # Retries don't count as batches (stats would otherwise
                # collapse mean_batch_size toward 1 on a transient failure).
                for p in live:
                    self._serve_group([p], record_stats=False)
                if record_stats:  # the original batch counts exactly once
                    with self._stats_lock:
                        self.stats["batches"] += 1
                        self.stats["batched_requests"] += len(live)
                return
            live[0].result = None
            live[0].error = "synthesis failed"
        else:
            for p, r in zip(live, outcome["results"]):
                p.result = r
        self._finish(live, record_stats)

    def _serve_group(self, group: list[_Pending],
                     record_stats: bool = True) -> None:
        """Synchronous dispatch+retire of one group (the per-item retry
        path and the multichip dry-run drive this directly)."""
        f = self._dispatch_group(group, record_stats)
        if f is not None:
            self._retire(f)

    def _device_call(self, live: list[_Pending], outcome: dict) -> None:
        """Run one micro-batch through the device and build the JSON
        responses into `outcome` ({"results": [...]} or {"exc": e}). Runs on
        a short-lived thread so the worker can watchdog it; it writes ONLY
        to `outcome`, so a timed-out call can never race the worker on the
        _Pending objects."""
        from visual_onoma_to_wave_tpu.data.audio_io import wav_bytes

        sr = self.synth.config.audio.sampling_rate
        hop = self.synth.config.audio.stft.hop_length
        try:
            # return_mel=False: the responses only need frame counts, so the
            # (B, T, n_mels) mel batch never leaves the device
            results = self.synth.synthesize_batch(
                [p.req["text"] for p in live],
                [p.req.get("audiotype", 0) for p in live],
                width_rates=[p.req.get("width_rates") for p in live],
                e_control=[float(p.req.get("e_control", 1.0)) for p in live],
                d_control=[float(p.req.get("d_control", 1.0)) for p in live],
                return_mel=False)
            # response building stays inside the try: an encode failure must
            # route through the same isolation/error path as a device one
            outcome["results"] = [{
                "sample_rate": sr,
                "mel_frames": int(r.mel_len),
                "durations": [int(d) for d in r.durations],
                "seconds": float(r.mel_len * hop / sr),
                "wav_b64": (base64.b64encode(
                    wav_bytes(np.asarray(r.wav), sr)).decode()
                    if r.wav is not None else None),
            } for r in results]
        except Exception as e:
            outcome["exc"] = e

    def _finish(self, group: list[_Pending], record_stats: bool = True) -> None:
        if record_stats:
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["batched_requests"] += len(group)
        for p in group:
            p.event.set()
