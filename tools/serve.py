"""Minimal HTTP serving daemon around ``Summarizer`` (stdlib-only).

The reference's serving story ends at "run the eval script"; this closes
the deployment gap: one resident process holds the jitted programs warm
and answers requests over HTTP.

    python tools/serve.py --run_dir runs/mmbidaf [--port 8080] \
        [--mode greedy|topk|beam] [--serve_batch_size 8] [--long] \
        [--dynamic_batch 8 --batch_wait_ms 5 --max_queue 64] \
        [--warmup 240x320]
    python tools/serve.py --artifact artifact/   # AOT artifact, no model code

Endpoints:
    GET  /healthz                 → {"ok": true, "backend": ...}
    POST /summarize               {"video_dir": "/path"}           → {"summary": ...}
    POST /summarize_batch         {"video_dirs": ["/a", "/b"]}     → {"summaries": [...]}

Requests are served from a thread pool; ``Summarizer`` is share-safe
(greedy/beam decodes are stateless; top-k's rng advance is behind a
lock). ``serve_batch_size`` pins ONE compiled batch shape so request
sizes never trigger recompiles. Bad assets return 400 with the error
string — a poisoned request never takes the server down
(tests/test_serve_daemon.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _LatencyStats:
    """Bounded per-endpoint request-latency window → count/error/p50/p95.

    The serving-side observability row (SURVEY §6 metrics): enough to see
    throughput and tail behaviour from /healthz without external tooling.
    """

    def __init__(self, window: int = 512):
        from collections import defaultdict, deque

        self._lock = threading.Lock()
        self._lat = defaultdict(lambda: deque(maxlen=window))
        self._count = defaultdict(int)
        self._errors = defaultdict(int)

    def record(self, endpoint: str, seconds: float, ok: bool) -> None:
        with self._lock:
            self._lat[endpoint].append(seconds)
            self._count[endpoint] += 1
            if not ok:
                self._errors[endpoint] += 1

    def snapshot(self) -> dict:
        import math

        with self._lock:
            out = {}
            for ep, window in self._lat.items():
                lat = sorted(window)
                n = len(lat)
                # nearest-rank percentile: ceil(q*n)-1 (a floor-based index
                # sat one rank low and could report p95 < p50 at n=2)
                q = lambda p: lat[max(0, math.ceil(p * n) - 1)]  # noqa: E731
                out[ep] = {
                    "count": self._count[ep],
                    "errors": self._errors[ep],
                    "p50_ms": round(q(0.50) * 1e3, 2),
                    "p95_ms": round(q(0.95) * 1e3, 2),
                }
            return out


def _parallelism_info(s) -> dict | None:
    """Mesh/sharding layout for /healthz — ops needs to see whether the
    process actually serves sharded (DP/SP/TP) without reading logs.
    Works for both the live Summarizer and an ExportedSummarizer."""
    mesh = getattr(s, "_mesh", None)
    if mesh is not None:
        return {
            "mesh_axes": {a: int(mesh.shape[a]) for a in mesh.axis_names},
            "dp_shards": int(getattr(s, "_dp_shards", 1)),
            "sp_audio": getattr(s, "_audio_g_fn", None) is not None,
            "tp_vgg": bool(s.cfg.mesh.tp_vgg),
        }
    dec = getattr(s, "decoder", None)  # AOT artifact
    if dec is not None and dec.manifest.get("mesh"):
        mm = dec.manifest["mesh"]
        return {
            "mesh_axes": dict(zip(mm["axis_names"], mm["shape"])),
            "artifact_format": dec.manifest["format_version"],
        }
    return None


def make_handler(summarizer, use_long: bool, batcher=None):
    import jax

    backend = jax.default_backend()
    latency = _LatencyStats()
    parallelism = _parallelism_info(summarizer)
    # live Summarizer carries .mode; an artifact's mode was frozen at export
    dec = getattr(summarizer, "decoder", None)
    decode_mode = dec.decode_mode if dec is not None else summarizer.mode

    class Handler(BaseHTTPRequestHandler):
        # one summarize at a time keeps device memory bounded; host decode
        # of the NEXT request still overlaps via the server's thread pool.
        # With --dynamic_batch, /summarize bypasses this lock: the batcher
        # serializes device work itself and COALESCES concurrent requests
        # into one device batch (serving.DynamicBatcher).
        _lock = threading.Lock()

        def _reply(self, code: int, payload: dict,
                   retry_after: float | None = None) -> int:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if retry_after is not None:
                self.send_header("Retry-After", str(retry_after))
            self.end_headers()
            self.wfile.write(body)
            return code

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"ok": True, "backend": backend,
                           "decode_mode": decode_mode,
                           "latency": latency.snapshot()}
                if parallelism is not None:
                    payload["parallelism"] = parallelism
                if batcher is not None:
                    payload["batcher"] = dict(batcher.stats)
                bucketed = (
                    getattr(summarizer, "_ladders", None) is not None
                    or bool(getattr(getattr(summarizer, "decoder", None),
                                    "bucket_levels", None))
                )
                if bucketed:
                    # rung tuple (T_s, W, T_img, T_aud) → device-batch count
                    with summarizer._stats_lock:
                        payload["buckets"] = {
                            "x".join(map(str, k)): v
                            for k, v in summarizer.bucket_stats.items()
                        }
                self._reply(200, payload)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            import time

            t0 = time.monotonic()
            code = self._post()
            if self.path in ("/summarize", "/summarize_batch"):
                latency.record(self.path, time.monotonic() - t0, ok=code == 200)

        def _post(self) -> int:
            import wave as wave_mod

            from mmbidaf_tpu.serving import ServerOverloadedError

            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                return self._reply(400, {"error": f"bad request body: {e}"})
            # request-field validation OUTSIDE the handler try: a KeyError
            # raised inside the summarizer must not masquerade as a
            # missing request field
            if self.path == "/summarize":
                if "video_dir" not in req:
                    return self._reply(400, {"error": "missing field 'video_dir'"})
            elif self.path == "/summarize_batch":
                if "video_dirs" not in req:
                    return self._reply(400, {"error": "missing field 'video_dirs'"})
            else:
                return self._reply(404, {"error": f"unknown path {self.path}"})
            try:
                if self.path == "/summarize":
                    if batcher is not None and not use_long:
                        # no lock: concurrent requests are the point —
                        # the batcher coalesces them into one device batch
                        out = batcher.submit(req["video_dir"])
                    else:
                        with self._lock:
                            out = (summarizer.summarize_long(req["video_dir"])
                                   if use_long
                                   else summarizer.summarize(req["video_dir"]))
                    return self._reply(200, {"summary": out})
                with self._lock:
                    outs = summarizer.summarize_batch(list(req["video_dirs"]))
                return self._reply(200, {"summaries": outs})
            except ServerOverloadedError as e:
                # load shedding (batcher queue at --max_queue) — 503 tells
                # clients/load-balancers to back off and retry, not to file
                # a client error
                return self._reply(503, {"error": str(e), "kind": "overloaded"},
                                   retry_after=1)
            except (OSError, ValueError, wave_mod.Error, EOFError) as e:
                # bad assets (corrupt/unreadable PNG/WAV, missing files,
                # malformed dirs) fail the REQUEST, not the server
                return self._reply(
                    400, {"error": f"{type(e).__name__}: {e}", "kind": "bad_asset"}
                )
            except Exception as e:
                # anything else is a SERVER fault — 500 so retry/alerting
                # infrastructure doesn't file it as a client mistake
                return self._reply(
                    500, {"error": f"{type(e).__name__}: {e}", "kind": "server_error"}
                )

    return Handler


def serve(summarizer, port: int = 8080, host: str = "127.0.0.1",
          use_long: bool = False, batcher=None) -> ThreadingHTTPServer:
    """Build (but don't run) the server — callers own serve_forever()."""
    srv = ThreadingHTTPServer(
        (host, port), make_handler(summarizer, use_long, batcher=batcher)
    )
    # Non-daemon handler threads: ThreadingMixIn only TRACKS non-daemon
    # threads (CPython _Threads.append drops daemon ones), so this is what
    # makes server_close() actually join in-flight requests on shutdown —
    # SIGTERM "drain" finishes the running request instead of killing its
    # thread at interpreter exit.
    srv.daemon_threads = False
    return srv


def main():
    ap = argparse.ArgumentParser(description="MMBiDAF-TPU serving daemon")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir",
                     help="train.py run directory (config + vocab + ckpts)")
    src.add_argument("--artifact",
                     help="AOT artifact directory (tools/export_artifact.py):"
                          " serves the frozen StableHLO program without the"
                          " model-building code; decode mode (greedy/beam)"
                          " and batch/frame shapes pinned by the artifact")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--mode", default="greedy", choices=["greedy", "topk", "beam"])
    ap.add_argument("--topk", type=int, default=4)
    ap.add_argument("--bucket_serving", action="store_true",
                    help="trim each device batch's feature axes to "
                         "quarter/half/full bucket rungs covering its true "
                         "lengths — short videos skip the padded VGG/MFCC "
                         "compute; outputs unchanged (one compile per rung "
                         "tuple seen)")
    ap.add_argument("--bucket_ladders", default=None, metavar="FILE.json",
                    help="explicit per-axis ladders for --bucket_serving "
                         "(JSON dict: sentences/words/keyframes/"
                         "audio_frames → rung list; the format "
                         "data.pipeline.suggest_buckets emits — derive from "
                         "the training corpus, serve with it)")
    ap.add_argument("--serve_batch_size", type=int, default=None,
                    help="pin ONE compiled batch shape (recommended)")
    ap.add_argument("--long", action="store_true",
                    help="windowed decode for transcripts beyond max_sentences")
    ap.add_argument("--dynamic_batch", type=int, default=0, metavar="N",
                    help="coalesce concurrent /summarize requests into device "
                         "batches of up to N (0 = off; incompatible with --long)")
    ap.add_argument("--batch_wait_ms", type=float, default=5.0,
                    help="max time the batcher waits to fill a batch")
    ap.add_argument("--max_queue", type=int, default=0, metavar="N",
                    help="with --dynamic_batch: shed load (HTTP 503) once N "
                         "requests are pending (0 = unbounded)")
    ap.add_argument("--pipeline_depth", type=int, default=1, metavar="N",
                    help="with --dynamic_batch: device batches dispatched "
                         "but not yet fetched while the batcher collates/"
                         "uploads the next one (1 = double-buffer, 0 = "
                         "synchronous)")
    ap.add_argument("--warmup", default="", metavar="HxW",
                    help="compile the serving programs at startup on a "
                         "synthetic batch with HxW frames (e.g. 240x320) so "
                         "the first request doesn't pay the XLA compile; "
                         "H/W must match the corpus frame resolution")
    ap.add_argument("--data_parallel", action="store_true",
                    help="shard each device batch over the mesh's data axes "
                         "(all local chips); requires --serve_batch_size to "
                         "be a multiple of the device count")
    ap.add_argument("--tp_vgg", type=int, choices=[0, 1], default=None,
                    help="1: shard the VGG classifier tensor-parallel over "
                         "the 'model' mesh axis (needs --num_model N > 1); "
                         "0: force replicated weights even if the run "
                         "config trained with tp_vgg. Composes with "
                         "--data_parallel (devices split as data x model)")
    ap.add_argument("--num_model", type=int, default=None,
                    help="devices on the 'model' mesh axis (override the "
                         "run config)")
    ap.add_argument("--jax_cache", default=None, metavar="DIR",
                    help="persistent compilation cache dir (default: repo "
                         ".jax_cache on TPU, off on CPU; '' = off) — makes "
                         "daemon restarts warm instead of paying the ~10-min "
                         "server compile")
    a = ap.parse_args()
    if a.dynamic_batch and a.long:
        ap.error("--dynamic_batch batches whole-video requests; --long's "
                 "windowed decode already batches internally — pick one")
    serve_buckets = a.bucket_serving or None
    if a.bucket_ladders:
        if not a.bucket_serving:
            ap.error("--bucket_ladders configures --bucket_serving — pass "
                     "both")
        try:
            with open(a.bucket_ladders) as f:
                serve_buckets = json.load(f)
        except (OSError, ValueError) as e:
            ap.error(f"--bucket_ladders {a.bucket_ladders}: {e}")
        if not isinstance(serve_buckets, dict) or not serve_buckets:
            ap.error(f"--bucket_ladders {a.bucket_ladders}: expected a "
                     "non-empty JSON dict of per-axis rung lists")
    if serve_buckets is not None and a.run_dir:
        # validate ladder CONTENT (axis names, rung values, sp alignment)
        # against the run's config BEFORE the multi-minute checkpoint load —
        # same fail-fast convention as the batcher check below
        from mmbidaf_tpu.serving import serving_bucket_ladders
        from mmbidaf_tpu.train.checkpoint import load_config

        try:
            run_cfg = load_config(a.run_dir)
        except Exception:
            # a broken run_dir/config.json is NOT a ladder problem — let
            # Summarizer.from_run surface it with its own diagnostics
            run_cfg = None
        if run_cfg is not None:
            try:
                serving_bucket_ladders(run_cfg, serve_buckets)
            except ValueError as e:
                ap.error(f"--bucket_serving/--bucket_ladders: {e}")
    if a.artifact:
        # the artifact IS the program: mode/batch/sharding were fixed at
        # export time (--dynamic_batch works, pinned to the artifact batch;
        # --long works — ExportedSummarizer windows through the frozen
        # program)
        for flag, name in ((a.mode != "greedy", "--mode"),
                           (a.data_parallel, "--data_parallel"),
                           (a.serve_batch_size, "--serve_batch_size"),
                           (a.bucket_serving, "--bucket_serving"),
                           (a.tp_vgg is not None, "--tp_vgg"),
                           (a.num_model is not None, "--num_model")):
            if flag:
                ap.error(f"{name} is fixed at export time — re-export the "
                         "artifact (or serve interactively via --run_dir)")
    warmup_hw = None
    if a.warmup:
        try:
            warmup_hw = tuple(int(x) for x in a.warmup.lower().split("x"))
            if len(warmup_hw) != 2:
                raise ValueError(a.warmup)
        except ValueError:
            ap.error(f"--warmup wants HxW (e.g. 240x320), got {a.warmup!r}")

    # SIGTERM (systemd/k8s stop) drains like Ctrl-C. Installed BEFORE model
    # load/warmup: a stop signal during a multi-minute cold compile must
    # unwind the interpreter (letting the PJRT client tear down its device
    # claim) instead of the default abrupt termination, which wedges a
    # tunnelled TPU claim for the replacement process (CLAUDE.md).
    import signal

    def _sigterm(signum, frame):
        # First TERM drains gracefully; the handler then reverts to the
        # DEFAULT disposition, so a repeat TERM (supervisor escalation, or a
        # process-group signal arriving twice) terminates immediately
        # instead of raising inside teardown/atexit. SIG_IGN here would
        # strand a hung drain with no signal-based escalation short of KILL.
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)

    from mmbidaf_tpu.serving import DynamicBatcher, Summarizer
    from mmbidaf_tpu.utils.cache import enable_cli_cache

    batcher = None
    try:
        cache_dir = enable_cli_cache(a.jax_cache)
        if cache_dir:
            print(f"compilation cache: {cache_dir}")

        if a.artifact:
            from mmbidaf_tpu.export import ExportedSummarizer

            s = ExportedSummarizer(a.artifact)
            if warmup_hw is not None and warmup_hw != s.decoder.frame_hw:
                ap.error(f"--warmup {a.warmup} != the artifact's pinned "
                         f"frame_hw {s.decoder.frame_hw}")
        else:
            mesh_over = {}
            if a.tp_vgg is not None:
                mesh_over["tp_vgg"] = bool(a.tp_vgg)
            if a.num_model is not None:
                mesh_over["num_model"] = a.num_model
            s = Summarizer.from_run(
                a.run_dir, mode=a.mode, topk=a.topk,
                serve_batch_size=a.serve_batch_size,
                data_parallel=a.data_parallel,
                serve_buckets=serve_buckets,
                mesh_overrides=mesh_over or None,
            )
        # batcher BEFORE warmup: its constructor validates max_batch_size
        # against the DP shard count — fail fast instead of paying a
        # multi-minute warmup compile and then crashing on the check
        if a.dynamic_batch:
            batcher = DynamicBatcher(s, max_batch_size=a.dynamic_batch,
                                     max_wait_ms=a.batch_wait_ms,
                                     max_queue=a.max_queue or None,
                                     pipeline_depth=a.pipeline_depth)
        if warmup_hw is not None:
            import time

            t0 = time.monotonic()
            if a.artifact:
                s.warmup()
            else:
                s.warmup(warmup_hw, batch_size=a.dynamic_batch or None,
                         include_long=a.long)
            print(f"warmup: serving programs compiled in "
                  f"{time.monotonic() - t0:.1f} s")
    except KeyboardInterrupt:
        if batcher is not None:
            batcher.close()
        print("stopped during startup")
        return
    srv = serve(s, port=a.port, host=a.host, use_long=a.long, batcher=batcher)
    print(f"serving {a.run_dir or a.artifact} on "
          f"http://{a.host}:{srv.server_address[1]} "
          f"(mode={a.mode}{', long' if a.long else ''}"
          f"{f', dynamic_batch={a.dynamic_batch}' if batcher else ''})")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        srv.shutdown()
        # join in-flight handler threads (ThreadingHTTPServer tracks them
        # while block_on_close is true): "drain" must mean the running
        # request actually finishes before the interpreter exits
        srv.server_close()
    finally:
        if batcher is not None:
            batcher.close()


if __name__ == "__main__":
    main()
