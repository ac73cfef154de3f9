"""Serving load test: concurrent mixed-length clients vs the live daemon.

SURVEY.md:96 makes batched serving (config 5) a product surface; this CLI
measures it the way an SRE would: N client threads posting mixed-length
``/summarize`` requests against the real ``tools/serve.py`` HTTP stack
(same handler, same lock/batcher paths), reporting p50/p95/p99 request
latency and sustained videos/s for each serving configuration that exists
for exactly this scenario:

  * ``seq``             — plain daemon (handler lock serializes the device)
  * ``batch``           — DynamicBatcher coalescing (no buckets)
  * ``batch_sync``      — same, pipeline_depth=0 (fetch blocks next collate)
  * ``bucket_group``    — bucket-ladder trimming + covering-rung grouping
  * ``bucket_nogroup``  — bucket trimming, one full-cap batch per window

One process = one TPU claim (CLAUDE.md): the server runs in-process on an
ephemeral port and every config reuses the same weights, so a whole sweep
costs a single claim.  Results land in docs/OPERATIONS.md.

    python tools/load_test.py --out docs/LOAD_r4.json            # TPU sweep
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/load_test.py \
        --tiny --requests 12 --clients 4                          # CPU smoke

Environment caveat recorded with the numbers: host→device goes through the
axon relay (~1 MB/s), so absolute latencies here include an input-transfer
term a directly-attached TPU would not pay; the CONFIG-to-config deltas are
the portable signal. ``--res`` controls raw frame resolution (H2D bytes).
"""

from __future__ import annotations

import argparse
import dataclasses
import http.client
import json
import math
import os
import queue as queue_mod
import sys
import threading
import time
import wave as wave_mod

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TIERS = {"quarter": 0.25, "half": 0.5, "full": 1.0}


# -- synthetic mixed-length corpus -------------------------------------------

def write_video_dir(vd: str, rng: np.random.Generator, *, n_frames: int,
                    n_samples: int, n_sents: int, res: tuple[int, int],
                    sample_rate: int) -> None:
    """One serving-layout video dir (frames/ + audio.wav + transcript.txt)."""
    from PIL import Image

    h, w = res
    os.makedirs(os.path.join(vd, "frames"), exist_ok=True)
    for i in range(n_frames):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(vd, "frames", f"f{i:04d}.png"))
    sig = (np.sin(np.arange(n_samples) * (rng.uniform(0.02, 0.2)))
           * 18000).astype(np.int16)
    with wave_mod.open(os.path.join(vd, "audio.wav"), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(sig.tobytes())
    sents = [f"Clip sentence {j} covers item {int(rng.integers(999))}."
             for j in range(n_sents)]
    with open(os.path.join(vd, "transcript.txt"), "w") as f:
        f.write(" ".join(sents))


def make_mixed_corpus(root: str, cfg, *, per_tier: int = 2,
                      res: tuple[int, int] = (48, 64),
                      seed: int = 0) -> dict[str, list[str]]:
    """Tiered videos at quarter/half/full fractions of the static caps."""
    rng = np.random.default_rng(seed)
    d = cfg.data
    cap_samples = d.max_audio_frames * d.hop_length + d.win_length
    dirs: dict[str, list[str]] = {}
    for tier, frac in TIERS.items():
        dirs[tier] = []
        for v in range(per_tier):
            vd = os.path.join(root, f"{tier}_{v}")
            write_video_dir(
                vd, rng,
                n_frames=max(1, round(frac * d.max_keyframes)),
                n_samples=max(d.win_length + 1, round(frac * cap_samples)),
                n_sents=max(2, round(frac * d.max_sentences)),
                res=res, sample_rate=d.sample_rate,
            )
            dirs[tier].append(vd)
    return dirs


# -- client driver ------------------------------------------------------------

def percentile(xs: list[float], q: float) -> float:
    """Nearest-rank percentile ceil(q*n)-1 (matches serve._LatencyStats)."""
    if not xs:
        return float("nan")
    s = sorted(xs)
    return s[min(len(s) - 1, max(0, math.ceil(q / 100.0 * len(s)) - 1))]


def _post(port: int, video_dir: str, timeout: float) -> tuple[int, str]:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        body = json.dumps({"video_dir": video_dir})
        conn.request("POST", "/summarize", body,
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        return r.status, r.read().decode()
    finally:
        conn.close()


def drive(port: int, dirs_by_tier: dict[str, list[str]], *, clients: int,
          requests: int, timeout: float, seed: int = 0) -> dict:
    """Fire `requests` mixed-tier requests from `clients` threads."""
    rng = np.random.default_rng(seed)
    # deterministic mixed arrival order: tiers interleaved, then shuffled
    pool = [(t, d) for t, ds in dirs_by_tier.items() for d in ds]
    work: queue_mod.Queue = queue_mod.Queue()
    for i in range(requests):
        work.put(pool[int(rng.integers(len(pool)))])
    records: list[tuple[str, float, int]] = []
    rec_lock = threading.Lock()
    barrier = threading.Barrier(clients + 1)

    def client():
        barrier.wait()
        while True:
            try:
                tier, vd = work.get_nowait()
            except queue_mod.Empty:
                return
            t0 = time.monotonic()
            try:
                code, _ = _post(port, vd, timeout)
            except Exception:
                code = -1
            dt = time.monotonic() - t0
            with rec_lock:
                records.append((tier, dt, code))

    threads = [threading.Thread(target=client, daemon=True)
               for _ in range(clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t_start = time.monotonic()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    lats = [dt for _, dt, code in records if code == 200]
    by_tier = {
        tier: [dt for tr, dt, code in records if tr == tier and code == 200]
        for tier in dirs_by_tier
    }
    return {
        "requests": len(records),
        "ok": len(lats),
        "errors": len(records) - len(lats),
        "wall_s": round(wall, 3),
        "sustained_vps": round(len(lats) / wall, 3) if wall > 0 else 0.0,
        "latency_ms": {
            "p50": round(percentile(lats, 50) * 1e3, 1),
            "p95": round(percentile(lats, 95) * 1e3, 1),
            "p99": round(percentile(lats, 99) * 1e3, 1),
            "mean": round(float(np.mean(lats)) * 1e3, 1) if lats else None,
        },
        "per_tier_p50_ms": {
            t: round(percentile(v, 50) * 1e3, 1) for t, v in by_tier.items()
        },
        "per_tier_p95_ms": {
            t: round(percentile(v, 95) * 1e3, 1) for t, v in by_tier.items()
        },
    }


# -- one configuration --------------------------------------------------------

def run_config(summarizer, dirs_by_tier: dict[str, list[str]], *, name: str,
               clients: int, requests: int, dynamic_batch: int = 0,
               group_buckets: bool = True, batch_wait_ms: float = 5.0,
               pipeline_depth: int = 1,
               http_timeout: float = 600.0, seed: int = 0) -> dict:
    """Serve `summarizer` over HTTP and load it; returns the stats row."""
    from serve import serve  # tools/serve.py — the real daemon stack
    from mmbidaf_tpu.serving import DynamicBatcher

    batcher = None
    if dynamic_batch:
        batcher = DynamicBatcher(
            summarizer, max_batch_size=dynamic_batch,
            max_wait_ms=batch_wait_ms, group_buckets=group_buckets,
            pipeline_depth=pipeline_depth,
        )
    srv = serve(summarizer, port=0, batcher=batcher)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        # warmup: one sequential request per tier pays compiles (per-rung
        # programs under buckets) outside the measured window. A cold
        # remote compile can exceed any reasonable socket timeout; on a
        # client-side timeout the SERVER keeps compiling, so retrying just
        # queues behind the handler lock until the program is ready.
        for tier in dirs_by_tier:
            for attempt in range(4):
                try:
                    code, body = _post(port, dirs_by_tier[tier][0],
                                       max(http_timeout, 900.0))
                    break
                except (TimeoutError, ConnectionError, OSError) as e:
                    print(f"[{name}] warmup {tier} attempt {attempt + 1}: "
                          f"{type(e).__name__} (compile still running?) — "
                          "retrying", flush=True)
            else:
                raise RuntimeError(f"[{name}] warmup {tier} never completed")
            if code != 200:
                raise RuntimeError(f"[{name}] warmup {tier} failed: {body}")
            print(f"[{name}] warmup {tier} ok", flush=True)
        stats = drive(port, dirs_by_tier, clients=clients, requests=requests,
                      timeout=http_timeout, seed=seed)
    finally:
        srv.shutdown()
        srv.server_close()
        if batcher is not None:
            batcher.close()
    stats["config"] = name
    if batcher is not None:
        stats["batcher"] = dict(batcher.stats)
    return stats


# 'batch_sync' is the pipeline A/B: same batcher with pipeline_depth=0
# (fetch of batch N blocks collate/upload of batch N+1 — the r4 behavior)
CONFIGS = ("seq", "batch", "batch_sync", "bucket_group", "bucket_nogroup")


def run_sweep(make_summarizer, dirs_by_tier, *, configs=CONFIGS, clients=8,
              requests=48, dynamic_batch=8, batch_wait_ms=5.0,
              http_timeout=600.0) -> list[dict]:
    """Run the requested configs; `make_summarizer(buckets: bool)` builds
    (and may cache) a Summarizer with/without bucket serving."""
    rows = []
    for name in configs:
        buckets = name.startswith("bucket")
        s = make_summarizer(buckets)
        kw = dict(clients=clients, requests=requests,
                  batch_wait_ms=batch_wait_ms, http_timeout=http_timeout)
        if name == "seq":
            rows.append(run_config(s, dirs_by_tier, name=name, **kw))
        else:
            rows.append(run_config(
                s, dirs_by_tier, name=name, dynamic_batch=dynamic_batch,
                group_buckets=(name != "bucket_nogroup"),
                pipeline_depth=0 if name == "batch_sync" else 1, **kw))
        r = rows[-1]
        print(f"{name:16s} ok={r['ok']}/{r['requests']} "
              f"p50={r['latency_ms']['p50']}ms p95={r['latency_ms']['p95']}ms "
              f"p99={r['latency_ms']['p99']}ms "
              f"sustained={r['sustained_vps']} v/s", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--run_dir", default=None,
                    help="serve trained weights from this run (default: "
                    "random-init production config — latency is "
                    "weight-agnostic)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test config + TINY_SPEC (CPU smoke)")
    ap.add_argument("--corpus", default=None,
                    help="existing corpus root of video dirs (grouped into "
                    "one 'all' tier); default: synthesize tiered videos")
    ap.add_argument("--per_tier", type=int, default=2)
    ap.add_argument("--res", default="48x64", metavar="HxW",
                    help="raw frame resolution (sets H2D bytes/request)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--dynamic_batch", type=int, default=8)
    ap.add_argument("--batch_wait_ms", type=float, default=5.0)
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--http_timeout", type=float, default=1200.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--jax_cache", default=".jax_cache",
                    help="persistent compilation cache dir ('' to disable)")
    a = ap.parse_args()

    import jax
    if a.jax_cache:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(a.jax_cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from mmbidaf_tpu.config import Config, tiny_test_config
    from mmbidaf_tpu.ops.vgg import TINY_SPEC, VGG16_SPEC
    from mmbidaf_tpu.serving import Summarizer

    t0 = time.monotonic()
    jax.block_until_ready(jax.numpy.zeros(8) + 1)  # flush relay claim
    claim_s = time.monotonic() - t0
    print(f"backend={jax.default_backend()} claim={claim_s:.1f}s", flush=True)

    if a.tiny:
        cfg, spec = tiny_test_config(), TINY_SPEC
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc))
    else:
        cfg, spec = Config(), VGG16_SPEC

    cache: dict[bool, Summarizer] = {}

    def make_summarizer(buckets: bool) -> Summarizer:
        if buckets not in cache:
            if a.run_dir:
                cache[buckets] = Summarizer.from_run(
                    a.run_dir, serve_buckets=True if buckets else None)
            else:
                cache[buckets] = Summarizer.init_random(
                    cfg, seed=0, vgg_spec=spec,
                    serve_buckets=True if buckets else None)
            # share decoded params across the two summarizers
            if len(cache) == 2 and not a.run_dir:
                pass  # init_random(seed=0) twice → identical weights anyway
        return cache[buckets]

    if a.corpus:
        vids = sorted(
            os.path.join(a.corpus, d) for d in os.listdir(a.corpus)
            if os.path.isdir(os.path.join(a.corpus, d)))
        dirs_by_tier = {"all": vids}
    else:
        import tempfile
        root = tempfile.mkdtemp(prefix="mmb_load_")
        h, w = (int(x) for x in a.res.split("x"))
        dirs_by_tier = make_mixed_corpus(
            root, cfg, per_tier=a.per_tier, res=(h, w), seed=a.seed)
        print(f"corpus: {sum(len(v) for v in dirs_by_tier.values())} videos "
              f"in {root} (tiers {list(dirs_by_tier)}, frames {a.res})",
              flush=True)

    rows = run_sweep(
        make_summarizer, dirs_by_tier,
        configs=tuple(a.configs.split(",")), clients=a.clients,
        requests=a.requests, dynamic_batch=a.dynamic_batch,
        batch_wait_ms=a.batch_wait_ms, http_timeout=a.http_timeout)

    report = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0].device_kind),
        "claim_s": round(claim_s, 1),
        "clients": a.clients, "requests": a.requests,
        "dynamic_batch": a.dynamic_batch, "res": a.res,
        "per_tier": a.per_tier, "configs": rows,
        "note": ("latencies include axon-relay H2D (~1 MB/s); "
                 "config-to-config deltas are the portable signal"),
    }
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {a.out}")
    print(json.dumps({r["config"]: r["latency_ms"] for r in rows}))


def _install_sigterm():
    """SIGTERM → KeyboardInterrupt so an interrupted run UNWINDS (releases
    the PJRT device claim) instead of wedging the relay (CLAUDE.md)."""
    import signal

    def _h(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _h)


if __name__ == "__main__":
    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        print("load_test interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
