"""Trace post-processing: summarize a jax.profiler trace into an op table.

Companion to ``utils.profiling.trace`` — reads the Perfetto JSON the
profiler writes and aggregates device-op durations, so "where did the step
time go" is one function call instead of hand-parsing (used in round 1 to
find the VGG convs at 15–25% MXU utilization).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os


def _find_trace_json(log_dir: str) -> str:
    pats = [
        os.path.join(log_dir, "**", "*.trace.json.gz"),
        os.path.join(log_dir, "**", "*.trace.json"),
    ]
    for pat in pats:
        hits = sorted(glob.glob(pat, recursive=True))
        if hits:
            return hits[-1]
    raise FileNotFoundError(f"no trace json under {log_dir}")


def _load_events(path: str) -> list:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def summarize_trace(log_dir: str, top_k: int = 20) -> list[dict]:
    """→ top-k device ops by total duration: [{name, total_ms, pct, hlo}]."""
    events = _load_events(_find_trace_json(log_dir))
    durs: collections.Counter = collections.Counter()
    meta: dict = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e.get("name", "")
        # skip host-side python frames and jit dispatch envelopes
        if name.startswith(("$", "np.", "jit_")) or "trace" in name:
            continue
        durs[name] += e["dur"]
        if name not in meta and isinstance(e.get("args"), dict):
            meta[name] = e["args"].get("long_name", e["args"].get("tf_op", ""))
    total = sum(durs.values()) or 1
    return [
        {
            "name": name,
            "total_ms": dur / 1e3,
            "pct": 100.0 * dur / total,
            "hlo": (meta.get(name) or "")[:140],
        }
        for name, dur in durs.most_common(top_k)
    ]


def print_trace_summary(log_dir: str, top_k: int = 20) -> None:
    rows = summarize_trace(log_dir, top_k)
    for r in rows:
        print(f"{r['total_ms']:9.2f} ms {r['pct']:5.1f}%  {r['name'][:40]:40s} {r['hlo']}")
