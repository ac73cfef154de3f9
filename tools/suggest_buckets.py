"""Emit corpus-derived bucket ladders as JSON (the ``--bucket_ladders``
format of ``tools/serve.py`` and ``infer.py``).

Closes the bucketing loop for operators: derive the ladders from the
training corpus's length distribution (``data.pipeline.suggest_buckets``:
one rung per length quantile, audio aligned to the SP seq axis), then
serve and acceptance-test with the exact same rung set::

    python tools/suggest_buckets.py --data_dir corpus/ > ladders.json
    python tools/serve.py --run_dir runs/x --bucket_serving \
        --bucket_ladders ladders.json
    python infer.py --data_dir corpus/ --bucket_eval \
        --bucket_ladders ladders.json ...

Pure host metadata sweep (header-only length reads, cached) — never
touches a device, so it is safe to run next to a TPU-holding process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(
        description="Emit corpus-derived bucket ladders as JSON for "
                    "serve.py/infer.py --bucket_ladders"
    )
    ap.add_argument("--data_dir", required=True,
                    help="corpus root (video dirs with transcripts/media)")
    src = ap.add_mutually_exclusive_group()
    src.add_argument("--run_dir",
                     help="train.py run dir — use ITS saved config's caps "
                          "(the deployment-relevant shapes)")
    src.add_argument("--config_json", help="full Config overlay (JSON)")
    ap.add_argument("--num_seq", type=int, default=None,
                    help="SP seq-axis size to align audio rungs to "
                         "(default: the config's MeshConfig.num_seq)")
    ap.add_argument("--quantiles", default="0.5,0.8,1.0",
                    help="length quantiles, one rung each (default p50/p80/max)")
    ap.add_argument("--out", default=None, metavar="FILE.json",
                    help="write here instead of stdout")
    a = ap.parse_args()

    from mmbidaf_tpu.config import Config, config_from_json
    from mmbidaf_tpu.data.pipeline import VideoCorpus, suggest_buckets

    if a.run_dir:
        from mmbidaf_tpu.train.checkpoint import load_config

        cfg = load_config(a.run_dir)
    elif a.config_json:
        cfg = config_from_json(a.config_json)
    else:
        cfg = Config()
    try:
        quantiles = tuple(float(q) for q in a.quantiles.split(","))
    except ValueError:
        ap.error(f"--quantiles wants comma-separated floats, got {a.quantiles!r}")
    if not all(0.0 < q <= 1.0 for q in quantiles):
        ap.error(f"--quantiles must lie in (0, 1], got {quantiles}")

    # Split corpus roots (train/dev/test subdirs — the layout train.py and
    # precompute_features.py special-case) derive ladders from the TRAINING
    # split; a flat root is swept directly.
    data_dir = a.data_dir
    if os.path.isdir(os.path.join(data_dir, "train")):
        data_dir = os.path.join(data_dir, "train")

    # the length sweep never tokenizes, so no vocab is needed
    corpus = VideoCorpus(data_dir, cfg, {}, use_precomputed=True)
    sug = suggest_buckets(
        corpus,
        num_seq=a.num_seq if a.num_seq is not None else cfg.mesh.num_seq,
        quantiles=quantiles,
    )
    text = json.dumps({k: list(v) for k, v in sug.items()}, indent=1)
    if a.out:
        with open(a.out, "w") as f:
            f.write(text + "\n")
        print(f"wrote {a.out} ({len(corpus)} videos swept)", file=sys.stderr)
    else:
        print(text)


if __name__ == "__main__":
    main()
