"""Quickstart: the full user journey in one script (CPU-friendly).

    python examples/quickstart.py [--workdir /tmp/mmbidaf_quickstart]

1. builds a small synthetic video corpus (frames + audio + transcripts
   + gold summaries),
2. trains a tiny trimodal model on it for a few hundred steps,
3. evaluates ROUGE against the gold summaries,
4. loads the checkpoint into the serving API and summarizes a video,
   including one long transcript through the windowed decoder.

Every stage is the same code path the real CLIs use (train.py/infer.py/
mmbidaf_tpu.serving) — this is documentation that runs.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd: list[str], **kw) -> str:
    print("+", " ".join(cmd))
    res = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True, **kw)
    if res.returncode != 0:
        sys.stderr.write(res.stderr[-4000:])
        raise SystemExit(f"step failed: {' '.join(cmd)}")
    return res.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mmbidaf_quickstart")
    ap.add_argument("--steps", type=int, default=200)
    a = ap.parse_args()
    corpus = os.path.join(a.workdir, "corpus")
    rundir = os.path.join(a.workdir, "runs")
    py = sys.executable

    # 1. synthetic corpus (8 videos, ragged lengths)
    run([py, "examples/make_synthetic_corpus.py", "--out", corpus,
         "--videos", "8", "--sentences", "12", "--frames", "6",
         "--seconds", "2", "--ragged"])

    # 2. train a tiny trimodal model on it
    out = run([py, "train.py", "--data_dir", corpus, "--vgg", "tiny",
               "--config_json", "examples/tiny_config.json",
               "--num_steps", str(a.steps), "--save_dir", rundir])
    print(out.splitlines()[-2] if out.splitlines() else out)

    # 3. evaluate: decode every video, ROUGE vs the gold summaries
    #    (the frontend variant auto-resolves from the run's saved config)
    out = run([py, "infer.py", "--data_dir", corpus,
               "--load_dir", os.path.join(rundir, "mmbidaf", "ckpts"),
               "--print_summaries"])
    print(out.strip().splitlines()[-1])

    # 4. serving API: one call from the run directory (config + vocab +
    #    checkpoint are all persisted by train.py)
    from mmbidaf_tpu.serving import Summarizer

    s = Summarizer.from_run(os.path.join(rundir, "mmbidaf"))
    video0 = os.path.join(corpus, sorted(os.listdir(corpus))[0])
    print("summarize:", s.summarize(video0))
    print("summarize_long:", s.summarize_long(video0))
    print("quickstart OK")


if __name__ == "__main__":
    main()
