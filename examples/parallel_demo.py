"""Parallelism demo: DP × SP × TP end to end on 8 virtual CPU devices.

    python examples/parallel_demo.py [--workdir /tmp/mmbidaf_parallel_demo]

1. builds a small synthetic video corpus,
2. trains a few steps with ALL THREE parallelism flags on one
   ('data','seq','model') mesh — batch sharded over `data`, audio frames
   over `seq` (SP-MFCC → SP-BiLSTM → ring BiDAF), the VGG classifier over
   `model` (fc1 column- / fc2 row-parallel),
3. evaluates through the same 3-axis mesh (infer.py),
4. re-serves the run DP × TP (the parallel layout is a deploy-time choice:
   `Summarizer.from_run(mesh_overrides=…)`), exports the GSPMD-sharded
   AOT artifact, reloads it, and checks the summaries agree.

Every stage is the same code path the real CLIs use — documentation that
runs. No TPU needed: the script re-execs itself onto an 8-device CPU
backend (the same faked-mesh technique the test suite uses).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Re-exec onto a faked 8-device CPU backend BEFORE jax initializes: the
# demo's in-process stages (serving + artifact) need the mesh this process
# was born with.
if os.environ.get("_MMB_PARALLEL_DEMO_CHILD") != "1":
    env = dict(
        os.environ,
        _MMB_PARALLEL_DEMO_CHILD="1",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    os.execvpe(sys.executable, [sys.executable, os.path.abspath(__file__)]
               + sys.argv[1:], env)

sys.path.insert(0, REPO)


def run(cmd: list[str]) -> str:
    print("+", " ".join(cmd))
    res = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True)
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-2000:] + res.stderr[-4000:])
        raise SystemExit(f"step failed: {' '.join(cmd)}")
    return res.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/mmbidaf_parallel_demo")
    ap.add_argument("--steps", type=int, default=10)
    a = ap.parse_args()
    corpus = os.path.join(a.workdir, "corpus")
    rundir = os.path.join(a.workdir, "runs")
    artifact = os.path.join(a.workdir, "artifact")
    py = sys.executable

    # 1. synthetic corpus
    run([py, "examples/make_synthetic_corpus.py", "--out", corpus,
         "--videos", "6", "--sentences", "8", "--frames", "4",
         "--seconds", "1.5"])

    # 2. train on the 3-axis mesh: 8 devices split 2 (data) x 2 (seq) x
    #    2 (model) — DP batch sharding + SP audio tower + TP VGG classifier
    out = run([py, "train.py", "--data_dir", corpus, "--vgg", "tiny",
               "--config_json", "examples/tiny_config.json",
               "--sp_audio", "--num_seq", "2",
               "--tp_vgg", "--num_model", "2",
               "--num_steps", str(a.steps), "--batch_size", "4",
               "--save_dir", rundir])
    print([ln for ln in out.splitlines() if "mesh" in ln][0])

    # 3. evaluate through the same mesh
    out = run([py, "infer.py", "--data_dir", corpus,
               "--load_dir", os.path.join(rundir, "mmbidaf", "ckpts")])
    print("eval:", out.strip().splitlines()[-1])

    # 4. deploy-time re-layout: serve the SAME run DP x TP (no SP — the
    #    serving host chooses its own mesh), freeze the GSPMD-sharded
    #    program as an AOT artifact, reload, compare.
    from mmbidaf_tpu.export import ExportedSummarizer, export_summarizer
    from mmbidaf_tpu.serving import Summarizer

    s = Summarizer.from_run(
        os.path.join(rundir, "mmbidaf"),
        mesh_overrides={"sp_audio": False, "num_seq": 1,
                        "num_data": 4, "num_model": 2, "tp_vgg": True},
        data_parallel=True, serve_batch_size=8,
    )
    videos = sorted(os.path.join(corpus, v) for v in os.listdir(corpus))
    live = s.summarize_batch(videos)
    print("DP x TP serving:", live[0])

    export_summarizer(s, artifact, batch_size=8, frame_hw=(48, 64))
    art = ExportedSummarizer(artifact)
    frozen = [art.summarize(v) for v in videos]
    assert frozen == live, "artifact summaries diverge from live serving"
    print(f"AOT artifact reproduces live serving on {len(videos)} videos")
    print("parallel demo OK")


if __name__ == "__main__":
    main()
