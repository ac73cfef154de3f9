"""CLI smoke tests: train.py / infer.py / bench.py --quick run end-to-end as
subprocesses on the CPU backend (tiny flags).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the TPU untouched
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    res = subprocess.run(
        [
            sys.executable, "train.py",
            "--hidden_size", "12", "--batch_size", "4", "--num_steps", "4",
            "--max_sentences", "6", "--max_words", "5", "--eval_steps", "2",
            "--optimizer", "adam", "--lr", "1e-3", "--drop_prob", "0.0",
            "--save_dir", str(tmp_path),
        ],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "done" in res.stdout
    assert "loss" in res.stdout
    # checkpoints + logs were written
    run_dir = tmp_path / "mmbidaf"
    assert (run_dir / "log.jsonl").exists()
    assert any((run_dir / "ckpts").iterdir())


@pytest.mark.slow
def test_infer_cli_smoke():
    res = subprocess.run(
        [sys.executable, "infer.py", "--hidden_size", "12", "--batch_size", "2"],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "ROUGE-L" in res.stdout


@pytest.mark.slow
def test_bench_cli_quick_cpu():
    res = subprocess.run(
        [sys.executable, "bench.py", "--quick", "--iters", "3",
         "--baseline-videos", "1"],
        cwd=REPO, env=_cpu_env(), capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = res.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "videos_per_sec_per_chip"
    assert rec["value"] > 0 and rec["vs_baseline"] is not None
