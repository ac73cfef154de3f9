"""SRT/VTT subtitle parsing + corpus import (data/subtitles.py,
tools/import_corpus.py)."""

import os
import subprocess
import sys

import numpy as np

from mmbidaf_tpu.data.subtitles import parse_cues, subtitles_to_transcript

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SRT = """1
00:00:01,000 --> 00:00:04,000
Welcome to the lecture on attention.

2
00:00:04,500 --> 00:00:07,250
<i>Today we cover</i> bidirectional flow.

3
00:00:08,000 --> 00:00:09,000
PROFESSOR: Questions are welcome.
"""

VTT = """WEBVTT

NOTE this block is metadata and must be skipped

00:00:01.000 --> 00:00:04.000
Welcome to the lecture on attention.

cue-2
00:00:04.500 --> 00:00:07.250
Today we cover bidirectional flow.

00:00:07.500 --> 00:00:08.000
Today we cover bidirectional flow.
"""


def test_parse_srt():
    cues = parse_cues(SRT)
    assert len(cues) == 3
    assert cues[0] == (1.0, 4.0, "Welcome to the lecture on attention.")
    assert cues[1][2] == "Today we cover bidirectional flow."  # tags stripped
    assert cues[2][2] == "Questions are welcome."              # speaker stripped


def test_parse_vtt_and_duplicate_collapse():
    cues = parse_cues(VTT)
    assert len(cues) == 3
    assert cues[0][0] == 1.0
    text = subtitles_to_transcript(VTT)
    # rolling auto-caption duplicate collapsed
    assert text == ("Welcome to the lecture on attention. "
                    "Today we cover bidirectional flow.")


def test_import_corpus_cli(tmp_path):
    """import_corpus.py --no_media builds a trainable text-only layout from
    srt/vtt/txt sidecars and .summary.txt golds."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "lec01.srt").write_text(SRT)
    (src / "lec01.summary.txt").write_text("Welcome to the lecture on attention.")
    (src / "lec02.vtt").write_text(VTT)
    (src / "lec03.txt").write_text("A plain text transcript. It has two sentences.")

    out = tmp_path / "corpus"
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    res = subprocess.run(
        [sys.executable, "tools/import_corpus.py", "--src", str(src),
         "--out", str(out), "--no_media"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "imported 3/3" in res.stdout

    t1 = (out / "lec01" / "transcript.txt").read_text()
    assert "Questions are welcome." in t1 and "<i>" not in t1
    assert (out / "lec01" / "summary.txt").exists()
    assert not (out / "lec02" / "summary.txt").exists()

    # the imported layout feeds the real data pipeline
    from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir

    w2i = vocab_from_corpus_dir(str(out))
    assert "attention" in w2i and "bidirectional" in w2i

    # media-less layout loads (zero frames fully masked, silent audio) and
    # trains text-only end-to-end
    res = subprocess.run(
        [sys.executable, "train.py", "--data_dir", str(out), "--vgg", "tiny",
         "--config_json", "examples/tiny_config.json", "--num_steps", "3",
         "--no_images", "--no_audio", "--save_dir", str(tmp_path / "run")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "done" in res.stdout
