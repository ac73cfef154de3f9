"""TVSum/SumMe benchmark adapters (data/benchmarks.py,
tools/import_benchmark.py): annotation parsing, frame→cue importance
alignment, budgeted gold-summary selection, and the end-to-end import
into a VideoCorpus-loadable layout."""

import os
import subprocess
import sys

import numpy as np
import pytest

from mmbidaf_tpu.data import benchmarks
from mmbidaf_tpu.data.subtitles import parse_cues

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- parsers

def test_tvsum_anno_tsv(tmp_path):
    """Rows per annotator are averaged; ragged rows truncate to shortest."""
    p = tmp_path / "anno.tsv"
    p.write_text(
        "vidA\tVT\t1,1,5,5\n"
        "vidA\tVT\t3,3,3,3,3\n"          # one frame longer — known artifact
        "vidB\tGA\t2,2\n"
    )
    scores = benchmarks.load_tvsum_anno_tsv(str(p))
    assert set(scores) == {"vidA", "vidB"}
    np.testing.assert_allclose(scores["vidA"], [2.0, 2.0, 4.0, 4.0])
    np.testing.assert_allclose(scores["vidB"], [2.0, 2.0])


def test_tvsum_anno_tsv_malformed(tmp_path):
    p = tmp_path / "bad.tsv"
    p.write_text("vidA\tonly-two-fields\n")
    with pytest.raises(ValueError):
        benchmarks.load_tvsum_anno_tsv(str(p))


def test_tvsum_mat_hdf5(tmp_path):
    """Synthetic v7.3-layout .mat: object-reference arrays under /tvsum50."""
    h5py = pytest.importorskip("h5py")
    p = tmp_path / "tvsum.mat"
    # [nframes, n_users]; frames axis longer, as in the real data
    anno = {"vidA": np.arange(1.0, 7.0)[:, None] * np.ones((1, 2)),
            "vidB": np.full((5, 2), 4.0)}
    with h5py.File(p, "w") as f:
        g = f.create_group("tvsum50")
        refs_v, refs_a = [], []
        for vid, arr in anno.items():
            dv = f.create_dataset(
                f"/refs/{vid}_name", data=np.array([[ord(c)] for c in vid], np.uint16)
            )
            # store [n_users, nframes] (transposed) for vidA to exercise the
            # orientation fix-up; [nframes, n_users] for vidB
            data = arr.T if vid == "vidA" else arr
            da = f.create_dataset(f"/refs/{vid}_anno", data=data)
            refs_v.append(dv.ref)
            refs_a.append(da.ref)
        dv = g.create_dataset("video", (len(refs_v), 1), dtype=h5py.ref_dtype)
        da = g.create_dataset("user_anno", (len(refs_a), 1), dtype=h5py.ref_dtype)
        for i, (rv, ra) in enumerate(zip(refs_v, refs_a)):
            dv[i, 0] = rv
            da[i, 0] = ra
    scores = benchmarks.load_tvsum_mat(str(p))
    assert set(scores) == {"vidA", "vidB"}
    np.testing.assert_allclose(scores["vidA"], np.arange(1.0, 7.0))
    np.testing.assert_allclose(scores["vidB"], np.full(5, 4.0))


def test_summe_gt_mat(tmp_path):
    pytest.importorskip("scipy.io")
    from scipy.io import savemat

    p1 = tmp_path / "Cooking.mat"
    savemat(p1, {"gt_score": np.array([[0.1], [0.9], [0.5]]), "FPS": 25.0})
    s, fps = benchmarks.load_summe_gt(str(p1))
    np.testing.assert_allclose(s, [0.1, 0.9, 0.5])
    assert fps == 25.0

    # fallback: mean of binary user_score, default fps
    p2 = tmp_path / "Jumps.mat"
    savemat(p2, {"user_score": np.array([[1, 0], [1, 1], [0, 0]], np.float64)})
    s, fps = benchmarks.load_summe_gt(str(p2))
    np.testing.assert_allclose(s, [0.5, 1.0, 0.0])
    assert fps == 30.0

    p3 = tmp_path / "Empty.mat"
    savemat(p3, {"unrelated": np.zeros(2)})
    with pytest.raises(ValueError):
        benchmarks.load_summe_gt(str(p3))


# ------------------------------------------------------------- alignment

CUES = [
    (0.0, 2.0, "Low importance opening."),
    (2.0, 4.0, "The key highlight moment."),
    (4.0, 6.0, "Another dull stretch."),
    (100.0, 102.0, "Overrun caption past the video end."),
]


def test_cue_importance_means_and_overrun():
    fps = 2.0  # 12 annotated frames cover 6 s
    scores = np.array([1, 1, 1, 1, 5, 5, 5, 5, 1, 1, 1, 1], np.float32)
    imp = benchmarks.cue_importance(CUES, scores, fps)
    np.testing.assert_allclose(imp[:3], [1.0, 5.0, 1.0])
    # the overrun cue gets the global mean: neither wins nor loses
    np.testing.assert_allclose(imp[3], scores.mean())


def test_select_summary_cues_budget():
    scores = np.array([1.0, 5.0, 1.0, 2.3], np.float32)
    # total dur 8 s; 15% budget = 1.2 s < any single cue → exactly the top cue
    picked = benchmarks.select_summary_cues(CUES, scores, budget_frac=0.15)
    assert picked == [1]
    # 60% budget = 4.8 s → top two cues, returned in time order
    picked = benchmarks.select_summary_cues(CUES, scores, budget_frac=0.60)
    assert picked == [1, 3]
    assert benchmarks.select_summary_cues([], np.zeros(0), 0.15) == []


def test_summary_from_importance_text():
    fps = 2.0
    scores = np.array([1, 1, 1, 1, 5, 5, 5, 5, 1, 1, 1, 1], np.float32)
    summary = benchmarks.summary_from_importance(CUES, scores, fps, 0.15)
    assert summary == "The key highlight moment."


# ------------------------------------------------------- end-to-end CLI

VTT = """WEBVTT

00:00:00.000 --> 00:00:02.000
Low importance opening remarks here.

00:00:02.000 --> 00:00:04.000
The key highlight moment everyone watches.

00:00:04.000 --> 00:00:06.000
Another dull stretch of filler content.
"""


def test_import_benchmark_cli_tvsum(tmp_path):
    """tsv + vtt sidecar → VideoCorpus-loadable dirs with gold summaries
    built from the high-importance cues."""
    subs = tmp_path / "subs"
    subs.mkdir()
    (subs / "vidA.vtt").write_text(VTT)
    # 12 frames over the 6 s subtitle span → derived fps = 2.0
    anno = tmp_path / "anno.tsv"
    anno.write_text("vidA\tVT\t" + ",".join("1 1 1 1 5 5 5 5 1 1 1 1".split()) + "\n")
    out = tmp_path / "corpus"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "import_benchmark.py"),
         "--dataset", "tvsum", "--anno", str(anno), "--subs", str(subs),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    assert "imported 1/1" in r.stdout

    vdir = out / "vidA"
    transcript = (vdir / "transcript.txt").read_text()
    summary = (vdir / "summary.txt").read_text()
    assert "key highlight moment" in summary
    assert "dull stretch" not in summary
    assert "Low importance opening" in transcript
    np.testing.assert_allclose(np.load(vdir / "importance.npy")[4:8], 5.0)
    # cue spans persisted for keyshot-F1 eval
    import json
    meta = json.loads((vdir / "cues.json").read_text())
    assert meta["fps"] == pytest.approx(2.0) and len(meta["cues"]) == 3

    # the emitted layout loads as a (media-less) training corpus
    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data import text, vocab
    from mmbidaf_tpu.data.pipeline import VideoCorpus

    cfg = tiny_test_config()
    toks = [text.word_tokenize(s) for s in text.sent_tokenize(transcript)]
    w2i = vocab.build_vocab(toks)
    corpus = VideoCorpus(str(out), cfg, w2i, require_summary=True)
    ex = corpus[0]
    assert "targets" in ex
    # the gold label points at the highlight sentence (index 1 of 3)
    sents, gold = corpus.example_text(0)
    assert "key highlight" in sents[int(ex["targets"][0])]


def test_import_benchmark_cli_summe(tmp_path):
    pytest.importorskip("scipy.io")
    from scipy.io import savemat

    subs = tmp_path / "subs"
    gt = tmp_path / "GT"
    subs.mkdir()
    gt.mkdir()
    (subs / "Cooking.vtt").write_text(VTT)
    savemat(gt / "Cooking.mat",
            {"gt_score": np.r_[np.ones(4), 5 * np.ones(4), np.ones(4)][:, None],
             "FPS": 2.0})
    out = tmp_path / "corpus"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "import_benchmark.py"),
         "--dataset", "summe", "--gt_dir", str(gt), "--subs", str(subs),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    summary = (out / "Cooking" / "summary.txt").read_text()
    assert "key highlight moment" in summary


# ---------------------------------------------------------- keyshot metric

def test_sentence_spans_maps_through_cues():
    cues = [
        (0.0, 2.0, "Hello there everyone."),
        (2.0, 4.0, "Today we study"),
        (4.0, 6.0, "attention mechanisms."),   # sentence spans two cues
        (6.0, 8.0, "Goodbye."),
    ]
    sentences = ["Hello there everyone.", "Today we study attention mechanisms.",
                 "Goodbye."]
    spans = benchmarks.sentence_spans(sentences, cues)
    assert spans[0] == (0.0, 2.0)
    assert spans[1] == (2.0, 6.0)   # merged across its two source cues
    assert spans[2] == (6.0, 8.0)
    # unlocatable sentence gets an EMPTY span: neutral in keyshot_f1 (a
    # whole-video span would cover every frame and poison the metric)
    spans = benchmarks.sentence_spans(["Never said this."], cues)
    assert spans == [(0.0, 0.0)]


def test_keyshot_f1():
    # 20 frames @ 2 fps; top-15% (3 frames) are frames 8..10
    scores = np.ones(20, np.float32)
    scores[8:11] = 5.0
    fps = 2.0
    # prediction covering exactly seconds 4..5.5 → frames 8..10: perfect
    assert benchmarks.keyshot_f1([(4.0, 5.5)], scores, fps) == 1.0
    # disjoint prediction → 0
    assert benchmarks.keyshot_f1([(0.0, 1.0)], scores, fps) == 0.0
    # half-overlapping prediction → between
    f1 = benchmarks.keyshot_f1([(4.0, 7.0)], scores, fps)
    assert 0.0 < f1 < 1.0
    assert benchmarks.keyshot_f1([], np.zeros(0), fps) == 0.0


def test_keyshot_from_files(tmp_path):
    vdir = tmp_path / "vid"
    vdir.mkdir()
    scores = np.ones(12, np.float32)
    scores[4:8] = 5.0
    np.save(vdir / "importance.npy", scores)
    import json
    cues = [[0.0, 2.0, "Low importance opening."],
            [2.0, 4.0, "The key highlight moment."],
            [4.0, 6.0, "Another dull stretch."]]
    (vdir / "cues.json").write_text(json.dumps({"fps": 2.0, "cues": cues}))
    # picking the highlight sentence covers exactly the top frames
    f1 = benchmarks.keyshot_from_files(str(vdir), ["The key highlight moment."],
                                       budget_frac=4 / 12)
    assert f1 == 1.0
    # annotations absent → None
    assert benchmarks.keyshot_from_files(str(tmp_path), ["x"]) is None


@pytest.mark.slow
def test_benchmark_corpus_trains_and_evals(tmp_path):
    """Full benchmark workflow: import (tsv + vtt) → train.py on the
    emitted corpus → infer.py reports ROUGE + keyshot-F1."""
    subs = tmp_path / "subs"
    subs.mkdir()
    for vid in ("vidA", "vidB"):
        (subs / f"{vid}.vtt").write_text(VTT)
    anno = tmp_path / "anno.tsv"
    anno.write_text(
        "vidA\tVT\t" + ",".join("1 1 1 1 5 5 5 5 1 1 1 1".split()) + "\n"
        "vidB\tGA\t" + ",".join("4 4 4 4 1 1 1 1 2 2 2 2".split()) + "\n"
    )
    out = tmp_path / "corpus"
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "import_benchmark.py"),
         "--dataset", "tvsum", "--anno", str(anno), "--subs", str(subs),
         "--out", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "train.py", "--data_dir", str(out), "--vgg", "tiny",
         "--config_json", "examples/tiny_config.json", "--num_steps", "6",
         "--eval_steps", "5", "--save_dir", str(tmp_path / "run")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run(
        [sys.executable, "infer.py", "--data_dir", str(out),
         "--load_dir", str(tmp_path / "run" / "mmbidaf" / "ckpts"),
         "--batch_size", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "keyshot-F1" in r.stdout and "ROUGE-L" in r.stdout
