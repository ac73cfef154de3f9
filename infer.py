"""Inference CLI (SURVEY.md §4.3): load checkpoint → greedy decode → summary
text + ROUGE against gold (host-side), batched over the data mesh.

Runs on the synthetic corpus by default; real corpora provide the same
padded raw-batch schema (see mmbidaf_tpu/data/frontend.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

import jax
import jax.numpy as jnp


class _KeyshotMeter:
    """Accumulate keyshot-F1 over videos whose corpus dirs carry the
    benchmark annotations (shared by the batched and --long eval paths)."""

    def __init__(self):
        self.total, self.n = 0.0, 0

    def add(self, video_dir: str, picked_sentences: list[str]) -> None:
        from mmbidaf_tpu.data.benchmarks import keyshot_from_files

        ks = keyshot_from_files(video_dir, picked_sentences)
        if ks is not None:
            self.total += ks
            self.n += 1

    def finalize(self, agg: dict) -> None:
        if self.n:
            agg["keyshot-F1"] = self.total / self.n


def _summarizer_corpus_eval(s, corpus, use_long: bool, print_summaries: bool):
    """Decode every corpus video through a Summarizer-shaped object (live
    ``Summarizer`` or ``ExportedSummarizer``) and print aggregate ROUGE vs
    ``summary.txt`` golds + keyshot-F1 (shared by --long and --artifact)."""
    from mmbidaf_tpu.data.text import sent_tokenize
    from mmbidaf_tpu.train.metrics import rouge_scores

    agg = {"ROUGE-1": 0.0, "ROUGE-2": 0.0, "ROUGE-L": 0.0}
    n_scored = 0
    keyshot = _KeyshotMeter()
    for i, vid in enumerate(corpus.video_ids):
        vdir = os.path.join(corpus.root, vid)
        summary = s.summarize_long(vdir) if use_long else s.summarize(vdir)
        if print_summaries:
            print(f"{vid}: {summary}")
        keyshot.add(vdir, sent_tokenize(summary))
        _, gold = corpus.example_text(i)
        if gold:
            for k, v in rouge_scores(summary, gold).items():
                agg[k] += v
            n_scored += 1
    agg = {k: v / max(n_scored, 1) for k, v in agg.items()}
    keyshot.finalize(agg)
    print({k: round(v, 4) for k, v in agg.items()}, f"({n_scored} videos scored)")


def _dev_split(data_dir: str) -> str:
    """Corpus decode root: dev/ when the corpus is split, else the root."""
    if os.path.isdir(os.path.join(data_dir, "train")):
        dev = os.path.join(data_dir, "dev")
        return dev if os.path.isdir(dev) else os.path.join(data_dir, "train")
    return data_dir


def main():
    ap = argparse.ArgumentParser(description="MMBiDAF-TPU inference")
    ap.add_argument("--load_dir", default=None, help="orbax checkpoint dir (runs/NAME/ckpts)")
    ap.add_argument("--artifact", default=None, metavar="DIR",
                    help="evaluate a frozen AOT artifact "
                         "(tools/export_artifact.py) against --data_dir: "
                         "decode every video through the exported program "
                         "and score ROUGE/keyshot-F1 — acceptance-test the "
                         "artifact you are about to deploy")
    ap.add_argument("--hidden_size", type=int, default=128)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_batches", type=int, default=1)
    ap.add_argument("--seed", type=int, default=224)
    ap.add_argument("--mode", default="greedy", choices=["greedy", "topk", "beam"])
    ap.add_argument("--topk", type=int, default=4,
                    help="top-k sample width / beam width")
    ap.add_argument("--data_dir", default=None,
                    help="real corpus root (per-video dirs); decodes every "
                         "video, prints its summary text, and scores ROUGE "
                         "against summary.txt golds")
    ap.add_argument("--vgg", default=None,
                    choices=["vgg16", "vgg19", "tiny"],
                    help="frontend variant; default: the run config's "
                         "vgg_variant (vgg16 when no config)")
    ap.add_argument("--config_json", default=None, help="full Config overlay")
    ap.add_argument("--print_summaries", action="store_true")
    ap.add_argument("--long", action="store_true",
                    help="windowed decode for transcripts beyond the "
                         "max_sentences bucket (Summarizer.summarize_long); "
                         "requires --data_dir")
    # mesh / parallelism overrides (default: the run config's MeshConfig)
    ap.add_argument("--sp_audio", type=int, choices=[0, 1], default=None,
                    help="1: sequence-parallel audio tower over the 'seq' "
                         "mesh axis (needs --data_dir raw batches); "
                         "0: force the local tower even if the run config "
                         "trained with sp_audio")
    ap.add_argument("--num_seq", type=int, default=None,
                    help="devices on the 'seq' mesh axis (override the run "
                         "config, e.g. when serving hardware differs)")
    ap.add_argument("--tp_vgg", type=int, choices=[0, 1], default=None,
                    help="1: VGG classifier tensor-parallel over the 'model' "
                         "mesh axis (needs --data_dir raw assets and "
                         "--num_model N > 1); 0: force replicated weights "
                         "even if the run config trained with tp_vgg")
    ap.add_argument("--num_model", type=int, default=None,
                    help="devices on the 'model' mesh axis (override the "
                         "run config)")
    ap.add_argument("--bucket_eval", action="store_true",
                    help="trim each eval batch's feature axes to the "
                         "quarter/half/full rung covering its true lengths "
                         "(serving.trim_raw_batch) — short videos skip the "
                         "padded VGG/MFCC compute; picks/ROUGE unchanged. "
                         "One compile per rung tuple actually seen (incl. "
                         "the --long featurize/window programs) — budget "
                         "cold TPU compiles accordingly")
    ap.add_argument("--bucket_ladders", default=None, metavar="FILE.json",
                    help="explicit per-axis ladders for --bucket_eval "
                         "(suggest_buckets JSON) — acceptance-test the "
                         "exact rung set serve.py --bucket_ladders serves")
    ap.add_argument("--jax_cache", default=None, metavar="DIR",
                    help="persistent compilation cache dir (default: repo "
                         ".jax_cache on TPU, off on CPU; '' = off)")
    ap.add_argument("--prefetch", type=int, default=2, metavar="N",
                    help="real-corpus eval pipelining: host decode + H2D "
                         "run N batches ahead in a background thread and "
                         "each batch's picks fetch is deferred under the "
                         "next batch's device compute (0 = serial loop)")
    a = ap.parse_args()
    if a.bucket_eval and not a.data_dir:
        raise SystemExit("--bucket_eval trims real-corpus eval batches: "
                         "pass --data_dir")
    if a.bucket_eval and a.artifact:
        raise SystemExit("--bucket_eval is a live-eval knob; artifact "
                         "shapes are fixed at export (--buckets there)")
    bucket_spec = True
    if a.bucket_ladders:
        if not a.bucket_eval:
            raise SystemExit("--bucket_ladders configures --bucket_eval — "
                             "pass both")
        try:
            with open(a.bucket_ladders) as f:
                bucket_spec = json.load(f)
        except (OSError, ValueError) as e:
            raise SystemExit(f"--bucket_ladders {a.bucket_ladders}: {e}")
        if not isinstance(bucket_spec, dict) or not bucket_spec:
            raise SystemExit(f"--bucket_ladders {a.bucket_ladders}: expected "
                             "a non-empty JSON dict of per-axis rung lists")
        # fail on bad axis names / rungs NOW, not after the multi-minute
        # checkpoint load (serve.py applies the same pre-load check; the
        # config-dependent parts — caps, sp alignment — still check later)
        axes = ("sentences", "words", "keyframes", "audio_frames")
        unknown = sorted(set(bucket_spec) - set(axes))
        if unknown:
            raise SystemExit(f"--bucket_ladders {a.bucket_ladders}: unknown "
                             f"axes {unknown}; expected a subset of "
                             f"{sorted(axes)}")
        for key, ladder in bucket_spec.items():
            rungs = ladder if isinstance(ladder, list) else [ladder]
            if not rungs or any(not isinstance(r, int) or r < 1 for r in rungs):
                raise SystemExit(f"--bucket_ladders {a.bucket_ladders}: "
                                 f"{key!r} needs a list of integers >= 1, "
                                 f"got {ladder!r}")

    from mmbidaf_tpu.utils.cache import enable_cli_cache

    cache_dir = enable_cli_cache(a.jax_cache)
    if cache_dir:
        print(f"compilation cache: {cache_dir}")

    if a.artifact:
        # Frozen-program evaluation: everything about the model (config,
        # vocab, decode mode, parallel layout) lives in the artifact, so
        # flags that would rebuild or re-parameterize it are conflicts.
        if not a.data_dir:
            raise SystemExit("--artifact evaluates against a corpus: pass --data_dir")
        for flag, name in ((a.load_dir, "--load_dir"),
                           (a.mode != "greedy", "--mode"),
                           (a.config_json, "--config_json"),
                           (a.vgg, "--vgg"),
                           (a.sp_audio is not None, "--sp_audio"),
                           (a.num_seq is not None, "--num_seq"),
                           (a.tp_vgg is not None, "--tp_vgg"),
                           (a.num_model is not None, "--num_model")):
            if flag:
                raise SystemExit(
                    f"{name} is fixed inside the artifact — re-export it, or "
                    "evaluate a checkpoint via --load_dir without --artifact"
                )
        from mmbidaf_tpu.data.pipeline import VideoCorpus
        from mmbidaf_tpu.export import ExportedSummarizer

        s = ExportedSummarizer(a.artifact)
        corpus = VideoCorpus(
            _dev_split(a.data_dir), s.cfg, s.word2idx, use_precomputed=False
        )
        print(f"artifact decode_mode={s.decoder.decode_mode} "
              f"batch={s.decoder.batch_size}")
        _summarizer_corpus_eval(s, corpus, a.long, a.print_summaries)
        return

    from mmbidaf_tpu.config import Config, config_from_json
    from mmbidaf_tpu.data.synthetic import batch_stream, random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.parallel import make_mesh, shard_batch, shard_params
    from mmbidaf_tpu.train.loop import init_train_state, make_eval_step
    from mmbidaf_tpu.train.metrics import batch_rouge, rouge_scores, summary_from_picks

    run_config = (
        os.path.join(os.path.dirname(a.load_dir.rstrip("/")), "config.json")
        if a.load_dir else None
    )
    if a.config_json:
        cfg = config_from_json(a.config_json)
    elif run_config and os.path.isfile(run_config):
        # train.py saves the full Config next to the checkpoints — use it so
        # inference reconstructs the exact trained architecture.
        cfg = config_from_json(run_config)
        print(f"loaded config from {run_config}")
    else:
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, hidden_size=a.hidden_size)
        )

    mesh_over = {}
    if a.sp_audio is not None:
        mesh_over["sp_audio"] = bool(a.sp_audio)
    if a.num_seq is not None:
        mesh_over["num_seq"] = a.num_seq
    if a.tp_vgg is not None:
        mesh_over["tp_vgg"] = bool(a.tp_vgg)
    if a.num_model is not None:
        mesh_over["num_model"] = a.num_model
    if mesh_over:
        cfg = dataclasses.replace(cfg, mesh=dataclasses.replace(cfg.mesh, **mesh_over))
    mesh = make_mesh(cfg.mesh)
    sp = cfg.mesh.sp_audio and cfg.model.use_audio
    if sp and not a.data_dir:
        raise SystemExit(
            "--sp_audio needs raw waveform batches: pass --data_dir "
            "(or --sp_audio 0 to force the local tower)"
        )
    if cfg.mesh.tp_vgg:
        if not a.data_dir:
            raise SystemExit(
                "--tp_vgg shards the frontend's VGG classifier: pass "
                "--data_dir (or --tp_vgg 0 to force replicated weights)"
            )
        if not cfg.model.use_images:
            raise SystemExit("--tp_vgg requires the image tower")
        if cfg.mesh.num_model <= 1:
            raise SystemExit(
                "--tp_vgg needs a model axis: pass --num_model N > 1 "
                "(devices split as data x model)"
            )
    np_rng = np.random.default_rng(a.seed)
    corpus = fe_params = vgg_spec = None
    if a.data_dir:
        # Real corpus: rebuild the deterministic training vocabulary so ids
        # match the checkpoint, and featurize raw assets on device.
        from mmbidaf_tpu.data.frontend import frontend_init
        from mmbidaf_tpu.data.pipeline import VideoCorpus
        from mmbidaf_tpu.data.vocab import vocab_from_corpus_dir
        from mmbidaf_tpu.ops.vgg import spec_for_variant

        vgg = a.vgg or cfg.model.vgg_variant
        vgg_spec = spec_for_variant(vgg)
        # Split corpora: vocabulary comes from train/ (matching training);
        # decoding runs over dev/ when present, else the whole root.
        vocab_dir = decode_dir = a.data_dir
        if os.path.isdir(os.path.join(a.data_dir, "train")):
            vocab_dir = os.path.join(a.data_dir, "train")
            dev = os.path.join(a.data_dir, "dev")
            decode_dir = dev if os.path.isdir(dev) else vocab_dir
        w2i = vocab_from_corpus_dir(vocab_dir, max_size=cfg.data.vocab_size)
        # sp_audio needs raw waveforms — skip features.npz shortcuts so the
        # sharded frontend has real audio to featurize
        # tp_vgg (like sp_audio) featurizes raw assets inside the program:
        # skip features.npz shortcuts so the sharded classifier has frames
        corpus = VideoCorpus(
            decode_dir, cfg, w2i, use_precomputed=not (sp or cfg.mesh.tp_vgg)
        )
        fe_params = frontend_init(jax.random.key(a.seed + 2), cfg, vgg_spec=vgg_spec)
        if cfg.mesh.tp_vgg:
            from mmbidaf_tpu.parallel import shard_frontend

            fe_params = shard_frontend(fe_params, mesh, tp_vgg=True)
        wv = random_word_vectors(np_rng, len(w2i), cfg.model.emb_dim)
    else:
        wv = random_word_vectors(np_rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = shard_params(
        mmbidaf_init(jax.random.key(a.seed), cfg, jnp.asarray(wv)), mesh
    )
    state = init_train_state(jax.random.key(a.seed + 1), params, cfg)

    if a.load_dir:
        from mmbidaf_tpu.train import checkpoint as ckpt

        manager = ckpt.make_manager(a.load_dir)
        restored = ckpt.restore_latest(manager, state)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {a.load_dir}")
        state = restored
        print(f"loaded step {int(state.step)}")

    audio_g_fn = None
    if sp:
        from mmbidaf_tpu.parallel.sp_tower import make_sp_audio_tower

        # batch replicated inside the SP stages (inference batches are
        # arbitrary sizes; train.py uses the batch-sharded composition)
        audio_g_fn = make_sp_audio_tower(mesh, cfg, use_batch_axis=False)

    if a.mode == "topk":
        from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

        def eval_step(params, batch, _rng=[jax.random.key(a.seed)]):
            _rng[0], k = jax.random.split(_rng[0])
            _, picks = mmbidaf_decode(
                params, batch, cfg, mode="topk", topk=a.topk, rng=k,
                audio_g_fn=audio_g_fn,
            )
            return {"picks": picks}
    elif a.mode == "beam":
        from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

        def eval_step(params, batch):
            _, picks = mmbidaf_decode(
                params, batch, cfg, mode="beam", topk=a.topk, audio_g_fn=audio_g_fn
            )
            return {"picks": picks}
    else:
        eval_step = make_eval_step(cfg, audio_g_fn=audio_g_fn)

    if a.long:
        if corpus is None:
            raise SystemExit("--long requires --data_dir")
        # Windowed long-video decode: no truncation at max_sentences; each
        # video's windows batch through one static-shape program.
        from mmbidaf_tpu.serving import Summarizer

        s = Summarizer(
            state.ema_params, fe_params, w2i, cfg, vgg_spec,
            mode=a.mode, topk=a.topk, serve_batch_size=a.batch_size,
            serve_buckets=bucket_spec if a.bucket_eval else None,
        )
        _summarizer_corpus_eval(s, corpus, use_long=True,
                                print_summaries=a.print_summaries)
        return

    if corpus is not None:
        # Real-corpus decode: every video once, sequential order; picks map
        # back to the on-disk transcript sentences (SURVEY §4.3).
        from mmbidaf_tpu.data.frontend import apply_frontend
        from mmbidaf_tpu.data.pipeline import collate

        # fe_params is a jit ARGUMENT, not a closure constant: closure
        # constants are baked per compiled program, and --bucket_eval
        # compiles one program per rung tuple — a closed-over VGG frontend
        # (~0.5 GB) would be duplicated in HBM and re-shipped over the
        # relay per rung (CLAUDE.md: don't bake large jit constants)
        featurize = jax.jit(lambda fe, r: apply_frontend(
            fe, r, cfg, vgg_spec, sp_audio=audio_g_fn is not None
        ))
        agg = {"ROUGE-1": 0.0, "ROUGE-2": 0.0, "ROUGE-L": 0.0}
        n_scored = 0
        keyshot = _KeyshotMeter()

        # Pipelined eval (mirrors train.py --prefetch): host asset decode +
        # H2D upload run ahead in a thread, and each batch's picks fetch —
        # seconds through a tunnelled backend — is deferred until the NEXT
        # batch's device work has been dispatched, so the device never
        # idles behind host-side ROUGE/summary assembly.
        def host_batches():
            for start in range(0, len(corpus), a.batch_size):
                idxs = [min(start + j, len(corpus) - 1) for j in range(a.batch_size)]
                n_real = min(a.batch_size, len(corpus) - start)  # tail wraps for static shape
                yield idxs, n_real, collate([corpus[i] for i in idxs])

        ladders = None
        if a.bucket_eval:
            # the serving-side bucket trim (semantics-preserving: masks
            # carry true lengths); eval programs compile once per rung
            # tuple actually seen
            from mmbidaf_tpu.serving import serving_bucket_ladders, trim_raw_batch

            ladders = serving_bucket_ladders(cfg, bucket_spec)

        def upload(item):
            b = item[2]
            if ladders is not None:
                b = trim_raw_batch(b, cfg, ladders)
            return {k: jnp.asarray(v) for k, v in b.items()}

        prefetcher = None
        if a.prefetch > 0:
            from mmbidaf_tpu.data.prefetch import DevicePrefetcher

            prefetcher = DevicePrefetcher(host_batches(), upload, depth=a.prefetch)
            items = iter(prefetcher)
        else:
            items = ((it, upload(it)) for it in host_batches())

        def consume(entry):
            nonlocal n_scored
            out, idxs, n_real = entry
            picks = np.asarray(out["picks"])[:n_real]
            texts = [corpus.example_text(i) for i in idxs[:n_real]]
            scores, n_b = batch_rouge(picks, [t[0] for t in texts], [t[1] for t in texts])
            for k in agg:
                agg[k] += scores[k] * n_b
            n_scored += n_b
            for j in range(n_real):
                vid = corpus.video_ids[idxs[j]]
                sents = texts[j][0]
                chosen = [sents[p] for p in picks[j] if 0 <= p < len(sents)]
                keyshot.add(os.path.join(corpus.root, vid), chosen)
                if a.print_summaries:
                    print(f"{vid}: {summary_from_picks(picks[j], sents)}")

        from collections import deque

        pending = deque()
        try:
            for (idxs, n_real, _nb), raw in items:
                feat = featurize(fe_params, raw)
                # eval_step's teacher-forced loss needs targets; corpora without
                # summary.txt golds still decode (zero targets, unused picks path)
                K = cfg.model.max_decode_steps
                feat["targets"] = raw.get("targets", jnp.zeros((a.batch_size, K), jnp.int32))
                feat["target_mask"] = raw.get("target_mask", jnp.ones((a.batch_size, K), jnp.float32))
                batch = shard_batch(feat, mesh)
                pending.append((eval_step(state.ema_params, batch), idxs, n_real))
                if len(pending) > 1:
                    consume(pending.popleft())
            while pending:
                consume(pending.popleft())
        finally:
            if prefetcher is not None:
                prefetcher.close()
        agg = {k: v / max(n_scored, 1) for k, v in agg.items()}
        keyshot.finalize(agg)
        print({k: round(v, 4) for k, v in agg.items()}, f"({n_scored} videos scored)")
        return

    stream = batch_stream(a.seed, cfg, a.batch_size)

    # Synthetic "sentences" for summary assembly.
    sentences = [f"This is transcript sentence {i}." for i in range(cfg.data.max_sentences)]

    agg = {"ROUGE-1": 0.0, "ROUGE-2": 0.0, "ROUGE-L": 0.0}
    n = 0
    for _ in range(a.num_batches):
        batch_np = next(stream)
        batch = shard_batch(batch_np, mesh)  # numpy in: shard-only upload
        out = eval_step(state.ema_params, batch)
        picks = np.asarray(out["picks"])
        for b in range(picks.shape[0]):
            summary = summary_from_picks(picks[b], sentences)
            gold = " ".join(sentences[i] for i in batch_np["targets"][b])
            for k, v in rouge_scores(summary, gold).items():
                agg[k] += v
            n += 1
    for k in agg:
        agg[k] /= max(n, 1)
    print({k: round(v, 4) for k, v in agg.items()})


if __name__ == "__main__":
    main()
