"""Training CLI (SURVEY.md §4.2): ``python train.py --flags``.

The reference's eager loop becomes: jitted donated train_step over a
data-parallel mesh; the Python loop feeds batches, logs JSONL scalars, runs
periodic EMA eval, and drives orbax best-k checkpointing with auto-resume.
Trains on the synthetic corpus by default (corpus-agnostic data layer; real
corpora plug in via the same padded-batch schema).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal
import time

import numpy as np

import jax
import jax.numpy as jnp

# Preemption handling (SURVEY.md §6 "Failure detection": the reference
# restarts by hand from the last checkpoint; we save ON the way down).
# SIGTERM/SIGINT set a flag; the train loop checkpoints and exits cleanly,
# and the next run auto-resumes from that step.
_PREEMPTED = {"sig": None}


def _request_stop(signum, frame):
    _PREEMPTED["sig"] = signum


def parse_args():
    ap = argparse.ArgumentParser(description="Train MMBiDAF-TPU")
    # model
    ap.add_argument("--hidden_size", type=int, default=128)
    ap.add_argument("--num_rnn_layers", type=int, default=1,
                    help="stacked BiLSTM depth for the encoder towers "
                         "(the reference RNNEncoder's num_layers)")
    ap.add_argument("--drop_prob", type=float, default=0.2)
    ap.add_argument("--max_decode_steps", type=int, default=4)
    ap.add_argument("--no_images", action="store_true")
    ap.add_argument("--no_audio", action="store_true")
    # train
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--num_steps", type=int, default=None,
                    help="total train steps; default: num_epochs epochs over "
                         "the corpus (--data_dir), else 1000")
    ap.add_argument("--num_epochs", type=int, default=None,
                    help="with --data_dir and no --num_steps: train this many "
                         "epochs (default TrainConfig.num_epochs)")
    ap.add_argument("--prefetch", type=int, default=0, metavar="N",
                    help="device-prefetch depth: a background thread overlaps "
                         "host collate + H2D upload with the device step "
                         "(0 = off, the measured default: the async dispatch "
                         "queue already overlaps host work with device "
                         "compute, and on the tunnelled TPU backend the "
                         "thread's H2D contends with step dispatch — "
                         "measured 0.80x at depth 1 / 0.59x at depth 2, "
                         "experiments/prefetch_ab.py)")
    ap.add_argument("--loader_workers", type=int, default=0,
                    help="grain DataLoader worker processes for --data_dir "
                         "(0 = decode in-process)")
    ap.add_argument("--max_eval_videos", type=int, default=256,
                    help="cap on dev videos kept featurized for eval")
    ap.add_argument("--buckets", default=None,
                    help="comma-separated T_sent buckets (e.g. 16,32,64) for "
                         "--data_dir: batches are padded to the smallest "
                         "fitting bucket instead of max_sentences; also "
                         "enables W/T_img/T_aud per-batch bucketing "
                         "(quarter/half/full ladders unless overridden). "
                         "'auto' derives all four ladders from the corpus's "
                         "length quantiles (p50/p80/max)")
    ap.add_argument("--word_buckets", default=None,
                    help="W (words/sentence) buckets, e.g. 8,16,32; 'off' "
                         "keeps the axis static (needs --buckets)")
    ap.add_argument("--img_buckets", default=None,
                    help="T_img (keyframe) buckets; 'off' = static")
    ap.add_argument("--aud_buckets", default=None,
                    help="T_aud (MFCC frame) buckets; 'off' = static. With "
                         "--sp_audio pass multiples of --num_seq")
    ap.add_argument("--lr", type=float, default=0.5)
    ap.add_argument("--optimizer", default="adadelta", choices=["adadelta", "adam"])
    ap.add_argument("--max_grad_norm", type=float, default=5.0)
    ap.add_argument("--grad_accum_steps", type=int, default=1,
                    help=">1: microbatch gradient accumulation inside the "
                         "jitted step (exact full-batch gradient semantics)")
    ap.add_argument("--remat_towers", action="store_true",
                    help="rematerialize the encoder towers in backprop "
                         "(jax.checkpoint): exact grads, trades FLOPs for "
                         "HBM so bigger batches / longer buckets fit")
    ap.add_argument("--ema_decay", type=float, default=0.999)
    ap.add_argument("--l2_wd", type=float, default=0.0)
    ap.add_argument("--eval_steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=224)
    ap.add_argument("--save_dir", default="./runs")
    ap.add_argument("--load_path", default=None,
                    help="warm-start params/EMA from another run's ckpts dir "
                         "(fresh optimizer/step — the reference's --load_path "
                         "fine-tune flag); same-run auto-resume wins if the "
                         "save_dir already has checkpoints")
    ap.add_argument("--name", default="mmbidaf")
    ap.add_argument("--max_checkpoints", type=int, default=5)
    ap.add_argument("--metric_name", default="loss")
    # data
    ap.add_argument("--max_sentences", type=int, default=32)
    ap.add_argument("--max_words", type=int, default=16)
    ap.add_argument("--data_dir", default=None,
                    help="root of per-video asset dirs (frames/ audio.wav "
                         "transcript.txt summary.txt); default: synthetic corpus")
    ap.add_argument("--glove_path", default=None, help="GloVe .txt for real corpora")
    ap.add_argument("--vgg", default="vgg16",
                    choices=["vgg16", "vgg19", "tiny"],
                    help="frontend conv spec (tiny = fast CPU demos)")
    # mesh / parallelism (SURVEY §3.3)
    ap.add_argument("--num_seq", type=int, default=1,
                    help="devices on the 'seq' mesh axis (audio-tower "
                         "sequence parallelism); batch shards over the rest")
    ap.add_argument("--sp_audio", action="store_true",
                    help="route the audio tower through the sequence-parallel "
                         "chain (SP-MFCC -> SP-BiLSTM -> ring BiDAF) over the "
                         "seq axis; needs --data_dir raw batches")
    ap.add_argument("--num_model", type=int, default=1,
                    help="devices on the 'model' mesh axis (VGG-classifier "
                         "tensor parallelism); batch shards over the rest")
    ap.add_argument("--tp_vgg", action="store_true",
                    help="shard the VGG classifier tensor-parallel over the "
                         "model axis (fc1 column- / fc2 row-parallel); needs "
                         "--data_dir raw batches and --num_model N > 1")
    ap.add_argument("--config_json", default=None, help="full Config overlay")
    ap.add_argument("--jax_cache", default=None, metavar="DIR",
                    help="persistent compilation cache dir (default: repo "
                         ".jax_cache on TPU, off on CPU; '' = off)")
    a = ap.parse_args()
    defaults = {act.dest: act.default for act in ap._actions}
    return a, defaults


_MODEL_KEYS = ("hidden_size", "num_rnn_layers", "drop_prob", "max_decode_steps")
_DATA_KEYS = ("max_sentences", "max_words")
_MESH_KEYS = ("num_seq", "sp_audio", "num_model", "tp_vgg")
_TRAIN_KEYS = (
    "batch_size", "lr", "optimizer", "max_grad_norm", "grad_accum_steps",
    "remat_towers", "ema_decay", "l2_wd",
    "eval_steps", "seed", "save_dir", "load_path", "name", "max_checkpoints",
    "metric_name",
)


def build_config(a, defaults):
    from mmbidaf_tpu.config import Config, config_from_json

    if a.config_json:
        # JSON is the base; CLI flags set to non-default values override it
        # (so e.g. `--config_json tiny.json --save_dir /tmp/x` does not
        # silently write into the JSON's save_dir).
        def over(keys):
            return {k: getattr(a, k) for k in keys if getattr(a, k) != defaults.get(k)}

        cfg = config_from_json(a.config_json)
        m = over(_MODEL_KEYS)
        if a.no_images:
            m["use_images"] = False
        if a.no_audio:
            m["use_audio"] = False
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, **m),
            data=dataclasses.replace(cfg.data, **over(_DATA_KEYS)),
            train=dataclasses.replace(cfg.train, **over(_TRAIN_KEYS)),
            mesh=dataclasses.replace(cfg.mesh, **over(_MESH_KEYS)),
        )
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            hidden_size=a.hidden_size,
            num_rnn_layers=a.num_rnn_layers,
            drop_prob=a.drop_prob,
            max_decode_steps=a.max_decode_steps,
            use_images=not a.no_images,
            use_audio=not a.no_audio,
        ),
        data=dataclasses.replace(
            cfg.data, max_sentences=a.max_sentences, max_words=a.max_words
        ),
        mesh=dataclasses.replace(
            cfg.mesh, num_seq=a.num_seq, sp_audio=a.sp_audio,
            num_model=a.num_model, tp_vgg=a.tp_vgg,
        ),
        train=dataclasses.replace(
            cfg.train,
            batch_size=a.batch_size,
            lr=a.lr,
            optimizer=a.optimizer,
            max_grad_norm=a.max_grad_norm,
            grad_accum_steps=a.grad_accum_steps,
            remat_towers=a.remat_towers,
            ema_decay=a.ema_decay,
            l2_wd=a.l2_wd,
            eval_steps=a.eval_steps,
            seed=a.seed,
            save_dir=a.save_dir,
            load_path=a.load_path,
            name=a.name,
            max_checkpoints=a.max_checkpoints,
            metric_name=a.metric_name,
        ),
    )
    return cfg


def main():
    a, defaults = parse_args()
    cfg = build_config(a, defaults)

    # Multi-host bring-up (SURVEY §3.3: a config change, not a rewrite):
    # when the coordinator env vars are set, every host runs THIS SAME
    # loop SPMD-style — the mesh spans all hosts' devices, each host
    # regenerates the same global batch from the shared seed and uploads
    # only its own shards (parallel.mesh._put_global), gradients reduce
    # over ICI/DCN exactly as single-host. Host 0 alone writes logs,
    # vocab and loader state; orbax checkpointing is collective.
    from mmbidaf_tpu.parallel import initialize_distributed

    distributed = initialize_distributed()  # must precede first backend use
    proc0 = jax.process_index() == 0
    say = print if proc0 else (lambda *args, **kw: None)

    from mmbidaf_tpu.utils.cache import enable_cli_cache

    cache_dir = enable_cli_cache(a.jax_cache)
    if cache_dir:
        say(f"compilation cache: {cache_dir}")

    from mmbidaf_tpu.data.synthetic import batch_stream, random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.parallel import make_mesh, shard_batch, shard_params
    from mmbidaf_tpu.train import checkpoint as ckpt
    from mmbidaf_tpu.train.loop import (
        init_train_state,
        make_eval_step,
        make_lr_schedule,
        make_train_step,
    )
    from mmbidaf_tpu.train.metrics import (
        AverageMeter,
        JsonlLogger,
        TensorboardWriter,
        batch_rouge,
    )

    run_dir = os.path.join(cfg.train.save_dir, cfg.train.name)
    os.makedirs(run_dir, exist_ok=True)
    if proc0:
        logger = JsonlLogger(os.path.join(run_dir, "log.jsonl"))
        tb = TensorboardWriter(os.path.join(run_dir, "tb"))
    else:  # non-primary hosts compute; host 0 records
        class _NullSink:
            def log(self, *args, **kw): pass
            def close(self): pass
        logger = tb = _NullSink()

    # Flag validation BEFORE mesh construction: a wrong device count would
    # otherwise surface as a mesh-shape error instead of the actionable fix.
    if cfg.mesh.sp_audio:
        # Sequence-parallel audio tower (SURVEY §3.3 SP row): frame axis
        # sharded over the 'seq' mesh axis, never gathered.
        if not a.data_dir:
            raise SystemExit(
                "--sp_audio needs raw waveform batches: pass --data_dir "
                "(the synthetic stream carries precomputed audio features)"
            )
        if not cfg.model.use_audio:
            raise SystemExit("--sp_audio requires the audio tower (drop --no_audio)")
        if cfg.mesh.num_seq <= 1:
            # without a 'seq' axis the tower would silently shard frames
            # over the DATA axis with the batch replicated inside it —
            # data parallelism lost with no visible signal
            raise SystemExit(
                "--sp_audio needs a sequence axis: pass --num_seq N > 1 "
                "(devices split as data x seq)"
            )
    if cfg.mesh.tp_vgg:
        # Tensor-parallel VGG classifier (SURVEY §3.3 TP row): the frozen
        # frontend's fc weights shard over the 'model' axis. Only meaningful
        # when the frontend runs inside the train step (raw batches).
        if not a.data_dir:
            raise SystemExit(
                "--tp_vgg shards the frontend's VGG classifier: pass "
                "--data_dir (the synthetic stream carries precomputed "
                "image features, no VGG in the step)"
            )
        if not cfg.model.use_images:
            raise SystemExit("--tp_vgg requires the image tower (drop --no_images)")
        if cfg.mesh.num_model <= 1:
            raise SystemExit(
                "--tp_vgg needs a model axis: pass --num_model N > 1 "
                "(devices split as data x model)"
            )

    mesh = make_mesh(cfg.mesh)
    say(f"devices: {jax.device_count()} ({jax.default_backend()})"
        + (f" across {jax.process_count()} hosts" if distributed else "")
        + f", mesh: {mesh}")

    audio_g_fn = None
    # multi-host local decode: the global batch rows THIS host's devices
    # own (None single-process = decode everything). Drives the bucketed
    # train stream and the eval featurization assembly below.
    from mmbidaf_tpu.parallel import local_batch_rows

    local_rows = local_batch_rows(mesh, cfg.train.batch_size)
    if cfg.mesh.sp_audio:
        from mmbidaf_tpu.parallel.sp_tower import make_sp_audio_tower

        audio_g_fn = make_sp_audio_tower(mesh, cfg)

    np_rng = np.random.default_rng(cfg.train.seed)
    fe_params = None
    if a.data_dir:
        # Real corpus: vocab from transcripts (+ optional GloVe), raw batches,
        # device-side frontend inside the train step.
        from mmbidaf_tpu.data.frontend import frontend_init
        from mmbidaf_tpu.data.pipeline import VideoCorpus, batched_iterator, collate
        from mmbidaf_tpu.data.vocab import load_glove, vocab_from_corpus_dir

        # train/dev split: if the corpus root has train/ and dev/ subdirs
        # (reference convention), train on train/ and eval on dev/; flat
        # corpora train and eval on the same directory.
        train_dir = a.data_dir
        dev_dir = a.data_dir
        if os.path.isdir(os.path.join(a.data_dir, "train")):
            train_dir = os.path.join(a.data_dir, "train")
            dev_dir = (
                os.path.join(a.data_dir, "dev")
                if os.path.isdir(os.path.join(a.data_dir, "dev"))
                else train_dir
            )
        w2i = vocab_from_corpus_dir(train_dir, max_size=cfg.data.vocab_size)
        if a.glove_path:
            wv = load_glove(a.glove_path, w2i, cfg.model.emb_dim)
        else:
            wv = random_word_vectors(np_rng, len(w2i), cfg.model.emb_dim)
        from mmbidaf_tpu.ops.vgg import spec_for_variant

        vgg_spec = spec_for_variant(a.vgg)
        # persist the frontend variant + vocab with the run so serving can
        # reconstruct everything from run_dir alone (Summarizer.from_run)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, vgg_variant=a.vgg)
        )
        from mmbidaf_tpu.data.vocab import save_vocab

        if proc0:  # identical on every host; one writer avoids races
            save_vocab(w2i, np.asarray(wv),
                       os.path.join(run_dir, "vocab.json"),
                       os.path.join(run_dir, "emb.npz"))
        # sp_audio needs raw waveforms: skip features.npz shortcuts so the
        # sharded frontend has real audio to featurize
        use_pre = not cfg.mesh.sp_audio
        corpus = VideoCorpus(
            train_dir, cfg, w2i, require_summary=True, use_precomputed=use_pre
        )
        eval_corpus = (
            corpus if dev_dir == train_dir
            else VideoCorpus(
                dev_dir, cfg, w2i, require_summary=True, use_precomputed=use_pre
            )
        )
        def parse_buckets(s):
            if s is None:
                return None  # auto quarter/half/full ladder
            if s.lower() in ("off", "none"):
                return ()    # keep the axis static
            return tuple(int(b) for b in s.split(","))

        # '--buckets off' == omitting --buckets (the sibling axis flags
        # document 'off'; the primary axis accepts it too instead of
        # surfacing bucketed_iterator's 'need at least one bucket')
        auto_axis = {}
        if a.buckets and a.buckets.lower() == "auto":
            # data-derived ladders: one bucket per length quantile
            # (p50/p80/max) from the corpus's header-only length sweep;
            # per-axis flags still override
            from mmbidaf_tpu.data.pipeline import suggest_buckets

            sug = suggest_buckets(corpus, num_seq=cfg.mesh.num_seq)
            say("auto buckets: " + ", ".join(f"{k}={list(v)}" for k, v in sug.items()))
            buckets = sug["sentences"]
            auto_axis = {"word": sug["words"], "img": sug["keyframes"],
                         "aud": sug["audio_frames"]}
        else:
            buckets = parse_buckets(a.buckets)
        if buckets:
            # Bucketed shapes on all four ragged axes (SURVEY §8 R3): jit
            # compiles one program per shape tuple; ragged corpora stop
            # paying worst-case padding (T_aud's static 512-frame bucket
            # was the costliest).
            from mmbidaf_tpu.data.pipeline import bucketed_iterator

            def axis(flag, key):
                return parse_buckets(flag) if flag is not None else auto_axis.get(key)

            # multi-host: decode only the rows this host's devices own —
            # host IO scales 1/H instead of every host decoding everything
            # (bucket choices stay global: metadata sweep, same on all hosts)
            stream_factory = lambda skip=0: bucketed_iterator(  # noqa: E731
                corpus, cfg.train.batch_size, buckets, cfg.train.seed, skip=skip,
                word_buckets=axis(a.word_buckets, "word"),
                img_buckets=axis(a.img_buckets, "img"),
                aud_buckets=axis(a.aud_buckets, "aud"),
                decode_rows=local_rows,
                # sp_audio shards the frame axis num_seq-ways: every audio
                # bucket rounds up to a multiple so no batch can hit the SP
                # divisibility check mid-epoch
                seq_align=cfg.mesh.num_seq if cfg.mesh.sp_audio else 1,
            )
        elif a.loader_workers > 0:
            # grain DataLoader: PNG/WAV decode in worker subprocesses
            # (reference DataLoader num_workers equivalent, SURVEY §4.2).
            from mmbidaf_tpu.data.pipeline import make_grain_loader

            if distributed:
                say("note: the grain loader decodes the full global batch "
                    "on every host; --buckets decodes only this host's "
                    "rows (1/H host IO)")

            def stream_factory(skip=0):
                it = iter(make_grain_loader(
                    corpus, cfg.train.batch_size, cfg.train.seed,
                    worker_count=a.loader_workers, num_epochs=None,
                ))
                if not skip:
                    return it
                # exact resume via grain's iterator checkpointing: the
                # loop snapshots get_state() next to every model save
                state_path = os.path.join(run_dir, "loader_state.bin")
                step_path = state_path + ".step"
                if os.path.exists(state_path) and os.path.exists(step_path):
                    with open(step_path) as f:
                        saved_step = int(f.read().strip() or 0)
                    if saved_step == skip:
                        with open(state_path, "rb") as f:
                            raw_state = f.read()
                        try:
                            it.set_state(raw_state)
                            say(f"grain loader state restored at step {skip}")
                            return it
                        except Exception as e:
                            # worker topology changed between runs: translate
                            # the snapshot (no records skipped; a few tail
                            # records repeat) instead of restarting the order
                            from mmbidaf_tpu.data.pipeline import (
                                translate_grain_state,
                            )

                            try:
                                new_state, repeats = translate_grain_state(
                                    raw_state, a.loader_workers,
                                    cfg.train.batch_size,
                                )
                                it.set_state(new_state)
                                say(
                                    "grain loader state translated to "
                                    f"worker_count={a.loader_workers} "
                                    f"({repeats} already-seen records will "
                                    "repeat this epoch; none skipped)"
                                )
                                return it
                            except Exception as e2:
                                say(f"grain loader state unusable "
                                      f"({e}; translation: {e2}); "
                                      "data order restarts")
                                return it
                say("grain loader: no matching saved loader state — "
                      "data order restarts on resume")
                return it
        else:
            stream_factory = lambda skip=0: batched_iterator(  # noqa: E731
                corpus, cfg.train.batch_size, cfg.train.seed, skip=skip
            )
        # Place the frozen frontend over the mesh (replicated; under
        # --tp_vgg the VGG classifier shards over the 'model' axis): as a
        # jit closure constant it must live on the same device set as the
        # params, or jit rejects the mixed placement.
        from mmbidaf_tpu.parallel import shard_frontend

        fe_params = shard_frontend(
            frontend_init(jax.random.key(cfg.train.seed + 2), cfg, vgg_spec=vgg_spec),
            mesh,
            tp_vgg=cfg.mesh.tp_vgg,
        )
    else:
        wv = random_word_vectors(np_rng, cfg.data.vocab_size, cfg.model.emb_dim)
    # Init LOCALLY (seed-deterministic, so identical on every host), then
    # place the WHOLE train state over the mesh once (step/rng/opt scalars
    # included): a restored checkpoint re-places onto these shardings, jit
    # rejects mixed committed placements otherwise — and eager optax/EMA
    # init on already-global arrays is not portable across processes.
    params = mmbidaf_init(jax.random.key(cfg.train.seed), cfg, jnp.asarray(wv))
    state = shard_params(
        init_train_state(jax.random.key(cfg.train.seed + 1), params, cfg), mesh
    )
    del params  # lives on in state.params, globally placed

    if proc0:
        ckpt.save_config(run_dir, cfg)
    maximize = (
        cfg.train.maximize_metric
        if cfg.train.maximize_metric is not None
        else cfg.train.metric_name not in ("loss",)
    )
    manager = ckpt.make_manager(
        os.path.join(run_dir, "ckpts"),
        cfg.train.max_checkpoints,
        cfg.train.metric_name,
        maximize=maximize,
    )
    restored = ckpt.restore_latest(manager, state)
    if restored is not None:
        state = restored
        say(f"resumed from step {int(state.step)}")
    elif cfg.train.load_path:
        # Warm start (the reference's --load_path): params + EMA from
        # another run's checkpoints, fresh optimizer/step in THIS run.
        src = ckpt.make_manager(cfg.train.load_path)
        warm = ckpt.restore_latest(src, state)
        if warm is None:
            raise SystemExit(f"no checkpoint found in {cfg.train.load_path}")
        state = dataclasses.replace(
            state, params=warm.params, ema_params=warm.ema_params
        )
        say(f"warm-started params from {cfg.train.load_path} "
              f"(source step {int(warm.step)})")

    from mmbidaf_tpu.parallel.mesh import data_shard_count

    train_step = make_train_step(
        cfg, fe_params=fe_params,
        vgg_spec=None if fe_params is None else vgg_spec,
        audio_g_fn=audio_g_fn,
        data_shards=data_shard_count(mesh),
    )
    from mmbidaf_tpu.parallel import replicated_sharding

    eval_step = make_eval_step(
        cfg, audio_g_fn=audio_g_fn,
        # multi-host: picks must be fetchable on every host (a batch-sharded
        # output is only addressable where its shards live)
        out_sharding=replicated_sharding(mesh) if distributed else None,
    )
    meter = AverageMeter()

    resumed_steps = int(state.step)
    if a.data_dir:
        from mmbidaf_tpu.data.frontend import apply_frontend

        # deterministic data-order resume: the stream fast-forwards to
        # exactly where the preempted run stopped (index-only skipping)
        stream = stream_factory(skip=resumed_steps)
        if resumed_steps:
            say(f"data stream fast-forwarded {resumed_steps} batches")
        # FULL dev-set eval (reference §4.3: evaluate() iterates the dev
        # loader): featurize every dev video ONCE up front (VGG is the
        # expensive stage — ~100 MB of features per 256 videos, cheap to
        # keep resident), batched at the static train batch shape with
        # wrap-padded tails; picks map back to the real on-disk transcript
        # sentences. --max_eval_videos caps the resident features.
        featurize = jax.jit(lambda r: apply_frontend(
            fe_params, r, cfg, vgg_spec, sp_audio=audio_g_fn is not None
        ))
        bs = cfg.train.batch_size
        n_eval = min(len(eval_corpus), a.max_eval_videos)
        eval_batches = []  # (sharded feat batch, texts for the real rows)
        from mmbidaf_tpu.data.pipeline import decode_examples

        for start in range(0, n_eval, bs):
            idxs = [min(start + j, len(eval_corpus) - 1) for j in range(bs)]
            n_real = min(bs, n_eval - start)
            # multi-host: each host decodes+featurizes only its own rows
            # (zero placeholders elsewhere; shard_batch never uploads them)
            raw_eval = {
                k: jnp.asarray(v)
                for k, v in collate(
                    decode_examples(lambda i: eval_corpus[i], idxs, local_rows)
                ).items()
            }
            feat = featurize(raw_eval)
            feat["targets"] = raw_eval["targets"]
            feat["target_mask"] = raw_eval["target_mask"]
            texts = [eval_corpus.example_text(i) for i in idxs[:n_real]]
            eval_batches.append((shard_batch(feat, mesh), texts, None))
    else:
        stream = batch_stream(cfg.train.seed, cfg)
        nb0 = next(stream)
        eval_batches = [(
            shard_batch(nb0, mesh),
            None,
            # host copy: the sharded device batch is not fully addressable
            # on any single host in multi-process runs
            np.asarray(nb0["targets"]),
        )]
        for _ in range(resumed_steps):  # cheap numpy fast-forward
            next(stream)
        if resumed_steps:
            say(f"data stream fast-forwarded {resumed_steps} batches")

    # Device prefetch (after all pre-loop stream consumption): a background
    # thread overlaps the NEXT batch's host collate + H2D upload with the
    # CURRENT device step. Loader-state snapshots stay exact — the wrapper
    # reports the position of the last DELIVERED batch (data/prefetch.py).
    prefetcher = None
    if a.prefetch > 0:
        from mmbidaf_tpu.data.prefetch import DevicePrefetcher

        prefetcher = DevicePrefetcher(
            stream,
            lambda nb: shard_batch(nb, mesh),  # numpy in: shard-only upload
            depth=a.prefetch,
        )
        stream = prefetcher

    if a.num_steps is not None:
        num_steps = a.num_steps
    elif a.data_dir:
        # Epoch-based budget (the reference trains --num_epochs epochs).
        epochs = a.num_epochs or cfg.train.num_epochs
        steps_per_epoch = max(1, len(corpus) // cfg.train.batch_size)
        num_steps = epochs * steps_per_epoch
        say(f"training {epochs} epochs x {steps_per_epoch} steps/epoch = {num_steps} steps")
    else:
        num_steps = 1000

    signal.signal(signal.SIGTERM, _request_stop)
    signal.signal(signal.SIGINT, _request_stop)

    try:
        from tqdm import trange
        step_iter = trange(num_steps, desc="train", unit="step",
                           disable=not os.isatty(1))
    except ImportError:  # tqdm is a nicety, not a dependency
        step_iter = range(num_steps)

    def save_loader_state():
        # grain iterators checkpoint their own position; snapshot it next
        # to every model save so resume restores the exact data order.
        # (DevicePrefetcher forwards the inner grain state as of the last
        # DELIVERED batch — not the prefetched-ahead position — and
        # returns None for stateless iterators.)
        if not proc0:
            return  # every host sees the same stream; one writer
        st = stream.get_state() if hasattr(stream, "get_state") else None
        if st is not None:
            path = os.path.join(run_dir, "loader_state.bin")
            with open(path, "wb") as f:
                f.write(st)
            with open(path + ".step", "w") as f:
                f.write(str(int(state.step)))

    # per-axis padding waste actually paid each step (bucketed shapes
    # shrink these — SURVEY §8 R3); word_mask waste is measured within
    # real sentences so it isolates the W axis from T_sent padding
    pad_axes = {"sent": "sent_mask", "img": "img_mask", "aud": "aud_mask"}
    pad_meters = {k: AverageMeter() for k in (*pad_axes, "word")}
    # multi-host local-decode mode zero-fills non-local rows: measure pad
    # waste over this host's decoded rows only (a uniform sample of the
    # bucket, so host 0's logged value stays representative)
    pad_rows = local_rows

    def update_pad_meters(nb):
        def rows(key):
            v = np.asarray(nb[key])
            return v if pad_rows is None else v[pad_rows]

        for name, key in pad_axes.items():
            if key in nb:
                pad_meters[name].update(1.0 - float(rows(key).mean()))
        if "word_mask" in nb:
            wm = rows("word_mask")
            sm = rows("sent_mask")[:, :, None]
            denom = max(float(sm.sum()) * wm.shape[2], 1.0)
            pad_meters["word"].update(1.0 - float((wm * sm).sum()) / denom)

    pad_meter = pad_meters["sent"]  # headline scalar keeps its name

    # Windowed on-device metric accumulation: fetching metrics every step
    # would SYNC host and device each iteration (fetches cost seconds
    # through the relay — CLAUDE.md), serializing the loop as
    # host_time + device_time. Instead a tiny jitted accumulator folds
    # (loss_sum, n, last grad_norm) into one [3] device array per step and
    # the host fetches it ONCE per 50-step log window — that fetch is also
    # the loop's only throttle on how far dispatch runs ahead (50 in-flight
    # steps max; PJRT's own inflight-computation cap bounds it below that).
    @jax.jit
    def _metric_acc(acc, m):
        return jnp.stack(
            [acc[0] + m["loss"], acc[1] + 1.0, m["grad_norm"]]
        )

    if distributed:
        from jax.experimental import multihost_utils

        def preempt_requested(sync: bool) -> bool:
            # A signal lands per-PROCESS; acting on it unilaterally would
            # desync the collectives (unsignaled hosts keep stepping into
            # the next psum while this one enters the collective save —
            # deadlock). Resolve with a global OR, but only at window/eval
            # boundaries (sync=True): a per-step collective would
            # serialize the dispatch pipeline. Worst case a signal waits
            # out the remainder of one 50-step window before the save.
            if not sync:
                return False
            local = _PREEMPTED["sig"] is not None
            return bool(multihost_utils.process_allgather(np.asarray(local)).any())
    else:
        def preempt_requested(sync: bool) -> bool:
            del sync  # no collectives to desync: act immediately
            return _PREEMPTED["sig"] is not None

    def preempt_msg() -> str:
        sig = _PREEMPTED["sig"]
        return f"signal {sig}" if sig is not None else "signal on another host"

    acc = jnp.zeros((3,))
    step = resumed_steps  # host-side counter: int(state.step) is a device fetch
    last_saved_step = resumed_steps  # a resumed state IS on disk already
    t_window = time.monotonic()
    steps_in_window = 0
    for i in step_iter:
        if preempt_requested(step % 50 == 0 or step % cfg.train.eval_steps == 0):
            ckpt.save_unranked(manager, state)
            save_loader_state()
            logger.close()
            if prefetcher is not None:
                prefetcher.close()
            say(f"preempted ({preempt_msg()}): saved step "
                  f"{int(state.step)}; rerun with the same --save_dir to resume")
            return
        item = next(stream)
        if prefetcher is not None:
            nb, batch = item  # H2D already done in the prefetch thread
        else:
            nb = item
            # numpy goes straight in: a jnp.asarray here would upload the
            # FULL global batch to device 0 first (then multi-host
            # _put_global would fetch it back) — shard_batch slices host
            # memory and uploads only this process's shards once
            batch = shard_batch(nb, mesh)
        update_pad_meters(nb)
        state, metrics = train_step(state, batch)
        acc = _metric_acc(acc, metrics)
        step = resumed_steps + i + 1
        steps_in_window += 1
        if step % 50 == 0:
            # this fetch blocks until every step in the window has
            # EXECUTED, so the window wall time is honest device
            # throughput (first window includes compile)
            loss_sum, n, grad_norm = (float(x) for x in np.asarray(acc))
            now = time.monotonic()
            steps_per_s = steps_in_window / max(now - t_window, 1e-9)
            t_window, steps_in_window = now, 0
            meter.update(loss_sum / max(n, 1.0), max(int(n), 1))
            acc = jnp.zeros((3,))
            scalars = {
                "loss": meter.avg,
                "grad_norm": grad_norm,
                "lr": float(make_lr_schedule(cfg)(step)),
                "steps_per_s": steps_per_s,
                "pad_frac": pad_meter.avg,
                **{f"pad_frac_{k}": m.avg for k, m in pad_meters.items()
                   if k != "sent" and m.count},
            }
            logger.log(step, scalars)
            tb.log(step, scalars)
            say(f"step {step}: loss {meter.avg:.4f} pad_frac {pad_meter.avg:.3f}")
            meter.reset()
            for m in pad_meters.values():
                m.reset()
        if step % cfg.train.eval_steps == 0:
            # Full dev-set eval: EMA decode over every eval batch, ROUGE
            # from the REAL on-disk transcript sentences vs summary.txt
            # golds (SURVEY §4.3: indices → sentences → summary → ROUGE).
            loss_sum = 0.0
            r_sum = {"ROUGE-1": 0.0, "ROUGE-2": 0.0, "ROUGE-L": 0.0}
            n_scored = 0
            # dispatch every eval batch before fetching any result: the
            # per-batch loss/picks fetches (seconds through a tunnelled
            # backend) then overlap the remaining batches' device compute
            # instead of serializing the eval pass (outputs are tiny:
            # a scalar loss + [B, K] picks per batch)
            evs = [eval_step(state.ema_params, eval_batch)
                   for eval_batch, *_ in eval_batches]
            for ev, (eval_batch, texts, host_targets) in zip(evs, eval_batches):
                loss_sum += float(ev["loss"])
                picks = np.asarray(ev["picks"])
                if texts is not None:
                    scores, n_b = batch_rouge(
                        picks, [t[0] for t in texts], [t[1] for t in texts]
                    )
                else:
                    # synthetic corpus has no text: ROUGE over placeholder
                    # sentence strings = a pick-vs-target overlap proxy,
                    # scored over the FULL batch (host-side ROUGE on these
                    # short strings is cheap).
                    sentences = [f"transcript sentence {i}."
                                 for i in range(cfg.data.max_sentences)]
                    targets_np = host_targets
                    n_b = picks.shape[0]
                    golds = [" ".join(sentences[i] for i in targets_np[b])
                             for b in range(n_b)]
                    scores, n_b = batch_rouge(picks[:n_b], [sentences] * n_b, golds)
                for k in r_sum:
                    r_sum[k] += scores[k] * n_b
                n_scored += n_b
            ev_loss = loss_sum / max(len(eval_batches), 1)
            r_sum = {k: v / max(n_scored, 1) for k, v in r_sum.items()}
            scalars = {"eval_loss": ev_loss, **{k: v for k, v in r_sum.items()}}
            logger.log(step, scalars)
            tb.log(step, scalars)
            say(f"step {step}: eval_loss {ev_loss:.4f} ROUGE-L {r_sum['ROUGE-L']:.3f}")
            ckpt.save(manager, state, {"loss": ev_loss, **r_sum})
            save_loader_state()
            last_saved_step = step

    if prefetcher is not None:
        prefetcher.close()
    # globally agreed (multi-host: all hosts reach here at the same step,
    # and must take the SAME branch — the collective save deadlocks if one
    # host saves while a step==last_saved_step host skips it)
    if preempt_requested(True):
        # signal landed during the final step: still leave a resume point
        ckpt.save_unranked(manager, state)
        save_loader_state()
        say(f"preempted ({preempt_msg()}): saved step {int(state.step)}")
    elif step != last_saved_step:
        # the run ended between eval boundaries: without this, a completed
        # run whose last eval wasn't its last step loses the trailing steps
        # (and a short --num_steps run saves NOTHING — Summarizer.from_run
        # would find an empty ckpts/). Unranked: best-k retention by the
        # eval metric must not be displaced by an unscored final state.
        ckpt.save_unranked(manager, state)
        save_loader_state()
        say(f"saved final state at step {step}")
    logger.close()
    say("done")


if __name__ == "__main__":
    main()
