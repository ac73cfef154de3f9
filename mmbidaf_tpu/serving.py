"""User-facing serving API: video assets in, summary text out.

The reference's user story is "train, then point the eval script at a video
and get its extractive summary". This wraps that as a library object:

    s = Summarizer.from_checkpoint(ckpt_dir, vocab_path, emb_path, cfg)
    s = Summarizer.init_random(cfg, seed=0)              # or untrained
    summaries = s.summarize_batch([video_dir1, video_dir2])
    summary   = s.summarize(video_dir)

Everything device-side runs as ONE jitted program (frontend + model +
pointer decode); host work is container decode + summary assembly.
"""

from __future__ import annotations

import os
import queue as _queue_mod
import threading
import time
from concurrent.futures import Future
from typing import Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.data.frontend import frontend_init, make_end_to_end_decode
from mmbidaf_tpu.data.text import encode_sentences, encode_transcript, sent_tokenize
from mmbidaf_tpu.data.video import load_video_assets
from mmbidaf_tpu.data.vocab import load_vocab
from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
from mmbidaf_tpu.ops.vgg import VGG16_SPEC
from mmbidaf_tpu.train.metrics import summary_from_picks


class ServerOverloadedError(RuntimeError):
    """Raised by ``DynamicBatcher.submit`` when the pending-request queue
    exceeds ``max_queue`` — callers should shed load (HTTP 503) instead of
    letting an unbounded backlog grow host memory and tail latency."""


def transcript_windows(n_sents: int, window: int, stride: int) -> list[int]:
    """Window start indices covering ``n_sents`` sentences: strided starts
    plus a tail window so the last sentences are never dropped."""
    if n_sents <= window:
        return [0]
    starts = list(range(0, n_sents - window, stride))
    starts.append(n_sents - window)
    return starts


def merge_window_picks(
    picks: np.ndarray,
    scores: np.ndarray,
    starts: Sequence[int],
    window_lens: Sequence[int],
    k: int,
) -> list[int]:
    """Merge per-window pointer picks into one global selection.

    ``picks [W, K]`` are window-local sentence indices with per-pick
    ``scores [W, K]`` (log-probs). Window-local indices map to global via
    their window's start; picks landing on padded slots (≥ the window's
    real length) are dropped; duplicates (overlapping windows select the
    same sentence) keep their best score; the top ``k`` survivors are
    returned in transcript order — the extractive-summary convention.
    """
    best: dict[int, float] = {}
    for w, start in enumerate(starts):
        for j in range(picks.shape[1]):
            local = int(picks[w, j])
            if local >= window_lens[w]:
                continue
            g = start + local
            s = float(scores[w, j])
            if g not in best or s > best[g]:
                best[g] = s
    top = sorted(best, key=lambda g: -best[g])[:k]
    return sorted(top)


def picks_scores(log_p: np.ndarray, picks: np.ndarray) -> np.ndarray:
    """Per-pick merge scores ``[B, K]`` from a decode's ``log_p``.

    Greedy/top-k return per-step log-probs ``[B, K, T_s]`` → gather each
    pick's own log-prob. Beam returns the best beam's TOTAL sequence
    log-prob ``[B]`` → broadcast it per pick (it ranks whole windows, a
    valid merge key). Shared by live and artifact windowed serving.
    """
    if log_p.ndim == 1:
        return np.broadcast_to(log_p[:, None], picks.shape)
    return np.take_along_axis(log_p, picks[:, :, None], axis=2)[:, :, 0]


def num_audio_samples(cfg: Config) -> int:
    """Waveform samples needed to fill the ``max_audio_frames`` bucket."""
    d = cfg.data
    return d.max_audio_frames * d.hop_length + d.win_length


def serving_bucket_ladders(cfg: Config, buckets=True) -> dict[str, tuple[int, ...]]:
    """Resolve ``Summarizer(serve_buckets=…)`` into per-axis bucket ladders.

    ``buckets=True`` → the quarter/half/full default ladders
    (``data.pipeline.default_axis_buckets``) on all four ragged axes;
    a dict gives explicit ladders per axis (the ``data.pipeline.
    suggest_buckets`` output plugs in directly — derive ladders from the
    training corpus, serve with them). The config cap is ALWAYS appended
    to every ladder: a request longer than the top rung pads up to the
    cap, it is never cut (serving must stay semantics-preserving, unlike
    a training ladder where capping is a data decision).

    Under ``MeshConfig.sp_audio`` audio rungs round UP to ``num_seq``
    multiples — the SP chain shards the frame axis ``num_seq``-ways
    (same rule as ``bucketed_iterator(seq_align=…)``).
    """
    from mmbidaf_tpu.data.pipeline import default_axis_buckets

    d = cfg.data
    caps = {
        "sentences": d.max_sentences,
        "words": d.max_words,
        "keyframes": d.max_keyframes,
        "audio_frames": d.max_audio_frames,
    }
    if buckets is True:
        given = {}
    elif isinstance(buckets, dict) and buckets:
        given = dict(buckets)
    else:
        # a tuple/list probably meant a ladder, an empty dict probably meant
        # suggest_buckets returned nothing — both must fail loudly, not
        # silently serve default ladders (or silently disable bucketing)
        raise ValueError(
            f"serve_buckets must be True (default ladders) or a non-empty"
            f" dict of per-axis ladders (suggest_buckets output); got"
            f" {buckets!r}"
        )
    unknown = sorted(set(given) - set(caps))
    if unknown:
        raise ValueError(
            f"unknown serve_buckets axes {unknown}: expected a subset of "
            f"{sorted(caps)}"
        )
    out = {}
    for key, cap in caps.items():
        ladder = given.get(key)
        ladder = default_axis_buckets(cap) if ladder is None else ladder
        rungs = {int(b) for b in ladder}
        if any(b < 1 for b in rungs):
            raise ValueError(f"serve_buckets[{key!r}] has rungs < 1: {sorted(rungs)}")
        out[key] = tuple(sorted({min(b, cap) for b in rungs} | {cap}))
    if cfg.mesh.sp_audio and cfg.mesh.num_seq > 1:
        ns, cap = cfg.mesh.num_seq, caps["audio_frames"]
        if cap % ns:
            raise ValueError(
                f"max_audio_frames {cap} must be a multiple of "
                f"MeshConfig.num_seq {ns} to bucket the audio axis under "
                "sp_audio"
            )
        out["audio_frames"] = tuple(
            sorted({min(-(-b // ns) * ns, cap) for b in out["audio_frames"]})
        )
    return out


def bucket_ladder_levels(ladders: Mapping[str, tuple]) -> list[dict[str, int]]:
    """Diagonal rung levels of a ladder set: per-axis rungs zipped at the
    same level index (shorter ladders clamp to their top), full-cap level
    excluded. Used for bounded pre-warming (``Summarizer.warmup``) and for
    the per-level programs of bucketed AOT artifacts — the 3⁴ per-axis rung
    combinations collapse to ≤ len(ladder) predictable shapes."""
    n_levels = max(len(v) for v in ladders.values())
    caps = {k: v[-1] for k, v in ladders.items()}
    levels, seen = [], set()
    for i in range(n_levels):
        rung = {k: v[min(i, len(v) - 1)] for k, v in ladders.items()}
        key = tuple(sorted(rung.items()))
        if rung == caps or key in seen:
            continue
        seen.add(key)
        levels.append(rung)
    return levels


def covering_level(levels: Sequence[Mapping[str, int]], needs: Mapping[str, int]) -> int:
    """Index of the smallest diagonal rung level covering ``needs``
    (``levels`` sorted smallest-first), or -1 for the full-cap shapes.
    A level missing one of the needed axes (e.g. a hand-edited artifact
    manifest) never covers — the request falls to the full-cap program
    instead of raising."""
    for i, rungs in enumerate(levels):
        if all(rungs.get(k, 0) >= v for k, v in needs.items()):
            return i
    return -1


def batch_true_lengths(raw: Mapping[str, np.ndarray]) -> dict[str, int]:
    """True per-axis lengths of a stacked batch OR one unstacked row, from
    its prefix masks (each mask's LAST axis is the counted one; minimum 1
    per present axis — an empty transcript still needs a slot)."""
    out = {}
    if "sent_mask" in raw:
        out["sentences"] = max(int(raw["sent_mask"].sum(axis=-1).max()), 1)
        out["words"] = max(int(raw["word_mask"].sum(axis=-1).max()), 1)
    if "img_mask" in raw:
        out["keyframes"] = max(int(raw["img_mask"].sum(axis=-1).max()), 1)
    if "aud_mask" in raw:
        out["audio_frames"] = max(int(raw["aud_mask"].sum(axis=-1).max()), 1)
    return out


def record_bucket_stat(stats: dict, lock, raw: Mapping[str, np.ndarray]) -> None:
    """Record one device batch's rung tuple (T_s, W, T_img, T_aud) — the
    shared observability contract behind ``bucket_stats``/``/healthz`` for
    live AND artifact serving (every counted axis is its mask's last)."""
    key = tuple(
        raw[k].shape[-1]
        for k in ("sent_mask", "word_mask", "img_mask", "aud_mask")
        if k in raw
    )
    with lock:
        stats[key] = stats.get(key, 0) + 1


def trim_raw_to_rungs(
    raw: dict[str, np.ndarray],
    cfg: Config,
    rungs: Mapping[str, int],
    batched: bool = True,
) -> dict[str, np.ndarray]:
    """Slice a batch's (or, with ``batched=False``, one row's) feature axes
    to explicit rung sizes.

    The caller guarantees every rung covers the batch's true lengths
    (``batch_true_lengths``); trimming is then semantics-preserving — masks
    carry true lengths, so the model never attended over what is cut.
    Handles raw batches (``waveform`` + ``frames``) and featurized ones
    (``audio``/``images`` — the ``summarize_long`` window path); axes whose
    keys are absent (disabled towers) pass through. Row-level trimming lets
    ``_stack_rows`` allocate only the trimmed batch instead of a cap-padded
    stack it immediately slices away.
    """
    d = cfg.data
    pre = (slice(None),) if batched else ()
    out = dict(raw)
    if "sent_mask" in raw:
        bs, bw = rungs["sentences"], rungs["words"]
        out["text_ids"] = raw["text_ids"][pre + (slice(bs), slice(bw))]
        out["word_mask"] = raw["word_mask"][pre + (slice(bs), slice(bw))]
        out["sent_mask"] = raw["sent_mask"][pre + (slice(bs),)]
    if "img_mask" in raw:
        bi = rungs["keyframes"]
        for k in ("frames", "images"):
            if k in raw:
                out[k] = raw[k][pre + (slice(bi),)]
        out["img_mask"] = raw["img_mask"][pre + (slice(bi),)]
    if "aud_mask" in raw:
        ba = rungs["audio_frames"]
        if "waveform" in raw:
            # ba frames need exactly this many samples — the same static
            # samples = frames*hop + win relation the frontend assumes
            # (frame count follows aud_mask's axis, data/frontend.py)
            n = ba * d.hop_length + d.win_length
            out["waveform"] = raw["waveform"][pre + (slice(n),)]
        if "audio" in raw:
            out["audio"] = raw["audio"][pre + (slice(ba),)]
        out["aud_mask"] = raw["aud_mask"][pre + (slice(ba),)]
    return out


def trim_raw_batch(
    raw: dict[str, np.ndarray], cfg: Config, ladders: dict[str, tuple[int, ...]]
) -> dict[str, np.ndarray]:
    """Trim a stacked serving batch to the smallest ladder rungs covering
    its TRUE lengths — the serving-side counterpart of
    ``bucketed_iterator``'s per-batch trim (SURVEY §8 risk R3). Each axis
    picks its rung independently; see ``trim_raw_to_rungs`` for the
    semantics argument.
    """
    from mmbidaf_tpu.data.pipeline import bucket_for

    true = batch_true_lengths(raw)
    rungs = {k: bucket_for(v, ladders[k]) for k, v in true.items()}
    # absent axes (disabled towers) need placeholder rungs for the shared
    # slicer; trim_raw_to_rungs skips them by key anyway
    for k in ("sentences", "words", "keyframes", "audio_frames"):
        rungs.setdefault(k, 0)
    return trim_raw_to_rungs(raw, cfg, rungs)


def host_raw_row(
    video_dir: str, word2idx: dict[str, int], cfg: Config
) -> tuple[dict, list[str]]:
    """Host-decode ONE video's assets into an (unstacked) raw feature row.

    Pure host work (container decode + tokenize + mask build) with no model
    or device dependency — shared by ``Summarizer`` and the AOT-exported
    serving path (``mmbidaf_tpu.export``). Returns ``(row, sentences)``
    where ``row`` holds the seven raw arrays ``make_end_to_end_decode``
    consumes and ``sentences`` the transcript sentences for pick assembly.
    """
    from mmbidaf_tpu.data.video import audio_frames_valid

    d = cfg.data
    assets = load_video_assets(
        video_dir, d.max_keyframes, num_audio_samples(cfg),
        keyframe_policy=d.keyframe_policy, sample_rate=d.sample_rate,
    )
    enc = encode_transcript(
        assets["transcript"], word2idx, d.max_sentences, d.max_words
    )
    n_aud = audio_frames_valid(
        assets["valid_samples"], d.hop_length, d.max_audio_frames
    )
    row = {
        "text_ids": enc["text_ids"],
        "word_mask": enc["word_mask"],
        "sent_mask": enc["sent_mask"],
        "frames": assets["frames"],
        "img_mask": assets["img_mask"],
        "waveform": assets["waveform"],
        # mask reflects the true audio length (matches the
        # training corpus's VideoCorpus semantics)
        "aud_mask": (
            np.arange(d.max_audio_frames) < n_aud
        ).astype(np.float32),
    }
    return row, enc["sentences"]


class Summarizer:
    def __init__(
        self,
        params,
        fe_params,
        word2idx: dict[str, int],
        cfg: Config,
        vgg_spec=VGG16_SPEC,
        mode: str = "greedy",
        topk: int = 4,
        seed: int = 0,
        serve_batch_size: int | None = None,
        data_parallel: bool = False,
        serve_buckets=None,
    ):
        self.params = params
        from mmbidaf_tpu.data.frontend import cast_vgg_weights

        # frozen VGG weights held in the compute dtype (see cast_vgg_weights)
        self.fe_params = cast_vgg_weights(fe_params, cfg.model.compute_dtype)
        self.word2idx = word2idx
        self.cfg = cfg
        self.vgg_spec = vgg_spec
        self.mode = mode
        self.topk = topk
        # Static serving batch: requests are padded up (and chunked) to this
        # size so XLA compiles ONE program instead of one per request size.
        self.serve_batch_size = serve_batch_size
        # serve_buckets (None = off): per-batch feature-axis bucketing —
        # requests are trimmed to the smallest ladder rung covering their
        # true lengths instead of always padding to the config caps, so a
        # short video skips most of the padded VGG/MFCC compute AND most
        # of the H2D bytes. Outputs are unchanged (masks carry true
        # lengths). Cost: one compile per distinct rung tuple actually
        # seen (bounded by the small ladder; the persistent compilation
        # cache absorbs them across restarts). True (default ladders) or
        # a dict of explicit ladders — `suggest_buckets` output plugs in.
        self._ladders = (
            None
            if serve_buckets is None or serve_buckets is False
            else serving_bucket_ladders(cfg, serve_buckets)
        )
        # diagonal rung levels (smallest first) — DynamicBatcher groups
        # mixed-length request batches by covering level so one long video
        # doesn't drag every coalesced short request to full-cap shapes
        self.bucket_levels = (
            bucket_ladder_levels(self._ladders)
            if self._ladders is not None else []
        )
        # rung-tuple → device-batch count; observability for /healthz
        self.bucket_stats: dict[tuple, int] = {}
        self._stats_lock = threading.Lock()
        self._rng = jax.random.key(seed)
        # topk's rng split is the one piece of mutable state; callers may
        # share one Summarizer across threads
        self._rng_lock = threading.Lock()
        self._featurize = None  # lazy jitted frontend for summarize_long
        self._num_audio_samples = num_audio_samples(cfg)
        # MeshConfig.sp_audio: route the audio tower through the
        # sequence-parallel chain (SP-MFCC → SP-BiLSTM → ring BiDAF) with
        # the frame axis sharded over the mesh's 'seq' axis — the product
        # path for long-audio serving (SURVEY §3.3 SP row).
        self._audio_g_fn = None
        self._mesh = None
        self._dp = bool(data_parallel)
        sp_on = cfg.mesh.sp_audio and cfg.model.use_audio
        # MeshConfig.tp_vgg: VGG classifier tensor-parallel over the
        # 'model' axis (fc1 column- / fc2 row-parallel, one all-reduce) —
        # per-chip classifier weights shrink num_model×. Composes with DP.
        tp_on = cfg.mesh.tp_vgg
        if tp_on and not cfg.model.use_images:
            raise ValueError(
                "tp_vgg shards the VGG classifier but the image tower is "
                "disabled (use_images=False)"
            )
        if tp_on and cfg.mesh.num_model <= 1:
            raise ValueError(
                "tp_vgg needs a model axis: set MeshConfig.num_model > 1 "
                "(devices split as data x model)"
            )
        if sp_on or self._dp or tp_on:
            from mmbidaf_tpu.parallel import make_mesh

            self._mesh = make_mesh(cfg.mesh)
        if self._dp:
            # Data-parallel serving: the request batch is sharded over the
            # mesh's data axes ('dcn' × 'data') and XLA's GSPMD runs the
            # whole frontend+decode on every chip's shard — the scaling
            # story for serving throughput (SURVEY §3.3: DP is primary).
            # Static shapes stay the rule, so a divisible serve_batch_size
            # is required: shard_batch silently REPLICATES non-divisible
            # batches (correct but n× slower), which would defeat the flag.
            from mmbidaf_tpu.parallel.mesh import data_shard_count

            n = data_shard_count(self._mesh)
            if serve_batch_size is None or serve_batch_size % n != 0:
                raise ValueError(
                    f"data_parallel serving shards the batch over {n} "
                    f"device(s): pass serve_batch_size as a multiple of {n} "
                    f"(got {serve_batch_size!r})"
                )
            from mmbidaf_tpu.parallel import shard_frontend, shard_params

            self._dp_shards = n
            self.params = shard_params(self.params, self._mesh)
            self.fe_params = shard_frontend(self.fe_params, self._mesh, tp_on)
        else:
            self._dp_shards = 1
            if tp_on:
                # TP without DP: the request batch replicates over the
                # mesh (B=1 latency serving); towers replicate, the VGG
                # classifier shards. Params must be committed so the jit
                # program runs on the whole mesh.
                from mmbidaf_tpu.parallel import shard_frontend, shard_params

                self.params = shard_params(self.params, self._mesh)
                self.fe_params = shard_frontend(self.fe_params, self._mesh, True)
        if sp_on:
            from mmbidaf_tpu.parallel.sp_tower import make_sp_audio_tower

            # without DP the batch is replicated inside the SP stages:
            # request batches (often B=1) need not divide the data axis;
            # seq-only serving meshes put their devices on 'seq'. With DP
            # the batch axis IS sharded, so the SP stages keep it.
            self._audio_g_fn = make_sp_audio_tower(
                self._mesh, cfg, use_batch_axis=self._dp
            )
        sp = self._audio_g_fn is not None
        n_dp = self._dp_shards  # auto frame-chunking budgets per-chip activations
        if mode == "greedy":
            self._decode = make_end_to_end_decode(
                cfg, vgg_spec=vgg_spec, audio_g_fn=self._audio_g_fn,
                data_shards=n_dp,
            )
        elif mode == "beam":
            from mmbidaf_tpu.data.frontend import apply_frontend
            from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

            @jax.jit
            def decode_beam(params, fe, raw):
                batch = apply_frontend(
                    fe, raw, cfg, vgg_spec, sp_audio=sp, data_shards=n_dp
                )
                return mmbidaf_decode(
                    params, batch, cfg, mode="beam", topk=topk,
                    audio_g_fn=self._audio_g_fn,
                )

            self._decode = lambda params, fe, raw: decode_beam(params, fe, raw)
        elif mode == "topk":
            from mmbidaf_tpu.data.frontend import apply_frontend
            from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

            @jax.jit
            def decode(params, fe, raw, rng):
                batch = apply_frontend(
                    fe, raw, cfg, vgg_spec, sp_audio=sp, data_shards=n_dp
                )
                return mmbidaf_decode(
                    params, batch, cfg, mode="topk", topk=topk, rng=rng,
                    audio_g_fn=self._audio_g_fn,
                )

            self._decode_topk = decode
        else:
            # a typo ("greddy") must not silently become stochastic sampling
            raise ValueError(
                f"unknown decode mode {mode!r}: expected 'greedy', 'beam', "
                "or 'topk'"
            )

    # -- constructors -------------------------------------------------------

    @classmethod
    def init_random(cls, cfg: Config, seed: int = 0, vgg_spec=VGG16_SPEC, **kw):
        """Untrained summarizer (smoke tests / benchmarking)."""
        from mmbidaf_tpu.data.synthetic import random_word_vectors

        rng = np.random.default_rng(seed)
        wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
        word2idx = {f"w{i}": i for i in range(cfg.data.vocab_size)}
        params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(wv))
        fe = frontend_init(jax.random.key(seed + 1), cfg, vgg_spec=vgg_spec)
        return cls(params, fe, word2idx, cfg, vgg_spec, **kw)

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_dir: str,
        vocab_path: str,
        emb_path: str,
        cfg: Config,
        vgg_spec=VGG16_SPEC,
        seed: int = 0,
        use_ema: bool = True,
        **kw,
    ):
        """Load params from an orbax run + the corpus vocab.

        ``use_ema=True`` (default) serves the EMA shadow weights, matching
        the reference's eval convention; ``use_ema=False`` loads the raw
        trained params (debugging mismatched EMA states).
        """
        from mmbidaf_tpu.train import checkpoint as ckpt
        from mmbidaf_tpu.train.loop import init_train_state

        word2idx, table = load_vocab(vocab_path, emb_path)
        params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(table))
        template = init_train_state(jax.random.key(seed + 1), params, cfg)
        manager = ckpt.make_manager(ckpt_dir)
        restored = ckpt.restore_latest(manager, template)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
        fe = frontend_init(jax.random.key(seed + 2), cfg, vgg_spec=vgg_spec)
        served = restored.ema_params if use_ema else restored.params
        return cls(served, fe, word2idx, cfg, vgg_spec, **kw)

    @classmethod
    def from_run(cls, run_dir: str, mesh_overrides: dict | None = None, **kw):
        """One-call serving from a ``train.py`` run directory: loads the
        saved config (incl. the VGG frontend variant), the persisted vocab
        (``vocab.json`` + ``emb.npz`` — the reference's serialized
        word2idx/embedding artifacts), and the latest checkpoint.

        ``mesh_overrides`` replaces fields on the saved ``MeshConfig``
        (e.g. ``{"tp_vgg": True, "num_model": 2}``) — serving hardware
        rarely matches training hardware, so the parallelism layout is a
        deploy-time choice, not a training artifact."""
        from mmbidaf_tpu.train.checkpoint import load_config

        cfg = load_config(run_dir)
        if mesh_overrides:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, mesh=dataclasses.replace(cfg.mesh, **mesh_overrides)
            )
        from mmbidaf_tpu.ops.vgg import spec_for_variant

        vgg_spec = kw.pop("vgg_spec", None)
        if vgg_spec is None:
            vgg_spec = spec_for_variant(cfg.model.vgg_variant)
        return cls.from_checkpoint(
            os.path.join(run_dir, "ckpts"),
            os.path.join(run_dir, "vocab.json"),
            os.path.join(run_dir, "emb.npz"),
            cfg,
            vgg_spec=vgg_spec,
            **kw,
        )

    @classmethod
    def from_torch_state_dict(
        cls,
        sd: dict,
        word2idx: dict[str, int],
        cfg: Config,
        vgg_spec=VGG16_SPEC,
        seed: int = 0,
        **kw,
    ):
        """Reference-checkpoint import path (SURVEY §4.5)."""
        from mmbidaf_tpu.interop.torch_port import port_mmbidaf

        params = port_mmbidaf(
            sd, use_images=cfg.model.use_images, use_audio=cfg.model.use_audio
        )
        fe = frontend_init(jax.random.key(seed), cfg, vgg_spec=vgg_spec)
        return cls(params, fe, word2idx, cfg, vgg_spec, **kw)

    # -- inference ----------------------------------------------------------

    def _get_featurize(self):
        """Lazy jitted batch-1 frontend for the windowed long-video path.

        Under sp_audio the waveform passes through raw — each window
        re-featurizes it sharded inside the model (caching would mean
        gathering the long frame axis, defeating the SP design).
        """
        if self._featurize is None:
            from mmbidaf_tpu.data.frontend import apply_frontend

            cfg, spec = self.cfg, self.vgg_spec
            sp = self._audio_g_fn is not None
            n_dp = self._dp_shards  # per-chip auto frame-chunk budgeting
            self._featurize = jax.jit(
                lambda fe, raw: apply_frontend(
                    fe, raw, cfg, spec, sp_audio=sp, data_shards=n_dp
                )
            )
        return self._featurize

    def warmup(
        self,
        frame_hw: tuple[int, int] = (240, 320),
        batch_size: int | None = None,
        include_long: bool = False,
    ) -> None:
        """Compile the serving program(s) before the first real request.

        Without this the first request pays the full XLA compile (seconds on
        CPU, ~minutes against a cold remote TPU compile server — CLAUDE.md).
        Builds a synthetic zero batch at the pinned serving shapes and runs
        it through the exact jitted path real requests take.

        ``frame_hw`` must match the corpus's decoded frame resolution:
        raw-frame SHAPES are compile-time constants, so a different
        request-time resolution is a fresh compile (the persistent
        compilation cache absorbs that across restarts — utils/cache).
        ``batch_size`` overrides the warmed batch shape (e.g. a
        ``DynamicBatcher``'s ``max_batch_size``); defaults to
        ``serve_batch_size`` or 1.

        topk mode: the warmup decode runs under a FIXED key, not one drawn
        from the serving rng stream — a warmed summarizer samples exactly
        like a non-warmed one.

        ``include_long=True`` additionally compiles the ``summarize_long``
        programs (batch-1 featurize + the feature-shaped window decode).

        With ``serve_buckets`` on, this warms the FULL-shape program plus
        every DIAGONAL rung level (``bucket_ladder_levels``) — per-axis
        rung choice is independent at serve time, so off-diagonal tuples
        can still compile on their first real request, but the diagonal
        covers uniformly-short videos (the common case) and every compile
        persists in the compilation cache across restarts.
        """
        d = self.cfg.data
        b = batch_size or self.serve_batch_size or 1
        h, w = frame_hw

        def zero_raw(rungs: Mapping[str, int] | None = None, nb: int = b):
            r = rungs or {}
            t_s = r.get("sentences", d.max_sentences)
            t_w = r.get("words", d.max_words)
            t_i = r.get("keyframes", d.max_keyframes)
            t_a = r.get("audio_frames", d.max_audio_frames)
            n_samples = t_a * d.hop_length + d.win_length
            return {
                "text_ids": jnp.zeros((nb, t_s, t_w), jnp.int32),
                "word_mask": jnp.ones((nb, t_s, t_w), jnp.float32),
                "sent_mask": jnp.ones((nb, t_s), jnp.float32),
                "frames": jnp.zeros((nb, t_i, h, w, 3), jnp.uint8),
                "img_mask": jnp.ones((nb, t_i), jnp.float32),
                "waveform": jnp.zeros((nb, n_samples), jnp.float32),
                "aud_mask": jnp.ones((nb, t_a), jnp.float32),
            }

        raw = zero_raw()
        self._decode_batch(raw, rng=jax.random.key(0))
        for rungs in self.bucket_levels:
            self._decode_batch(zero_raw(rungs), rng=jax.random.key(0))
        if include_long:
            if b != 1 and not self._dp:
                # summarize_long's short-transcript branch decodes raw
                # frames at B=1 (serving.py::summarize_long) — a distinct
                # program from the batch-b one above. (Skipped under DP:
                # that branch would shard a B=1 batch, and DP serving
                # callers use summarize/summarize_batch.)
                self._decode_batch({k: v[:1] for k, v in raw.items()},
                                   rng=jax.random.key(0))
                # the short-transcript branch routes through _stack_rows,
                # so short videos decode at B=1 RUNG shapes — warm those
                # too (the long feature-window rung programs still
                # lazy-compile on first use)
                for rungs in self.bucket_levels:
                    self._decode_batch(zero_raw(rungs, nb=1),
                                       rng=jax.random.key(0))
            media = {k: raw[k][:1] for k in
                     ("frames", "img_mask", "waveform", "aud_mask")}
            feat = self._get_featurize()(self.fe_params, media)
            feat = {k: np.asarray(v)[0] for k, v in feat.items()}
            long_raw = {
                **{k: raw[k] for k in ("text_ids", "word_mask", "sent_mask")},
                **{k: jnp.asarray(np.stack([v] * b)) for k, v in feat.items()},
            }
            self._decode_batch(long_raw, with_scores=True, rng=jax.random.key(0))

    def _raw_row(self, video_dir: str) -> tuple[dict, list[str]]:
        """Host-decode ONE video's assets into an (unstacked) feature row.

        Pure host work (container decode + tokenize + mask build) — safe to
        run concurrently from many request threads; ``DynamicBatcher`` relies
        on exactly that split.
        """
        return host_raw_row(video_dir, self.word2idx, self.cfg)

    def _stack_rows(self, rows: Sequence[dict]) -> dict:
        """Stack per-video rows into one device batch; under
        ``serve_buckets`` trim the feature axes to their ladder rungs
        host-side BEFORE upload (cuts padded compute and H2D bytes —
        the relay link is ~1 MB/s, CLAUDE.md). Rows are trimmed BEFORE
        stacking so only the trimmed batch is ever allocated (a cap-padded
        frames stack is ~4× the bytes at quarter rungs)."""
        if self._ladders is not None:
            from mmbidaf_tpu.data.pipeline import bucket_for

            needs: dict[str, int] = {}
            for r in rows:
                for k, v in batch_true_lengths(r).items():
                    needs[k] = max(needs.get(k, 0), v)
            rungs = {k: bucket_for(v, self._ladders[k]) for k, v in needs.items()}
            for k in ("sentences", "words", "keyframes", "audio_frames"):
                rungs.setdefault(k, 0)  # absent axes are skipped by key
            rows = [
                trim_raw_to_rungs(r, self.cfg, rungs, batched=False)
                for r in rows
            ]
        raw = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        if self._ladders is not None:
            record_bucket_stat(self.bucket_stats, self._stats_lock, raw)
        return {k: jnp.asarray(v) for k, v in raw.items()}

    def _raw_batch(self, video_dirs: Sequence[str]) -> tuple[dict, list[list[str]]]:
        rows, sentences = [], []
        for vd in video_dirs:
            row, sents = self._raw_row(vd)
            rows.append(row)
            sentences.append(sents)
        return self._stack_rows(rows), sentences

    def _decode_batch_device(self, raw, rng=None):
        """Upload + DISPATCH the decode; returns (log_p, picks) as device
        arrays WITHOUT fetching. JAX dispatch is async, so the caller can
        overlap the host fetch of batch N with collate/upload of batch N+1
        (DynamicBatcher's pipelined completion thread)."""
        if self._dp:
            from mmbidaf_tpu.parallel import shard_batch

            raw = shard_batch(raw, self._mesh)
        if self.mode in ("greedy", "beam"):
            return self._decode(self.params, self.fe_params, raw)
        if rng is None:
            with self._rng_lock:
                self._rng, rng = jax.random.split(self._rng)
        return self._decode_topk(self.params, self.fe_params, raw, rng)

    def _decode_batch(self, raw, with_scores: bool = False, rng=None):
        log_p, picks = self._decode_batch_device(raw, rng=rng)
        picks = np.asarray(picks)
        if not with_scores:
            return picks
        return picks, picks_scores(np.asarray(log_p), picks)

    def summarize_batch(self, video_dirs: Sequence[str]) -> list[str]:
        sb = self.serve_batch_size
        if not video_dirs:
            return []
        if sb is None:
            raw, sentences = self._raw_batch(video_dirs)
            picks = self._decode_batch(raw)
            return [summary_from_picks(picks[i], sentences[i])
                    for i in range(len(video_dirs))]
        # Static-shape serving: chunk the request into full batches of sb
        # (tail padded by repeating the last video, sliced off after).
        # Host asset decode for chunk i+1 overlaps the device program for
        # chunk i: JAX dispatch is async, so submitting the next _raw_batch
        # before fetching picks keeps host PNG/WAV decode off the device's
        # critical path.
        from concurrent.futures import ThreadPoolExecutor

        chunks = []
        for start in range(0, len(video_dirs), sb):
            chunk = list(video_dirs[start:start + sb])
            n_real = len(chunk)
            chunks.append((chunk + [chunk[-1]] * (sb - n_real), n_real))

        out: list[str] = []
        with ThreadPoolExecutor(max_workers=1) as ex:
            pending = ex.submit(self._raw_batch, chunks[0][0])
            for i, (_, n_real) in enumerate(chunks):
                raw, sentences = pending.result()
                if i + 1 < len(chunks):
                    pending = ex.submit(self._raw_batch, chunks[i + 1][0])
                picks = self._decode_batch(raw)
                out.extend(summary_from_picks(picks[j], sentences[j])
                           for j in range(n_real))
        return out

    def summarize(self, video_dir: str) -> str:
        return self.summarize_batch([video_dir])[0]

    def summarize_long(self, video_dir: str, stride: int | None = None) -> str:
        """Summarize a video whose transcript exceeds the ``max_sentences``
        bucket (``summarize`` would truncate it): slide overlapping windows
        of ``max_sentences`` sentences over the full transcript, decode each
        window against the video's (global) keyframe/audio context, and
        merge the per-window picks by log-prob (``merge_window_picks``).

        ``stride`` defaults to half a window. Window batches run through
        the same jitted decode program as ``summarize_batch``; when
        ``serve_batch_size`` is set, window batches are padded/chunked to
        that one static shape.
        """
        from mmbidaf_tpu.data.video import audio_frames_valid

        d, m = self.cfg.data, self.cfg.model
        assets = load_video_assets(
            video_dir, d.max_keyframes, self._num_audio_samples,
            keyframe_policy=d.keyframe_policy, sample_rate=d.sample_rate,
        )
        sentences = sent_tokenize(assets["transcript"])
        n_aud = audio_frames_valid(
            assets["valid_samples"], d.hop_length, d.max_audio_frames
        )
        media = {
            "frames": assets["frames"],
            "img_mask": assets["img_mask"],
            "waveform": assets["waveform"],
            "aud_mask": (np.arange(d.max_audio_frames) < n_aud).astype(np.float32),
        }

        def window_row(sents, media_row):
            enc = encode_sentences(sents, self.word2idx, d.max_sentences, d.max_words)
            return {
                "text_ids": enc["text_ids"],
                "word_mask": enc["word_mask"],
                "sent_mask": enc["sent_mask"],
                **media_row,
            }

        if len(sentences) <= d.max_sentences:
            # short transcript: one "window" over the already-loaded assets
            # (no second asset decode)
            raw = self._stack_rows([window_row(sentences, media)])
            picks = self._decode_batch(raw)
            return summary_from_picks(picks[0], sentences)

        # Featurize the media ONCE (batch-1 frontend) — every window shares
        # the video's global visual/audio context, and shipping the 4096-d
        # features per window instead of raw frames cuts the per-chunk H2D
        # bytes ~30x (the relay link is slow — CLAUDE.md). apply_frontend
        # passes feature batches through untouched.
        media_b = {k: np.stack([v]) for k, v in media.items()}
        if self._ladders is not None:
            # trim the media BEFORE the batch-1 featurize — that is where
            # the padded VGG/MFCC cost lives on this path
            media_b = trim_raw_batch(media_b, self.cfg, self._ladders)
        feat = self._get_featurize()(
            self.fe_params, {k: jnp.asarray(v) for k, v in media_b.items()}
        )
        media = {k: np.asarray(v)[0] for k, v in feat.items()}

        stride = stride or max(d.max_sentences // 2, 1)
        starts = transcript_windows(len(sentences), d.max_sentences, stride)
        rows = [window_row(sentences[start:start + d.max_sentences], media)
                for start in starts]

        sb = self.serve_batch_size or len(rows)
        picks_l, scores_l = [], []
        for i in range(0, len(rows), sb):
            chunk = rows[i:i + sb]
            n_real = len(chunk)
            chunk = chunk + [chunk[-1]] * (sb - n_real)
            raw = self._stack_rows(chunk)
            p, s = self._decode_batch(raw, with_scores=True)
            picks_l.append(p[:n_real])
            scores_l.append(s[:n_real])
        picks = np.concatenate(picks_l)
        scores = np.concatenate(scores_l)
        window_lens = [min(d.max_sentences, len(sentences) - st) for st in starts]
        chosen = merge_window_picks(picks, scores, starts, window_lens, m.max_decode_steps)
        return " ".join(sentences[g] for g in chosen)


class DynamicBatcher:
    """Dynamic micro-batching for concurrent serving requests.

    The reference has no serving story at all; production TPU serving wants
    the classic dynamic-batching shape (TF-Serving / Triton style): many
    concurrent single-video requests coalesced into ONE device batch, because
    the batched decode amortizes far better than sequential B=1 calls
    (measured on v5e: ~3.5 ms/video at B=32 vs ~6 ms at B=1 — BASELINE.md).

    Split of work:
      * ``submit()`` (request threads): host container decode + tokenize via
        ``Summarizer._raw_row`` — embarrassingly parallel, overlaps across
        requests and with the device program.
      * one batcher thread: takes the first queued row, gathers more for up
        to ``max_wait_ms`` (or until ``max_batch_size``), pads the batch to
        the ONE static shape by repeating the last row, and DISPATCHES the
        shared jitted decode (async).
      * one completion thread (``pipeline_depth`` >= 1): fetches each
        dispatched batch's picks and resolves its futures, so the batcher
        thread collates + uploads batch N+1 while the device runs batch N
        (double-buffering; depth 0 restores the synchronous fetch).

    Static shapes: every device call is exactly ``max_batch_size`` rows, so
    XLA compiles one program regardless of arrival pattern (same rule as
    ``Summarizer.serve_batch_size``).

    Error story: host-decode errors raise in the submitting thread and fail
    only that request. A device-step error cannot be attributed to one row,
    so it fails every request in that batch (callers see the same exception).
    With ``max_queue`` set, ``submit`` sheds load once that many requests
    are already pending (``ServerOverloadedError``, before any host decode).

    Determinism: greedy/beam decodes give byte-identical results regardless
    of how requests were coalesced; top-k sampling consumes one rng per
    device batch, so outputs depend on batch composition (inherent to
    sampling, documented here).
    """

    def __init__(
        self,
        summarizer: Summarizer,
        max_batch_size: int = 8,
        max_wait_ms: float = 5.0,
        max_queue: int | None = None,
        group_buckets: bool = True,
        pipeline_depth: int = 1,
    ):
        # pipeline_depth: how many dispatched-but-unfetched device batches
        # may be in flight while the batcher thread gathers/collates/uploads
        # the next one (VERDICT r4 weak #2: the daemon used to serialize
        # host collate + H2D of batch N+1 behind the result fetch of batch
        # N). Depth 1 = classic double-buffering; 0 = the old synchronous
        # behavior (fetch inline on the batcher thread). Host fetch runs on
        # a dedicated completion thread; JAX dispatch/fetch from two
        # threads is the same pattern summarize_batch's prefetch uses.
        # group_buckets: on a bucketed summarizer, partition mixed
        # coalesced sets by covering rung level (one device call per
        # level). This is a LATENCY-for-SHORTS trade: each group still
        # pads to max_batch_size, so a window holding L distinct levels
        # costs L device calls instead of one full-cap call — under
        # sustained saturated mixed traffic that can LOWER total
        # throughput; pass False to always run one full-cap batch.
        if max_batch_size < 1:
            raise ValueError(f"max_batch_size must be >= 1, got {max_batch_size}")
        if max_queue is not None and max_queue < 1:
            raise ValueError(f"max_queue must be >= 1 or None, got {max_queue}")
        if max_batch_size % summarizer._dp_shards != 0:
            # shard_batch would silently REPLICATE a non-divisible batch —
            # correct output, but n× slower, defeating data_parallel
            raise ValueError(
                f"max_batch_size must be a multiple of the summarizer's "
                f"{summarizer._dp_shards} data-parallel shards, "
                f"got {max_batch_size}"
            )
        fixed = getattr(summarizer, "fixed_batch_size", None)
        if fixed is not None and max_batch_size != fixed:
            # AOT artifacts compile ONE batch shape; padding to any other
            # size would be a shape error at decode time — fail at setup
            raise ValueError(
                f"this summarizer serves a fixed batch of {fixed} (AOT "
                f"artifact); max_batch_size must equal it, got {max_batch_size}"
            )
        if pipeline_depth < 0:
            raise ValueError(f"pipeline_depth must be >= 0, got {pipeline_depth}")
        self.summarizer = summarizer
        self.max_batch_size = int(max_batch_size)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.max_queue = max_queue
        self.group_buckets = bool(group_buckets)
        self.pipeline_depth = int(pipeline_depth)
        self.stats = {"requests": 0, "batches": 0, "padded_rows": 0,
                      "rejected": 0, "bucket_splits": 0}
        # all other stats fields are batcher-thread-only; 'rejected' is
        # bumped from concurrent submitter threads and needs the lock
        self._reject_lock = threading.Lock()
        self._close_lock = threading.Lock()  # orders submit's put vs close
        self._queue: _queue_mod.Queue = _queue_mod.Queue()
        self._closed = False
        self._completer = None
        if self.pipeline_depth:
            # bounded: a full queue blocks the batcher thread's put — that
            # IS the double-buffer backpressure (at most `depth` device
            # batches dispatched but unfetched)
            self._inflight: _queue_mod.Queue = _queue_mod.Queue(
                maxsize=self.pipeline_depth)
            self._completer = threading.Thread(
                target=self._complete_loop, name="mmbidaf-batcher-fetch",
                daemon=True,
            )
            self._completer.start()
        self._thread = threading.Thread(
            target=self._loop, name="mmbidaf-batcher", daemon=True
        )
        self._thread.start()

    # -- request side -------------------------------------------------------

    def submit(self, video_dir: str) -> str:
        """Summarize one video; blocks until its batch completes.

        Thread-safe; intended to be called from many request threads at
        once — concurrency is what creates the batching win.
        """
        if self._closed:
            raise RuntimeError("DynamicBatcher is closed")
        # Overload shedding BEFORE the host decode: rejecting must stay
        # cheap when the server is drowning. qsize() is approximate under
        # concurrency, so the bound is soft by ±(concurrent submitters) —
        # fine for load shedding, which needs a dam, not a turnstile.
        if self.max_queue is not None and self._queue.qsize() >= self.max_queue:
            with self._reject_lock:  # many submitter threads race here
                self.stats["rejected"] += 1
            raise ServerOverloadedError(
                f"pending-request queue at max_queue={self.max_queue}; "
                "retry later"
            )
        row, sentences = self.summarizer._raw_row(video_dir)  # host work, caller's thread
        fut: Future = Future()
        # enqueue under the close lock: the host decode above can take
        # seconds, during which close() may have drained and stopped the
        # loop — a put after that would block this caller forever on a
        # queue nobody reads
        with self._close_lock:
            if self._closed:
                raise RuntimeError("DynamicBatcher is closed")
            self._queue.put((row, sentences, fut))
        return fut.result()

    def close(self, timeout: float = 30.0) -> None:
        """Stop the batcher thread; in-flight batches finish, then queued
        requests that never made it into a batch fail with RuntimeError."""
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        self._queue.put(None)
        self._thread.join(timeout)
        # anything that raced into the queue before _closed flipped (the
        # loop's own sentinel drain may have run first) fails loudly here
        self._drain_failed()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- batcher thread -----------------------------------------------------

    def _loop(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                self._drain_failed()
                self._shutdown_completer()
                return
            items = [item]
            deadline = time.monotonic() + self.max_wait_s
            stop = False
            while len(items) < self.max_batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except _queue_mod.Empty:
                    break
                if nxt is None:
                    stop = True  # run what we have, then exit
                    break
                items.append(nxt)
            self._run_batch(items)
            if stop:
                self._drain_failed()
                self._shutdown_completer()
                return

    def _shutdown_completer(self) -> None:
        """Flush the in-flight pipeline: the completion thread resolves its
        remaining batches, then exits. Runs on the batcher thread so
        close()'s join on it covers the whole drain."""
        if self._completer is not None:
            self._inflight.put(None)
            self._completer.join()

    def _drain_failed(self) -> None:
        while True:
            try:
                item = self._queue.get_nowait()
            except _queue_mod.Empty:
                return
            if item is not None:
                item[2].set_exception(RuntimeError("DynamicBatcher closed"))

    def _run_batch(self, items: list) -> None:
        # Bucket-aware grouping: under serve_buckets (or a bucketed
        # artifact), a mixed coalesced set is partitioned by each request's
        # smallest covering rung level BEFORE batching — otherwise one
        # long video drags every short request in the batch to full-cap
        # shapes, forfeiting the bucket win exactly when traffic mixes.
        # Outputs are unchanged (greedy/beam are batch-composition
        # independent); cost is one device call per distinct level in the
        # set, each still padded to the one static batch size.
        # grouping failures must fail THESE futures, never escape — an
        # exception out of _run_batch kills the batcher thread and hangs
        # every pending and future submit() (same contract as _run_group)
        try:
            groups = None
            if self.group_buckets and len(items) > 1:
                levels = getattr(self.summarizer, "bucket_levels", None) or []
                if levels:
                    groups = {}
                    for it in items:
                        needs = batch_true_lengths(it[0])
                        groups.setdefault(
                            covering_level(levels, needs), []
                        ).append(it)
        except Exception as e:
            for _, _, fut in items:
                fut.set_exception(e)
            return
        if groups and len(groups) > 1:
            self.stats["bucket_splits"] += 1
            # smallest level first: short requests resolve soonest
            for _, group in sorted(
                groups.items(), key=lambda kv: kv[0] if kv[0] >= 0 else 1 << 30
            ):
                self._run_group(group)
            return
        self._run_group(items)

    def _run_group(self, items: list) -> None:
        n_real = len(items)
        # EVERYTHING batch-scoped stays inside the try: a stacking error
        # (e.g. two videos decoded at different frame resolutions) must
        # fail these futures, not escape and kill the batcher thread —
        # a dead thread hangs every pending and future submit() forever.
        try:
            rows = [row for row, _, _ in items]
            rows = rows + [rows[-1]] * (self.max_batch_size - n_real)
            # _stack_rows applies the summarizer's serve_buckets trim, so
            # a batch of short videos skips the padded feature compute
            raw = self.summarizer._stack_rows(rows)
            # dispatch only — the (blocking) host fetch happens on the
            # completion thread so this thread can gather/collate/upload
            # the NEXT batch while the device runs this one. AOT artifacts
            # (ExportedSummarizer) duck-type only the fetched _decode_batch;
            # their np result passes through _finish as a no-op asarray.
            dispatch = getattr(self.summarizer, "_decode_batch_device", None)
            if dispatch is not None:
                picks_dev = dispatch(raw)[1]
            else:
                picks_dev = self.summarizer._decode_batch(raw)
        except Exception as e:  # batch fault → fail the whole batch
            for _, _, fut in items:
                fut.set_exception(e)
            return
        # stats count DISPATCHED batches (single-writer: batcher thread)
        self.stats["requests"] += n_real
        self.stats["batches"] += 1
        self.stats["padded_rows"] += self.max_batch_size - n_real
        if self._completer is not None:
            self._inflight.put((picks_dev, items))
        else:
            self._finish(picks_dev, items)

    def _finish(self, picks_dev, items: list) -> None:
        """Fetch one dispatched batch's picks and resolve its futures.
        Never raises (a device-step error fails the batch's futures)."""
        try:
            picks = np.asarray(picks_dev)
            summaries = [
                summary_from_picks(picks[i], items[i][1])
                for i in range(len(items))
            ]
        except Exception as e:
            for _, _, fut in items:
                fut.set_exception(e)
            return
        for i, (_, _, fut) in enumerate(items):
            fut.set_result(summaries[i])

    def _complete_loop(self) -> None:
        while True:
            job = self._inflight.get()
            if job is None:
                return
            self._finish(*job)
