"""AOT serving artifacts via ``jax.export`` (SURVEY.md §2 L5, serving layer).

The reference has no deployment story: serving a checkpoint means carrying
the whole model codebase to the serving host and rebuilding the module tree
(SURVEY §4.3). A TPU-native framework can do better: ``jax.export`` captures
the jitted raw-video→picks program as *versioned StableHLO*, so the serving
host needs only the artifact directory and a JAX install — no model code, no
tracing, no Python re-build of the network. Cross-platform lowering also
works: export on a CPU dev box with ``platforms=("tpu",)`` and serve the
same bytes on a TPU pod.

Artifact layout (one directory)::

    decode.jaxexport   serialized StableHLO program (flat-leaf signature)
    weights.npz        model + frontend params, flat leaf order
    manifest.json      leaf counts/dtypes, raw input specs, platforms
    config.json        the run's Config (host-side preprocessing needs it)
    vocab.json         word2idx (host-side transcript encoding)

The exported program takes ``(*weight_leaves, *raw_leaves)`` as a FLAT
argument list — no pytree-structure serialization problem — and returns
``(log_p, picks)`` exactly like ``make_end_to_end_decode``'s jitted fn.

Scope: the deterministic decode paths — greedy and beam search (both are
pure functions of weights + raw batch; the manifest records which one the
program froze) — single-device, data-parallel, tensor-parallel
(``MeshConfig.tp_vgg``), or DP × TP. A mesh-backed Summarizer exports the
GSPMD-sharded program: the manifest records the mesh plus per-leaf weight
PartitionSpecs (tp_vgg's sharded VGG classifier stays sharded through the
artifact), and the loader rebuilds an identically-shaped mesh from the
serving host's local devices (device count is validated).
Stochastic top-k (carries an rng stream) and ``sp_audio`` (shard_map
chains) raise at export time — their value is interactive serving, which
`Summarizer` already covers.
"""

from __future__ import annotations

import json
import os
from typing import Mapping, Sequence

import numpy as np

import jax
import jax.numpy as jnp

_MANIFEST = "manifest.json"
_PROGRAM = "decode.jaxexport"
_WEIGHTS = "weights.npz"
_CONFIG = "config.json"
_VOCAB = "vocab.json"
# v1: replicated weights (single-device / plain DP). v2: the manifest's
# weight_pspecs carry SHARDED leaves (tp_vgg) that the loader must honor —
# written only for such artifacts, so a v1-only loader refuses them loudly
# instead of placing TP weights replicated and failing inside exported.call.
_FORMAT_VERSION = 1
_FORMAT_VERSION_TP = 2
_SUPPORTED_VERSIONS = (1, 2)

# Raw-input call order is pinned by the manifest, not by dict iteration.
_RAW_KEYS = (
    "text_ids", "word_mask", "sent_mask",
    "frames", "img_mask", "waveform", "aud_mask",
)


def _file_sha256(path: str) -> str:
    """Chunked file hash — a VGG16 artifact's weights are ~0.5 GB; reading
    them whole for hashing would double peak host memory at load."""
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def _raw_specs(
    cfg,
    batch_size: int,
    frame_hw: tuple[int, int],
    rungs: Mapping[str, int] | None = None,
) -> dict:
    """ShapeDtypeStructs for the raw batch ``host_raw_row`` rows stack into
    (same shapes ``Summarizer.warmup`` pins). ``rungs`` overrides the
    config-cap feature-axis sizes (bucketed artifact programs)."""
    d = cfg.data
    b, (h, w) = batch_size, frame_hw
    r = rungs or {}
    t_s = r.get("sentences", d.max_sentences)
    t_w = r.get("words", d.max_words)
    t_i = r.get("keyframes", d.max_keyframes)
    t_a = r.get("audio_frames", d.max_audio_frames)
    n_samples = t_a * d.hop_length + d.win_length
    return {
        "text_ids": jax.ShapeDtypeStruct((b, t_s, t_w), jnp.int32),
        "word_mask": jax.ShapeDtypeStruct((b, t_s, t_w), jnp.float32),
        "sent_mask": jax.ShapeDtypeStruct((b, t_s), jnp.float32),
        "frames": jax.ShapeDtypeStruct((b, t_i, h, w, 3), jnp.uint8),
        "img_mask": jax.ShapeDtypeStruct((b, t_i), jnp.float32),
        "waveform": jax.ShapeDtypeStruct((b, n_samples), jnp.float32),
        "aud_mask": jax.ShapeDtypeStruct((b, t_a), jnp.float32),
    }


def _bucket_levels(cfg, buckets) -> list[dict[str, int]]:
    """Diagonal bucket levels for a frozen artifact (one PROGRAM per
    level; the full-cap level is the main ``decode.jaxexport`` and is
    excluded — see ``serving.bucket_ladder_levels``)."""
    from mmbidaf_tpu.serving import bucket_ladder_levels, serving_bucket_ladders

    return bucket_ladder_levels(serving_bucket_ladders(cfg, buckets))


def export_summarizer(
    summ,
    out_dir: str,
    batch_size: int = 1,
    frame_hw: tuple[int, int] = (240, 320),
    platforms: Sequence[str] | None = None,
    buckets=None,
) -> None:
    """Export ``summ``'s end-to-end decode (greedy or beam) as an artifact.

    ``batch_size`` and ``frame_hw`` are compile-time constants of the
    exported program (XLA static shapes): requests at serve time must arrive
    at exactly these shapes (``ExportedSummarizer`` pads/chunks requests the
    way ``serve_batch_size`` serving does). ``platforms`` defaults to the
    exporting process's backend; pass ``("tpu",)`` to cross-compile for TPU
    from a CPU process.

    ``buckets`` (the live path's ``serve_buckets``: ``True`` for default
    quarter/half/full ladders, or an explicit ladder dict) additionally
    freezes one program per DIAGONAL bucket level (``_bucket_levels``) —
    the frozen counterpart of bucket-ladder serving. At serve time
    ``ExportedSummarizer`` trims each batch to the smallest level covering
    its true lengths, so short videos skip the padded VGG/MFCC compute.
    """
    from mmbidaf_tpu.serving import Summarizer
    from mmbidaf_tpu.train.checkpoint import save_config

    if not isinstance(summ, Summarizer):
        raise TypeError(f"expected a Summarizer, got {type(summ).__name__}")
    if summ.mode not in ("greedy", "beam"):
        raise ValueError(
            f"only the deterministic paths export (mode={summ.mode!r}):"
            " greedy and beam are pure functions of weights + raw batch;"
            " top-k carries an rng stream — serve it interactively via"
            " Summarizer"
        )
    if summ._audio_g_fn is not None:
        raise ValueError(
            "sp_audio serving programs route through shard_map chains and"
            " are not exportable; export a non-SP Summarizer"
        )
    mesh_meta = None
    if summ._dp and batch_size % summ._dp_shards != 0:
        raise ValueError(
            f"data_parallel export shards the batch over"
            f" {summ._dp_shards} devices: batch_size must be a multiple"
            f" (got {batch_size})"
        )
    if summ._mesh is not None:
        # Sharded export (data-parallel, tensor-parallel tp_vgg, or both):
        # freeze the GSPMD-sharded program. The artifact records the mesh
        # (axis names + shape) plus the batch axes and PER-LEAF weight
        # PartitionSpecs (tp_vgg shards the VGG classifier; everything else
        # is replicated); the serving host rebuilds an identically-shaped
        # mesh from its local devices — jax.export validates the device
        # count at call time.
        from mmbidaf_tpu.parallel.mesh import _data_axes, data_shard_count

        mesh = summ._mesh
        data_axes = list(_data_axes(mesh))
        n_batch = data_shard_count(mesh)
        # TP-only latency artifacts (no --data_parallel) may pin a batch
        # the data axes don't divide — replicate the batch in the program
        # instead of failing (the DP divisibility error above still guards
        # the explicitly data-parallel case).
        batch_axes = data_axes if batch_size % n_batch == 0 else []
        mesh_meta = {
            "axis_names": list(mesh.axis_names),
            "shape": [int(mesh.shape[a]) for a in mesh.axis_names],
            "batch_axes": batch_axes,
        }

    p_leaves, p_def = jax.tree_util.tree_flatten(summ.params)
    fe_leaves, fe_def = jax.tree_util.tree_flatten(summ.fe_params)
    n_p, n_fe = len(p_leaves), len(fe_leaves)
    # the jitted end_to_end(params, fe, raw) — greedy's returns per-step
    # log_probs [B,K,T_s]; beam's returns the best beam's total sequence
    # log-prob [B] (same (log_p, picks) pair either way)
    decode = summ._decode

    def flat_fn(*leaves):
        params = jax.tree_util.tree_unflatten(p_def, leaves[:n_p])
        fe = jax.tree_util.tree_unflatten(fe_def, leaves[n_p:n_p + n_fe])
        raw = dict(zip(_RAW_KEYS, leaves[n_p + n_fe:]))
        return decode(params, fe, raw)

    specs = _raw_specs(summ.cfg, batch_size, frame_hw)
    weight_pspecs = None
    if summ._mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        from mmbidaf_tpu.parallel.mesh import batch_sharding

        mesh = summ._mesh
        bsh = (batch_sharding(mesh) if batch_axes
               else NamedSharding(mesh, PartitionSpec(())))

        def leaf_pspec(x):
            # each weight leaf keeps the sharding the Summarizer committed
            # it with (tp_vgg: fc1/fc2 over 'model'; everything else P())
            sh = getattr(x, "sharding", None)
            if (isinstance(sh, NamedSharding)
                    and sh.mesh.axis_names == mesh.axis_names):
                return sh.spec
            return jax.sharding.PartitionSpec()

        weight_pspecs = [leaf_pspec(x) for x in p_leaves + fe_leaves]
        weight_specs = [
            jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=NamedSharding(mesh, ps)
            )
            for x, ps in zip(p_leaves + fe_leaves, weight_pspecs)
        ]

        def raw_arg_specs_for(sp):
            return [
                jax.ShapeDtypeStruct(sp[k].shape, sp[k].dtype, sharding=bsh)
                for k in _RAW_KEYS
            ]
    else:
        weight_specs = [
            jax.ShapeDtypeStruct(x.shape, x.dtype)
            for x in p_leaves + fe_leaves
        ]

        def raw_arg_specs_for(sp):
            return [sp[k] for k in _RAW_KEYS]

    kw = {} if platforms is None else {"platforms": tuple(platforms)}

    def export_program(sp):
        return jax.export.export(jax.jit(flat_fn), **kw)(
            *(weight_specs + raw_arg_specs_for(sp))
        )

    exported = export_program(specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _PROGRAM), "wb") as f:
        f.write(exported.serialize())

    # bucketed artifact: one extra frozen program per diagonal bucket level
    bucket_manifest = None
    if buckets:
        bucket_manifest = []
        for i, rungs in enumerate(_bucket_levels(summ.cfg, buckets)):
            sp_i = _raw_specs(summ.cfg, batch_size, frame_hw, rungs=rungs)
            fname = f"decode.b{i}.jaxexport"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(export_program(sp_i).serialize())
            bucket_manifest.append({
                "file": fname,
                "rungs": rungs,
                "program_sha256": _file_sha256(os.path.join(out_dir, fname)),
                "raw_inputs": [
                    {
                        "name": k,
                        "shape": list(sp_i[k].shape),
                        "dtype": str(np.dtype(sp_i[k].dtype)),
                    }
                    for k in _RAW_KEYS
                ],
            })
    # npz can't hold ml_dtypes (bfloat16) leaves — store widened to float32
    # (exact) and record the true dtype per leaf for the loader to cast back.
    weight_leaves = p_leaves + fe_leaves
    dtypes = [str(x.dtype) for x in weight_leaves]
    np.savez(
        os.path.join(out_dir, _WEIGHTS),
        **{
            f"w{i:05d}": np.asarray(
                x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x
            )
            for i, x in enumerate(weight_leaves)
        },
    )
    tp_sharded = any(
        any(e is not None for e in ps) for ps in (weight_pspecs or [])
    )
    manifest = {
        "format_version": _FORMAT_VERSION_TP if tp_sharded else _FORMAT_VERSION,
        "jax_version": jax.__version__,
        # weights and program are opaque binaries with no internal check of
        # their own pairing — a swapped/corrupted/partially-copied file must
        # fail at LOAD, not produce silently wrong summaries
        "weights_sha256": _file_sha256(os.path.join(out_dir, _WEIGHTS)),
        "program_sha256": _file_sha256(os.path.join(out_dir, _PROGRAM)),
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "frame_hw": list(frame_hw),
        "n_weight_leaves": len(weight_leaves),
        "weight_dtypes": dtypes,
        "raw_inputs": [
            {
                "name": k,
                "shape": list(specs[k].shape),
                "dtype": str(np.dtype(specs[k].dtype)),
            }
            for k in _RAW_KEYS
        ],
        # which decode program is frozen: "greedy" (log_p = per-step
        # [B,K,T_s]) or "beam" (log_p = best-beam total sequence log-prob
        # [B], beam width baked in at export). Absent in pre-beam manifests
        # (greedy was the only exportable mode then).
        "decode_mode": summ.mode,
        "beam_width": summ.topk if summ.mode == "beam" else None,
        "outputs": ["log_p", "picks"],
        "mesh": mesh_meta,  # null = single-device program
        # per-leaf PartitionSpecs (entries: null | axis | [axes]); null =
        # all-replicated weights (pre-tp_vgg artifacts load the same way)
        "weight_pspecs": None if weight_pspecs is None else [
            [list(e) if isinstance(e, (tuple, list)) else e for e in ps]
            for ps in weight_pspecs
        ],
        # bucket-ladder artifact: extra frozen programs at diagonal rung
        # levels (null/absent = single-shape artifact, pre-bucket loaders
        # ignore the extra files)
        "bucket_programs": bucket_manifest,
    }
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    save_config(out_dir, summ.cfg)
    with open(os.path.join(out_dir, _VOCAB), "w") as f:
        json.dump(summ.word2idx, f)


class ExportedDecoder:
    """The device half of an artifact: raw batch in, ``(log_p, picks)`` out.

    Depends only on jax + numpy + the artifact directory — deliberately NO
    model-building imports, so a serving host can run it without the
    framework's model code (proven by ``tests/test_export.py``'s fresh
    subprocess). Host-side preprocessing lives in ``ExportedSummarizer``.
    """

    def __init__(self, artifact_dir: str):
        with open(os.path.join(artifact_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] not in _SUPPORTED_VERSIONS:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} not in"
                f" supported {_SUPPORTED_VERSIONS}"
            )
        bucket_entries = self.manifest.get("bucket_programs") or []
        checks = [(_WEIGHTS, self.manifest.get("weights_sha256")),
                  (_PROGRAM, self.manifest.get("program_sha256"))]
        checks += [(e["file"], e["program_sha256"]) for e in bucket_entries]
        for fname, want in checks:
            if want is None:
                continue  # pre-checksum artifact
            got = _file_sha256(os.path.join(artifact_dir, fname))
            if got != want:
                raise ValueError(
                    f"{fname} does not match the manifest's sha256 — the"
                    " artifact is corrupted or its files were mixed from"
                    " different exports; re-export or re-copy it"
                )
        with open(os.path.join(artifact_dir, _PROGRAM), "rb") as f:
            self._exported = jax.export.deserialize(f.read())
        # dispatch table: (full-cap program first, then each bucket level —
        # decode_raw picks by exact input-shape match)
        self._programs = [
            {"exported": self._exported,
             "raw_inputs": self.manifest["raw_inputs"], "rungs": None},
        ]
        # smallest-first by total feature volume: _stack_rows takes the
        # FIRST covering level, and manifest entry order must not decide
        # that (a reordered/hand-merged manifest passes every sha check but
        # would silently trim short batches onto an oversized level)
        bucket_entries = sorted(
            bucket_entries,
            key=lambda e: int(np.prod(list(e["rungs"].values()))),
        )
        for e in bucket_entries:
            with open(os.path.join(artifact_dir, e["file"]), "rb") as f:
                self._programs.append({
                    "exported": jax.export.deserialize(f.read()),
                    "raw_inputs": e["raw_inputs"],
                    "rungs": e["rungs"],
                })
        self.bucket_levels = [e["rungs"] for e in bucket_entries]
        # Sharded artifacts (DP and/or tp_vgg) record the exporting mesh;
        # rebuild an identically-shaped mesh from local devices and place
        # weights per the manifest's per-leaf PartitionSpecs (tp_vgg shards
        # the VGG classifier; older/plain-DP manifests carry null = all
        # replicated) / raw inputs batch-sharded. Shardings are constructed
        # inline: the loader stays jax+numpy-only.
        self._rep = self._bsh = self._wshs = None
        mesh_meta = self.manifest.get("mesh")
        if mesh_meta is not None:
            from jax.sharding import (
                AxisType, Mesh, NamedSharding, PartitionSpec,
            )

            n_dev = int(np.prod(mesh_meta["shape"]))
            devices = jax.devices()
            if len(devices) < n_dev:
                raise ValueError(
                    f"artifact was exported for a {mesh_meta['shape']} mesh"
                    f" ({n_dev} devices); this host has {len(devices)}"
                )
            names = tuple(mesh_meta["axis_names"])
            mesh = Mesh(
                np.asarray(devices[:n_dev]).reshape(mesh_meta["shape"]),
                names,
                axis_types=(AxisType.Auto,) * len(names),
            )
            self._rep = NamedSharding(mesh, PartitionSpec())
            self._bsh = NamedSharding(
                mesh, PartitionSpec(tuple(mesh_meta["batch_axes"]))
            )
            pspecs = self.manifest.get("weight_pspecs")
            if pspecs is not None:
                if len(pspecs) != self.manifest["n_weight_leaves"]:
                    # zip() below would silently leave tail weights
                    # unplaced — a hand-edited/mixed manifest must fail
                    # at load, not produce a half-sharded program
                    raise ValueError(
                        f"manifest weight_pspecs has {len(pspecs)} entries"
                        f" for {self.manifest['n_weight_leaves']} weight"
                        " leaves — corrupted or mixed artifact"
                    )
                self._wshs = [
                    NamedSharding(mesh, PartitionSpec(*[
                        tuple(e) if isinstance(e, list) else e for e in ps
                    ]))
                    for ps in pspecs
                ]
        npz = np.load(os.path.join(artifact_dir, _WEIGHTS))
        n = self.manifest["n_weight_leaves"]
        dtypes = self.manifest["weight_dtypes"]
        self._weights = [
            jnp.asarray(npz[f"w{i:05d}"]).astype(dtypes[i]) for i in range(n)
        ]
        if self._rep is not None:
            shs = self._wshs or [self._rep] * n
            self._weights = [
                jax.device_put(w, sh) for w, sh in zip(self._weights, shs)
            ]
        self.batch_size = self.manifest["batch_size"]
        self.frame_hw = tuple(self.manifest["frame_hw"])
        # pre-beam artifacts have no decode_mode key; they froze greedy
        self.decode_mode = self.manifest.get("decode_mode", "greedy")

    def _select_program(self, raw: Mapping[str, np.ndarray]) -> dict:
        """The frozen program whose input shapes exactly match ``raw``
        (single-shape artifacts have one; bucketed ones add a program per
        rung level)."""
        for prog in self._programs:
            if all(
                s["name"] in raw
                and tuple(raw[s["name"]].shape) == tuple(s["shape"])
                for s in prog["raw_inputs"]
            ):
                return prog
        missing = [s["name"] for s in self.manifest["raw_inputs"]
                   if s["name"] not in raw]
        if missing:
            raise KeyError(f"raw batch is missing {missing[0]!r}")
        got = {s["name"]: tuple(raw[s["name"]].shape)
               for s in self.manifest["raw_inputs"]}
        options = [
            {s["name"]: tuple(s["shape"]) for s in prog["raw_inputs"]}
            for prog in self._programs
        ]
        raise ValueError(
            f"raw batch shapes {got} match none of the artifact's frozen"
            f" programs: {options} (batch_size/frame_hw/bucket rungs are"
            " compile-time constants — re-export for other shapes)"
        )

    def decode_raw(self, raw: Mapping[str, np.ndarray]):
        """Run the exported program matching the batch's shapes."""
        prog = self._select_program(raw)
        args = list(self._weights)
        for spec in prog["raw_inputs"]:
            arr = raw[spec["name"]]
            if not isinstance(arr, jax.Array):
                # host input: validate + cast on host, one upload
                arr = np.asarray(arr)
            # already-on-device arrays (e.g. DynamicBatcher's stacked batch)
            # stay on device: np.asarray here would add a D2H+H2D round trip
            # of the whole batch through the host
            val = (arr.astype(spec["dtype"])
                   if str(arr.dtype) != spec["dtype"]
                   else jnp.asarray(arr))
            if self._bsh is not None:
                val = jax.device_put(val, self._bsh)
            args.append(val)
        log_p, picks = prog["exported"].call(*args)
        return np.asarray(log_p), np.asarray(picks)

    def warmup(self) -> None:
        """Compile the artifact's program(s) for this backend up front.

        ``jax.export`` freezes tracing, not backend compilation: the first
        ``call`` still pays XLA compile for the local device. One zero batch
        per frozen program (full-cap + every bucket level) flushes that
        (pair with a persistent compilation cache for warm restarts)."""
        for prog in self._programs:
            raw = {
                s["name"]: np.zeros(s["shape"], s["dtype"])
                for s in prog["raw_inputs"]
            }
            self.decode_raw(raw)


class ExportedSummarizer:
    """Full serving from an artifact: video dirs in, summary text out.

    Pairs ``ExportedDecoder`` with the framework's host-side preprocessing
    (container decode + tokenize — ``serving.host_raw_row``) and pick
    assembly; behaves like ``Summarizer.summarize_batch`` with
    ``serve_batch_size = artifact batch_size`` (requests padded by repeating
    the last video, chunked to the pinned static shape).
    """

    def __init__(self, artifact_dir: str):
        import threading

        from mmbidaf_tpu.config import config_from_json

        self.decoder = ExportedDecoder(artifact_dir)
        self.cfg = config_from_json(os.path.join(artifact_dir, _CONFIG))
        with open(os.path.join(artifact_dir, _VOCAB)) as f:
            self.word2idx = json.load(f)
        # rung-tuple → device-batch count (same observability contract as
        # the live Summarizer.bucket_stats; empty on single-shape artifacts)
        self.bucket_stats: dict[tuple, int] = {}
        self._stats_lock = threading.Lock()

    # Duck-typed private surface shared with ``Summarizer`` so
    # ``DynamicBatcher`` can coalesce requests over an artifact too.
    _dp_shards = 1  # sharding (if any) lives inside decode_raw

    @property
    def fixed_batch_size(self) -> int:
        """The artifact's compile-time batch — batchers must match it."""
        return self.decoder.batch_size

    @property
    def bucket_levels(self) -> list:
        """Frozen rung levels (smallest first) — same batcher-grouping
        contract as ``Summarizer.bucket_levels``."""
        return self.decoder.bucket_levels

    def _raw_row(self, video_dir: str) -> tuple[dict, list[str]]:
        from mmbidaf_tpu.serving import host_raw_row

        row, sents = host_raw_row(video_dir, self.word2idx, self.cfg)
        hw = row["frames"].shape[1:3]
        if tuple(hw) != self.decoder.frame_hw:
            raise ValueError(
                f"{video_dir}: decoded frames are {tuple(hw)}, artifact was"
                f" exported for frame_hw={self.decoder.frame_hw}"
            )
        return row, sents

    def _decode_batch(self, raw) -> np.ndarray:
        _, picks = self.decoder.decode_raw(raw)
        return picks

    def _stack_rows(self, rows: Sequence[dict]) -> dict:
        """Stack per-video rows into one batch; on a bucketed artifact trim
        to the smallest frozen rung LEVEL covering the batch's true lengths
        (the frozen counterpart of ``Summarizer._stack_rows`` — levels are
        whole programs, so the trim picks a level, not per-axis rungs).
        Rows trim BEFORE stacking so only the trimmed batch is allocated."""
        from mmbidaf_tpu.serving import (
            batch_true_lengths, covering_level, record_bucket_stat,
            trim_raw_to_rungs,
        )

        if self.decoder.bucket_levels:
            needs: dict[str, int] = {}
            for r in rows:
                for k, v in batch_true_lengths(r).items():
                    needs[k] = max(needs.get(k, 0), v)
            # covering_level tolerates a level missing an axis (hand-edited
            # manifest): that level never covers and the batch falls through
            # to the full-cap program instead of raising KeyError here.
            lvl = covering_level(self.decoder.bucket_levels, needs)
            if lvl >= 0:
                rungs = self.decoder.bucket_levels[lvl]
                rows = [
                    trim_raw_to_rungs(r, self.cfg, rungs, batched=False)
                    for r in rows
                ]
        raw = {k: np.stack([r[k] for r in rows]) for k in rows[0]}
        if self.decoder.bucket_levels:
            record_bucket_stat(self.bucket_stats, self._stats_lock, raw)
        return raw

    def _raw_chunk(self, chunk: list[str]) -> tuple[dict, list[list[str]]]:
        """Host-decode one chunk; PAD rows by reusing the last decoded row
        (container decode is the expensive part — never repeat it)."""
        rows, sentences = [], []
        for vd in chunk:
            row, sents = self._raw_row(vd)
            rows.append(row)
            sentences.append(sents)
        rows += [rows[-1]] * (self.decoder.batch_size - len(rows))
        return self._stack_rows(rows), sentences

    def summarize_batch(self, video_dirs: Sequence[str]) -> list[str]:
        from concurrent.futures import ThreadPoolExecutor

        from mmbidaf_tpu.train.metrics import summary_from_picks

        if not video_dirs:
            return []
        sb = self.decoder.batch_size
        chunks = [list(video_dirs[s:s + sb])
                  for s in range(0, len(video_dirs), sb)]
        out: list[str] = []
        # chunk i+1's host asset decode overlaps chunk i's device program
        # (same pipelining as Summarizer.summarize_batch)
        with ThreadPoolExecutor(max_workers=1) as ex:
            pending = ex.submit(self._raw_chunk, chunks[0])
            for i, chunk in enumerate(chunks):
                raw, sentences = pending.result()
                if i + 1 < len(chunks):
                    pending = ex.submit(self._raw_chunk, chunks[i + 1])
                _, picks = self.decoder.decode_raw(raw)
                out.extend(summary_from_picks(picks[j], sentences[j])
                           for j in range(len(chunk)))
        return out

    def summarize(self, video_dir: str) -> str:
        return self.summarize_batch([video_dir])[0]

    def summarize_long(self, video_dir: str, stride: int | None = None) -> str:
        """Windowed serving for transcripts longer than the
        ``max_sentences`` bucket, over the frozen program (mirrors
        ``Summarizer.summarize_long``: overlapping sentence windows share
        the video's global media context; per-window picks merge by
        log-prob).

        The artifact's input signature is raw frames/waveform, so every
        window chunk re-ships the (identical) media rows and re-featurizes
        them — the live Summarizer's featurize-once shortcut can't exist
        inside a frozen program. Fine on a direct-attached serving host;
        prefer live serving over thin-relay links.
        """
        from mmbidaf_tpu.data.video import audio_frames_valid, load_video_assets
        from mmbidaf_tpu.data.text import encode_sentences, sent_tokenize
        from mmbidaf_tpu.serving import (
            merge_window_picks, num_audio_samples, picks_scores,
            transcript_windows,
        )
        from mmbidaf_tpu.train.metrics import summary_from_picks

        d, m = self.cfg.data, self.cfg.model
        assets = load_video_assets(
            video_dir, d.max_keyframes, num_audio_samples(self.cfg),
            keyframe_policy=d.keyframe_policy, sample_rate=d.sample_rate,
        )
        hw = assets["frames"].shape[1:3]
        if tuple(hw) != self.decoder.frame_hw:
            raise ValueError(
                f"{video_dir}: decoded frames are {tuple(hw)}, artifact was"
                f" exported for frame_hw={self.decoder.frame_hw}"
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

        def window_row(sents):
            enc = encode_sentences(sents, self.word2idx, d.max_sentences, d.max_words)
            return {
                "text_ids": enc["text_ids"],
                "word_mask": enc["word_mask"],
                "sent_mask": enc["sent_mask"],
                **media,
            }

        sb = self.decoder.batch_size

        def decode_rows(rows):
            """Pad to the artifact's static batch and decode one chunk."""
            n_real = len(rows)
            rows = rows + [rows[-1]] * (sb - n_real)
            log_p, picks = self.decoder.decode_raw(self._stack_rows(rows))
            return picks[:n_real], picks_scores(log_p, picks)[:n_real]

        if len(sentences) <= d.max_sentences:
            picks, _ = decode_rows([window_row(sentences)])
            return summary_from_picks(picks[0], sentences)

        stride = stride or max(d.max_sentences // 2, 1)
        starts = transcript_windows(len(sentences), d.max_sentences, stride)
        rows = [window_row(sentences[start:start + d.max_sentences])
                for start in starts]
        picks_l, scores_l = [], []
        for i in range(0, len(rows), sb):
            p, s = decode_rows(rows[i:i + sb])
            picks_l.append(p)
            scores_l.append(s)
        picks = np.concatenate(picks_l)
        scores = np.concatenate(scores_l)
        window_lens = [min(d.max_sentences, len(sentences) - st) for st in starts]
        chosen = merge_window_picks(
            picks, scores, starts, window_lens, m.max_decode_steps
        )
        return " ".join(sentences[g] for g in chosen)

    def warmup(self) -> None:
        self.decoder.warmup()
