"""Flag-driven sharded audio tower: the product wiring for SP (SURVEY.md
§3.3 "SP/CP" row — "YES as an option for the audio FFT stage").

``MeshConfig.sp_audio`` routes the audio tower through the proven chain

    waveform [B, N] ── SP-MFCC (gather=False) ──> features  [B, T_a, n_mfcc]
                    ── SP-BiLSTM              ──> encodings [B, T_a, 2h]
                    ── ring BiDAF             ──> G_ta      [B, T_s, 8h]

with the frame axis sharded over the mesh's ``seq`` axis and never gathered
(the long axis stays resident per device; collectives are the ppermute ring
hops + the dB-reference pmax). Batch stays sharded over ``data``, so DP × SP
composes on a ``('data', 'seq')`` mesh.

Dtype story (decided here, tested in tests/test_sp_product.py): the SP
frontend and ring attention compute in f32 internally regardless of
``ModelConfig.compute_dtype`` — the matmul-DFT and the flash softmax stats
need f32 range — and operands are cast at the stage boundaries; the
SP-BiLSTM runs in the compute dtype like its local counterpart.

The returned ``audio_g_fn(params, text_enc, batch)`` plugs into
``mmbidaf_fused_reps`` in place of the local
``aud_lstm → att_aud`` pair; ``batch`` must carry the raw ``waveform``
(the local path's device-side MFCC featurization moves inside the tower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.ops.audio import make_audio_frontend_consts
from mmbidaf_tpu.parallel.audio_sp import make_sp_audio_frontend
from mmbidaf_tpu.parallel.ring_attention import make_ring_bidaf
from mmbidaf_tpu.parallel.sp_lstm import make_sp_bilstm


def sp_axes(mesh: Mesh, cfg: Config) -> tuple[str, tuple[str, ...] | None]:
    """(seq_axis, batch_axes) for the SP tower on this mesh.

    The seq axis is ``cfg.mesh.seq_axis`` when the mesh has one (the
    DP × SP product), else the mesh's last axis (a pure-SP serving mesh
    built by hand). The batch axes are EVERY other >1-wide axis EXCEPT the
    TP ``model`` axis (it shards weights, never the batch) — on a
    multi-host ``('dcn', 'data', 'seq')`` mesh the batch dim is sharded
    over ``('dcn', 'data')`` (same rule as ``parallel.mesh._data_axes``);
    naming only ``data`` would silently all-gather the batch across hosts
    at the shard_map boundary, and naming ``model`` would demand a batch
    divisible by axes that don't carry it.
    """
    m = cfg.mesh
    if m.seq_axis in mesh.axis_names:
        seq = m.seq_axis
    elif m.model_axis in mesh.axis_names:
        # the last-axis fallback would silently repurpose the TP weight
        # axis as sequence parallelism (audio frames shard_mapped over
        # weight shards) — demand an explicit seq axis instead
        raise ValueError(
            "sp_audio on a mesh with a 'model' (TP) axis needs an explicit"
            " 'seq' axis: set MeshConfig.num_seq > 1"
        )
    else:
        seq = mesh.axis_names[-1]
    batch = tuple(
        a for a in mesh.axis_names
        if a not in (seq, m.model_axis) and mesh.shape[a] > 1
    )
    return seq, (batch or None)


def make_sp_audio_tower(mesh: Mesh, cfg: Config, use_batch_axis: bool = True):
    """Build ``audio_g_fn(params, text_enc, batch, drop, rng) → G_ta``.

    ``batch`` needs ``waveform [B, n_samples]``, ``aud_mask [B, T_a]`` and
    ``sent_mask [B, T_s]``; ``text_enc`` is the sentence tower's output
    (any float dtype — cast at the ring boundary). ``drop``/``rng`` carry
    the training-path dropout (similarity-only, reference semantics); with
    ``rng=None`` the lean no-dropout ring runs.

    ``use_batch_axis=False`` keeps the batch replicated inside the SP
    stages — the serving configuration, where request batches (often B=1)
    need not divide the ``data`` axis; training passes True (shard_batch
    guarantees divisibility there).
    """
    d, m = cfg.data, cfg.model
    axis, batch_axis = sp_axes(mesh, cfg)
    if not use_batch_axis:
        batch_axis = None
    consts = make_audio_frontend_consts(
        d.sample_rate, d.n_fft, d.win_length, d.n_mels, d.n_mfcc, d.fmin, d.fmax
    )
    # frontends are built per frame-axis length at trace time (bucketed
    # batches carry trimmed audio axes; each bucket shape jits once)
    frontends: dict[int, object] = {}

    def frontend_for(num_frames: int):
        fe = frontends.get(num_frames)
        if fe is None:
            fe = frontends[num_frames] = make_sp_audio_frontend(
                mesh, consts, d.win_length, d.hop_length, num_frames,
                feature=d.audio_features, axis=axis, gather=False,
                batch_axis=batch_axis,
            )
        return fe

    frontend_for(d.max_audio_frames)  # validate the static bucket eagerly
    sp_lstm = make_sp_bilstm(mesh, axis=axis, batch_axis=batch_axis)
    ring = make_ring_bidaf(mesh, axis=axis, batch_axis=batch_axis)
    ring_drop = make_ring_bidaf(mesh, axis=axis, batch_axis=batch_axis, dropout=True)
    compute_dtype = jnp.dtype(m.compute_dtype)

    def audio_g_fn(params: dict, text_enc, batch, drop: float = 0.0, rng=None):
        aud_mask = batch["aud_mask"].astype(jnp.float32)
        # frontend in f32 (matmul-DFT numerics), like the local path where
        # featurization precedes the model's compute-dtype cast
        feats = frontend_for(aud_mask.shape[1])(batch["waveform"].astype(jnp.float32))
        feats = feats * aud_mask[:, :, None]
        # Stacked aud_lstm (ModelConfig.num_rnn_layers > 1): each layer runs
        # the SP wavefront pipeline on the still-sharded frame axis; the
        # model's encoders carry no inter-layer dropout (ops/lstm.py).
        aud_p = params["aud_lstm"]
        enc = feats.astype(compute_dtype)
        m_c = aud_mask.astype(compute_dtype)
        for lp in (aud_p["layers"] if "layers" in aud_p else [aud_p]):
            enc = sp_lstm(lp, enc, m_c)
        sent_mask = batch["sent_mask"]
        if rng is not None and drop > 0.0:
            # Same rng split + full-shape bernoulli as the local
            # similarity_matrix (ops/bidaf.py) — exact dropout parity; the
            # dropped copies feed ONLY the similarity inside the ring.
            rc, rq = jax.random.split(rng)
            keep = 1.0 - drop
            cd = text_enc * jax.random.bernoulli(rc, keep, text_enc.shape) / keep
            qd = enc * jax.random.bernoulli(rq, keep, enc.shape) / keep
            g = ring_drop(
                params["att_aud"], text_enc, enc, cd, qd, sent_mask, aud_mask
            )
        else:
            g = ring(params["att_aud"], text_enc, enc, sent_mask, aud_mask)
        return g.astype(compute_dtype)

    return audio_g_fn
