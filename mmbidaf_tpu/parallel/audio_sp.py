"""Sequence-parallel audio frontend (SURVEY.md §3.3 "SP/CP" row).

The one genuinely long sequence in the pipeline is the raw waveform
(~minutes × 16 kHz). Model sequences don't need SP, but the frame axis of
the mel/MFCC stage shards cleanly: each device computes the windowed
matmul-DFT → mel for its contiguous slab of frames via ``shard_map``, and
the result either stays frame-sharded (feeding a frame-sharded BiLSTM is
future work) or is ``all_gather``-ed over ICI.

Because frames at slab boundaries need ``win_length - hop`` samples of
lookahead, each shard loads its slab of the *waveform* with a static halo;
the waveform is replicated per batch row here (it is small relative to
HBM), so the "halo exchange" is a local slice — the shard_map expresses the
compute partitioning, XLA inserts the gather collective at the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmbidaf_tpu.ops.audio import frame_signal, log_power, melspectrogram, power_to_db


def make_sp_audio_frontend(
    mesh: Mesh,
    consts: dict,
    win_length: int,
    hop_length: int,
    num_frames: int,
    feature: str = "mfcc",
    axis: str | None = None,
    gather: bool = True,
    batch_axis: str | tuple[str, ...] | None = None,
):
    """Build a jitted ``[B, N] waveform → [B, num_frames, n_feat]`` frontend
    whose frame axis is computed shard-parallel over ``axis`` (default: the
    mesh's last axis).

    ``gather=True`` all-gathers the features at the stage boundary (for the
    replicated-activation model). ``gather=False`` leaves them FRAME-SHARDED
    — feeding a sequence-parallel BiLSTM (`sp_lstm.py`) and ring attention
    without ever materializing the long axis on one device; MFCC's
    per-example global dB reference becomes a ``pmax`` over the mesh axis.

    ``batch_axis`` additionally shards the batch dim over that mesh axis
    (DP × SP composition on a ``('data', 'seq')`` mesh).
    """
    axis = axis or mesh.axis_names[-1]
    n_dev = mesh.shape[axis]
    if num_frames % n_dev:
        raise ValueError(
            f"SP audio frontend: num_frames {num_frames} must be divisible "
            f"by the {n_dev}-device {axis!r} mesh axis — pad the frame "
            f"bucket (DataConfig.max_audio_frames) to a multiple of {n_dev}"
        )
    frames_per_dev = num_frames // n_dev
    if feature not in ("mfcc", "logmel"):
        raise ValueError(f"unknown feature {feature!r}")
    bspec = batch_axis  # leading-dim entry in the PartitionSpecs below

    def local_mel(signal: jax.Array) -> jax.Array:
        # signal arrives replicated: [B, N]; each device computes its slab.
        # Frames at slab boundaries need win-hop samples of lookahead; the
        # halo is a local slice of the replicated waveform.
        idx = jax.lax.axis_index(axis)
        start = idx * frames_per_dev * hop_length
        slab_len = (frames_per_dev - 1) * hop_length + win_length
        slab = jax.lax.dynamic_slice_in_dim(signal, start, slab_len, axis=1)
        frames = frame_signal(slab, win_length, hop_length, frames_per_dev)
        return melspectrogram(frames, consts)  # [B, frames_per_dev, n_mels]

    if gather:
        sharded = shard_map(
            local_mel,
            mesh=mesh,
            in_specs=P(bspec),            # waveform replicated over seq
            out_specs=P(bspec, axis),     # frame axis sharded over the mesh
            check_rep=False,
        )

        @jax.jit
        def frontend(signal: jax.Array) -> jax.Array:
            mel = sharded(signal)
            # Gather the frame axis for the (replicated-activation) model;
            # MFCC's dB/DCT tail runs after the gather (it is tiny).
            mel = jax.lax.with_sharding_constraint(mel, NamedSharding(mesh, P(bspec)))
            if feature == "logmel":
                return jnp.log(mel + 1e-6)
            return power_to_db(mel) @ consts["dct"]

        return frontend

    def local_features(signal: jax.Array) -> jax.Array:
        mel = local_mel(signal)
        if feature == "logmel":
            return jnp.log(mel + 1e-6)
        # power_to_db with the per-example GLOBAL max: local max + pmax
        # (constants single-sourced in ops.audio).
        ref = jax.lax.pmax(
            jnp.max(log_power(mel), axis=(-2, -1), keepdims=True), axis
        )
        return power_to_db(mel, ref=ref) @ consts["dct"]

    sharded_full = shard_map(
        local_features,
        mesh=mesh,
        in_specs=P(bspec),
        out_specs=P(bspec, axis),
        check_rep=False,
    )
    return jax.jit(sharded_full)
