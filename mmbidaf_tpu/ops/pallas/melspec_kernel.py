"""Fused Pallas mel-spectrogram / MFCC kernel (SURVEY.md §3.2 row 3).

Fuses window ∘ DFT (as two GEMMs) ∘ |·|² ∘ mel filterbank ∘ log into one
pass over frame tiles: the ``[N, n_fft/2+1]`` power spectrum never leaves
VMEM (the jnp version writes it to HBM between GEMMs). This is the Pallas
FFT path required because ``jnp.fft`` hangs under jit on this backend
(SURVEY §8 risk R2 Plan A; the plain-jnp matmul-DFT is Plan B and the parity
reference).

Grid: tiles of TILE_N frames; the windowed-DFT bases and mel filterbank are
broadcast to every program (they are small: [win, bins] + [bins, n_mels]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _melspec_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, log: bool):
    frames = frames_ref[:]            # [TILE, win]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im         # [TILE, bins] — stays in VMEM
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + 1e-6) if log else mel


@partial(jax.jit, static_argnames=("tile_n", "interpret", "log"))
def log_mel_fused(
    frames: jax.Array,
    consts: dict,
    tile_n: int = 128,
    interpret: bool | None = None,
    log: bool = True,
) -> jax.Array:
    """``[..., win] → [..., n_mels]`` fused single pass: natural-log mel
    (``log=True``, the NN-frontend variant) or raw mel power (``log=False``
    — the MFCC path applies its global-max dB + DCT outside, which is tiny).

    Leading dims are flattened into the frame axis and padded to a tile
    multiple (padded rows are discarded on return). ``interpret=None``
    auto-selects interpreter mode off-TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    *lead, win = frames.shape
    n = 1
    for s in lead:
        n *= s
    flat = frames.reshape(n, win).astype(jnp.float32)
    n_pad = -n % tile_n
    if n_pad:
        flat = jnp.concatenate([flat, jnp.zeros((n_pad, win), jnp.float32)], axis=0)
    n_total = flat.shape[0]
    n_mels = consts["mel_fb"].shape[1]
    bins = consts["cos"].shape[1]

    grid_spec = pl.GridSpec(
        grid=(n_total // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, bins), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        partial(_melspec_kernel, log=log),
        out_shape=jax.ShapeDtypeStruct((n_total, n_mels), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * win * bins * 2 + 2 * n_total * bins * n_mels,
            bytes_accessed=4 * (n_total * win + 2 * win * bins + bins * n_mels + n_total * n_mels),
            transcendentals=n_total * n_mels,
        ),
    )(flat, consts["cos"], consts["sin"], consts["mel_fb"])
    return out[:n].reshape(*lead, n_mels)


def _mfcc_kernel(frames_ref, cos_ref, sin_ref, mel_ref, dct_ref, out_ref):
    """One batch example per program: window∘DFT∘|·|²∘mel∘dB(global max)∘DCT
    entirely in VMEM. The per-example dB reference (librosa's ref=max) is
    what forces whole-example programs — a frame-tiled grid would need a
    cross-tile max pass (this is ROADMAP round-2 open item 4, closed)."""
    frames = frames_ref[0]            # [T, win]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im         # [T, bins] — never leaves VMEM
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    logspec = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(logspec - jnp.max(logspec), -80.0)
    out_ref[0] = jnp.dot(db, dct_ref[:], preferred_element_type=jnp.float32)


# whole-example VMEM budget (bytes): frames [T, win] plus the re/im/power
# residents [T, bins] are the big VMEM tenants; past this, fall back to the
# tiled mel kernel + jnp dB/DCT tail (audio.py). Serving shapes (T=512,
# win=400, bins=257) use ~2.5 MB; the 4096-frame long-audio config (~20 MB)
# correctly falls back.
_MFCC_FUSED_MAX_BYTES = 8 * 1024 * 1024


def mfcc_fused_fits(num_frames: int, win_length: int, n_bins: int, n_mels: int) -> bool:
    """Whether the whole-example kernel's VMEM residents fit the budget."""
    per_example = 4 * num_frames * (win_length + 3 * n_bins + n_mels)
    return per_example <= _MFCC_FUSED_MAX_BYTES


@partial(jax.jit, static_argnames=("interpret",))
def mfcc_fused(frames: jax.Array, consts: dict, interpret: bool | None = None) -> jax.Array:
    """``[B, T, win] → [B, T, n_mfcc]`` librosa-default MFCC in ONE Pallas
    pass per example (incl. the per-example global-max dB reference).
    Numerically identical math to ``ops.audio.mfcc`` in f32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, win = frames.shape
    bins = consts["cos"].shape[1]
    n_mels = consts["mel_fb"].shape[1]
    n_mfcc = consts["dct"].shape[1]

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, win), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, bins), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, bins), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins, n_mels), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, n_mfcc), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, n_mfcc), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _mfcc_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, n_mfcc), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=B * (2 * T * win * bins * 2 + 2 * T * bins * n_mels
                       + 2 * T * n_mels * n_mfcc),
            bytes_accessed=4 * B * (T * win + T * n_mfcc)
            + 4 * (2 * win * bins + bins * n_mels + n_mels * n_mfcc),
            transcendentals=B * T * n_mels,
        ),
    )(frames.astype(jnp.float32), consts["cos"], consts["sin"],
      consts["mel_fb"], consts["dct"])
