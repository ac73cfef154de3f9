"""Device-side audio frontend: framing → windowed matmul-DFT → mel → MFCC.

Replaces the reference's offline ``librosa.feature.mfcc`` (SURVEY.md §3.1
"Audio feature extraction") with a jittable on-device stage [B:5]. The DFT is
expressed as two GEMMs against precomputed real/imag basis matrices — ideal
MXU work — because ``jnp.fft`` hangs under jit on this TPU backend (SURVEY §8
risk R2: the matmul-DFT path is a requirement, not an optimization). A fused
Pallas kernel (window+DFT+mel in one pass) lives in
``mmbidaf_tpu.ops.pallas.melspec_kernel``.

Mel filterbank follows librosa's conventions (Slaney mel scale, slaney area
normalization); MFCC is DCT-II (ortho) over power-dB mel, librosa's default.
The librosa-free reference implementations vendored here are unit-tested
against ``numpy.fft`` and hand-computed filterbank invariants (librosa is not
installed in this image — SURVEY §5 item 2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy) basis construction — done once, then lives on device.
# ---------------------------------------------------------------------------

def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (librosa/scipy ``sym=False`` convention)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def dft_basis(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real/imag DFT matrices ``[n_fft, n_fft//2 + 1]`` for rfft-as-matmul."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-10)  # avoid log(0) in the unselected branch
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Triangular mel filterbank ``[n_fft//2+1, n_mels]``, slaney-normalized."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # slaney: area-normalize each filter to constant energy per channel
        fb[:, m] *= 2.0 / (hi - lo)
    return fb.astype(np.float32)


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """DCT-II with ortho norm, ``[n_in, n_out]`` (scipy.fft.dct type 2)."""
    n = np.arange(n_in)[:, None]
    k = np.arange(n_out)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    # ortho scaling
    mat[:, 0] *= np.sqrt(1.0 / (4 * n_in))
    mat[:, 1:] *= np.sqrt(1.0 / (2 * n_in))
    return mat.astype(np.float32)


def make_audio_frontend_consts(
    sample_rate: int,
    n_fft: int,
    win_length: int,
    n_mels: int,
    n_mfcc: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> dict:
    """All constant matrices for the device-side frontend, as one pytree."""
    window = hann_window(win_length)
    cos_b, sin_b = dft_basis(n_fft)
    # Fold the window and zero-padding (win_length → n_fft) into the DFT
    # basis: frames @ (diag(window) · pad · [cos|sin]) — so the jitted path
    # is exactly two GEMMs per {cos, sin}.
    cos_w = (window[:, None] * cos_b[:win_length, :]).astype(np.float32)
    sin_w = (window[:, None] * sin_b[:win_length, :]).astype(np.float32)
    return {
        "cos": jnp.asarray(cos_w),
        "sin": jnp.asarray(sin_w),
        "mel_fb": jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)),
        "dct": jnp.asarray(dct_matrix(n_mels, n_mfcc)),
    }


# ---------------------------------------------------------------------------
# Jittable device-side pipeline.
# ---------------------------------------------------------------------------

def frame_signal(signal: jax.Array, win_length: int, hop_length: int, num_frames: int) -> jax.Array:
    """``[B, N] → [B, T, win]`` frames at fixed hop (static shapes; the caller
    pads/truncates the waveform to cover ``num_frames``)."""
    idx = jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(win_length)[None, :]
    return signal[:, idx]


def power_spectrum(frames: jax.Array, consts: dict, fft: str = "matmul") -> jax.Array:
    """Windowed rfft-as-matmul power spectrum: ``[B, T, win] → [B, T, bins]``.

    ``fft="stockham"`` computes the same quantity with the radix-2
    Stockham FFT instead of the 3-GEMM matmul-DFT: O(N log N) on the VPU
    and — decisively — TRUE f32 end to end (~3e-7 relative), where the
    GEMMs run at the MXU's bf16 input precision (~2-4e-3 on chip). Pick it
    for accuracy-sensitive configs (``DataConfig.audio_fft``); speed A/B
    lives in experiments/fft_ab.py."""
    if fft == "stockham":
        return stockham_power_spectrum(frames, consts)
    if fft != "matmul":
        raise ValueError(f"unknown fft {fft!r} (matmul | stockham)")
    re = frames @ consts["cos"]
    im = frames @ consts["sin"]
    return re * re + im * im


def stockham_stages(n_fft: int) -> list:
    """Per-stage twiddle constants (n, m, wr, wi) for the autosort radix-2
    Stockham FFT — no bit reversal: every stage is a static reshape +
    butterfly + twiddle multiply, XLA-friendly and ``jnp.fft``-free
    (jnp.fft hangs under jit on the axon backend, CLAUDE.md)."""
    stages = []
    n = n_fft
    while n > 1:
        m = n // 2
        ang = -2.0 * np.pi * np.arange(m) / n
        stages.append((n, m,
                       np.cos(ang).astype(np.float32)[:, None],
                       np.sin(ang).astype(np.float32)[:, None]))
        n = m
    return stages


def stockham_power_spectrum(frames: jax.Array, consts: dict) -> jax.Array:
    """Windowed power spectrum via the Stockham FFT: ``[..., win] →
    [..., n_fft//2+1]``. The Hann window and win→n_fft zero pad fold into
    the first touch, mirroring the folded-window matmul-DFT consts."""
    n_bins = consts["cos"].shape[1]
    n_fft = 2 * (n_bins - 1)
    if n_fft & (n_fft - 1):
        raise ValueError(f"stockham needs a power-of-two n_fft, got {n_fft}")
    win = frames.shape[-1]
    window = np.zeros(n_fft, np.float32)
    window[:win] = hann_window(win)

    lead = frames.shape[:-1]
    N = 1
    for d in lead:
        N *= d
    re = jnp.pad(frames.reshape(N, win), ((0, 0), (0, n_fft - win)))
    re = re * jnp.asarray(window)
    im = jnp.zeros_like(re)
    s = 1
    for (n, m, wr, wi) in stockham_stages(n_fft):
        ar = re.reshape(N, n, s)[:, :m]
        ai = im.reshape(N, n, s)[:, :m]
        br = re.reshape(N, n, s)[:, m:]
        bi = im.reshape(N, n, s)[:, m:]
        # butterfly: top = a + b ; bottom = (a - b) * w
        dr, di = ar - br, ai - bi
        tr = jnp.stack([ar + br, dr * wr - di * wi], axis=2)
        ti = jnp.stack([ai + bi, dr * wi + di * wr], axis=2)
        re = tr.reshape(N, n_fft)
        im = ti.reshape(N, n_fft)
        s *= 2
    out = re[:, :n_bins] ** 2 + im[:, :n_bins] ** 2
    return out.reshape(*lead, n_bins)


def melspectrogram(frames: jax.Array, consts: dict, fft: str = "matmul") -> jax.Array:
    return power_spectrum(frames, consts, fft=fft) @ consts["mel_fb"]


def log_power(s: jax.Array) -> jax.Array:
    """``10*log10(max(s, amin))`` — the dB core shared by power_to_db and
    the sequence-parallel frontend (which needs the reference max computed
    across shards before subtracting)."""
    return 10.0 * jnp.log10(jnp.maximum(s, 1e-10))


def power_to_db(s: jax.Array, top_db: float = 80.0, ref: jax.Array | None = None) -> jax.Array:
    """librosa.power_to_db with ref=max over each example's spectrogram
    (pass ``ref`` explicitly when the max must come from elsewhere, e.g. a
    cross-shard pmax)."""
    log_spec = log_power(s)
    if ref is None:
        ref = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    return jnp.maximum(log_spec - ref, -top_db)


def log_mel(frames: jax.Array, consts: dict, eps: float = 1e-6,
            fft: str = "matmul") -> jax.Array:
    """Natural-log mel (the common NN frontend variant)."""
    return jnp.log(melspectrogram(frames, consts, fft=fft) + eps)


def mfcc(frames: jax.Array, consts: dict, fft: str = "matmul") -> jax.Array:
    """MFCC: DCT-II(ortho) over power-dB mel.

    NOTE this is librosa's *shape* of pipeline but with ``ref=max`` dB
    scaling (librosa's default is ``ref=1.0``; its max only enters the
    top_db clamp) — so the 0th coefficient carries a per-example constant
    offset vs actual-librosa features. Parity holds against the vendored
    torch oracle (the project's reference contract), NOT against features
    precomputed with real librosa; don't mix the two in one corpus."""
    return power_to_db(melspectrogram(frames, consts, fft=fft)) @ consts["dct"]


@partial(jax.jit, static_argnames=("win_length", "hop_length", "num_frames", "feature", "fused", "fft"))
def waveform_to_features(
    signal: jax.Array,
    consts: dict,
    win_length: int,
    hop_length: int,
    num_frames: int,
    feature: str = "mfcc",
    fused: bool = False,
    fft: str = "matmul",
) -> jax.Array:
    """End-to-end device-side audio frontend: ``[B, N] → [B, T, n_feat]``.

    ``fused=True`` routes the window∘DFT∘|·|²∘mel front through the single
    Pallas pass (`ops.pallas.melspec_kernel`) — the power spectrum never
    touches HBM and the op-dispatch chain collapses; the tiny dB/DCT (or
    log) tail stays in jnp. Numerically identical math in f32.
    """
    frames = frame_signal(signal, win_length, hop_length, num_frames)
    if fft == "stockham" and fused:
        # the fused Pallas melspec is matmul-DFT inside; the accuracy-first
        # FFT path stays on the (already fast) unfused chain
        fused = False
    if fused:
        from mmbidaf_tpu.ops.pallas.melspec_kernel import (
            log_mel_fused,
            mfcc_fused,
            mfcc_fused_fits,
        )

        if feature == "logmel":
            return log_mel_fused(frames, consts, log=True)
        if feature == "mfcc":
            if mfcc_fused_fits(
                num_frames, win_length,
                consts["cos"].shape[1], consts["mel_fb"].shape[1],
            ):
                # whole MFCC (incl. the global-max dB ref) in one Pallas
                # pass per example — the B=1 audio path was per-op dispatch
                # overhead, not op-chain work (docs/KERNELS.md)
                return mfcc_fused(frames, consts)
            mel = log_mel_fused(frames, consts, log=False)
            return power_to_db(mel) @ consts["dct"]
        raise ValueError(f"unknown feature {feature!r}")
    if feature == "mfcc":
        return mfcc(frames, consts, fft=fft)
    if feature == "logmel":
        return log_mel(frames, consts, fft=fft)
    raise ValueError(f"unknown feature {feature!r}")
