"""A/B: radix-2 Stockham FFT vs the production matmul-DFT power spectrum.

SURVEY.md:169 ships the matmul-DFT (3 GEMMs ride the MXU) and leaves a
true FFT as the long-audio question; VERDICT r3 item 8 asks for the A/B at
n_fft >= 2048.  The FFT here is a Stockham autosort radix-2 (no bit
reversal — every stage is a static reshape + butterfly + twiddle multiply,
XLA-friendly, jnp.fft-free: jnp.fft HANGS on this backend, CLAUDE.md).

FLOP story: matmul-DFT costs ~2*N*n_fft*(n_fft+2) MACs/frame-batch on the
MXU (~150 TF/s); the FFT costs ~5*N*n_fft*log2(n_fft) FLOPs but runs on
the VPU at HBM-ish rates.  Crossover is where the MXU's rate advantage
(~20-50x) loses to the FLOP ratio (n_fft / (2.5*log2 n_fft)).

Run: timeout 2400 python experiments/fft_ab.py          # TPU
     PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/fft_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops import audio


def stockham_stages(n_fft: int):
    """Per-stage twiddle constants (wr, wi) for the autosort radix-2 FFT."""
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


def make_fft_power(n_fft: int, win_length: int):
    """frames [N, win] -> power spectrum [N, n_fft//2+1] via Stockham FFT.

    Real input: the imaginary part starts at zero; the window and the
    win->n_fft zero pad are folded into the first touch, mirroring the
    folded-window matmul-DFT (ops/audio.py::make_audio_frontend_consts).
    """
    stages = stockham_stages(n_fft)
    window = np.zeros(n_fft, np.float32)
    window[:win_length] = audio.hann_window(win_length)
    w_const = jnp.asarray(window)
    n_bins = n_fft // 2 + 1

    def fft_power(frames: jax.Array) -> jax.Array:
        N = frames.shape[0]
        re = jnp.pad(frames, ((0, 0), (0, n_fft - frames.shape[1]))) * w_const
        im = jnp.zeros_like(re)
        s = 1
        for (n, m, wr, wi) in stages:
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
        return re[:, :n_bins] ** 2 + im[:, :n_bins] ** 2

    return fft_power


def slope_time(step, x, iters=8):
    """Chained-dispatch slope timing (block_until_ready is a no-op on the
    relay backend — bench.py::bench_jax method)."""
    acc0 = jnp.float32(0.0)
    t0 = time.perf_counter()
    jax.device_get(step(x, acc0))
    compile_s = time.perf_counter() - t0

    def run(m):
        acc = acc0
        t0 = time.perf_counter()
        for _ in range(m):
            acc = step(x, acc)
        jax.device_get(acc)
        return time.perf_counter() - t0

    run(1)
    t_lo = min(run(2), run(2))
    t_hi = min(run(2 + iters), run(2 + iters))
    return (t_hi - t_lo) / iters, compile_s


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(()) + 1.0)
    print(f"claim: {time.perf_counter() - t0:.1f}s", flush=True)

    N = 512  # frames per batch (serving audio bucket)
    rng = np.random.default_rng(0)
    for n_fft in (512, 2048, 4096):
        win = n_fft if n_fft > 512 else 400  # long-audio: full-size windows
        frames_np = (rng.standard_normal((N, win)) * 0.1).astype(np.float32)
        frames = jnp.asarray(frames_np)

        consts = {k: jnp.asarray(v) for k, v in
                  audio.make_audio_frontend_consts(
                      16000, n_fft, win, 64, 40).items()}
        fft_power = make_fft_power(n_fft, win)

        # host ground truth: windowed rfft power
        w = np.zeros(n_fft, np.float32)
        w[:win] = audio.hann_window(win)
        pad = np.pad(frames_np, ((0, 0), (0, n_fft - win))) * w
        want = np.abs(np.fft.rfft(pad, axis=1)) ** 2

        got_mm = np.asarray(jax.jit(audio.power_spectrum)(frames, consts))
        got_ff = np.asarray(jax.jit(fft_power)(frames))
        scale = want.max()
        err_mm = np.max(np.abs(got_mm - want)) / scale
        err_ff = np.max(np.abs(got_ff - want)) / scale
        assert err_ff < 1e-4, ("stockham wrong", n_fft, err_ff)

        def step_mm(x, acc):
            return acc + audio.power_spectrum(x + acc * 0, consts).sum()

        def step_ff(x, acc):
            return acc + fft_power(x + acc * 0).sum()

        t_mm, c_mm = slope_time(jax.jit(step_mm), frames)
        t_ff, c_ff = slope_time(jax.jit(step_ff), frames)
        macs = 2 * N * n_fft * (n_fft // 2 + 1)
        flops_fft = 5 * N * n_fft * np.log2(n_fft)
        print(f"n_fft={n_fft:5d} win={win:5d} | "
              f"matmul-DFT {t_mm*1e3:7.3f} ms ({2*macs/t_mm/1e12:6.2f} TF/s, "
              f"rel_err {err_mm:.1e}) | "
              f"stockham-FFT {t_ff*1e3:7.3f} ms ({flops_fft/t_ff/1e12:6.2f} "
              f"TF/s, rel_err {err_ff:.1e}) | "
              f"fft/matmul speed {t_mm/t_ff:5.2f}x "
              f"(compiles {c_mm:.0f}s/{c_ff:.0f}s)", flush=True)


def _install_sigterm():
    import signal

    def _h(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _h)


if __name__ == "__main__":
    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        print("fft_ab interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
