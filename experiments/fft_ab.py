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

Run: timeout 2400 python experiments/fft_ab.py          # TPU (r4 shapes)
     timeout 3600 python experiments/fft_ab.py --frames 8192 --iters 24
     PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/fft_ab.py

--frames/--iters run the DECISIVE long-audio experiment (VERDICT r4 weak
3): at N=512 the programs are sub-ms and the 8-iter slope drowns in relay
noise; 8k-frame batches with longer dispatch chains give the slope real
signal. Timing batches are generated ON DEVICE (H2D of a 128 MB batch
through the ~1 MB/s relay would swamp the run); numerics parity vs
np.fft.rfft stays host-checked at 512 frames.
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


def make_fft_power(n_fft: int, win_length: int):
    """frames [N, win] -> power spectrum via the PRODUCTION Stockham path
    (ops/audio.py::stockham_power_spectrum — wired product-side behind
    DataConfig.audio_fft="stockham"; this harness only times it)."""
    n_bins = n_fft // 2 + 1
    consts = {"cos": jnp.zeros((win_length, n_bins), jnp.float32)}

    def fft_power(frames: jax.Array) -> jax.Array:
        return audio.stockham_power_spectrum(frames, consts)

    return fft_power


def slope_time(step, x, iters: int = 8):
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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512,
                    help="timing batch (parity always checks at <=512)")
    ap.add_argument("--iters", type=int, default=8,
                    help="dispatch-chain length for the slope")
    ap.add_argument("--nffts", default="512,2048,4096")
    a = ap.parse_args()

    print(f"backend={jax.default_backend()} frames={a.frames} "
          f"iters={a.iters}", flush=True)
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(()) + 1.0)
    print(f"claim: {time.perf_counter() - t0:.1f}s", flush=True)

    N = a.frames
    N_par = min(N, 512)
    rng = np.random.default_rng(0)
    for n_fft in (int(x) for x in a.nffts.split(",")):
        win = n_fft if n_fft > 512 else 400  # long-audio: full-size windows
        frames_np = (rng.standard_normal((N_par, win)) * 0.1).astype(np.float32)
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

        # timing batch generated ON DEVICE (a host batch this size would
        # pay minutes of relay H2D and pollute the first chain)
        big = jax.jit(lambda k: jax.random.normal(
            jax.random.wrap_key_data(k), (N, win)) * 0.1
        )(jax.random.key_data(jax.random.key(7)))

        def step_mm(x, acc):
            return acc + audio.power_spectrum(x + acc * 0, consts).sum()

        def step_ff(x, acc):
            return acc + fft_power(x + acc * 0).sum()

        t_mm, c_mm = slope_time(jax.jit(step_mm), big, iters=a.iters)
        t_ff, c_ff = slope_time(jax.jit(step_ff), big, iters=a.iters)
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
