"""On-chip Pallas kernel parity harness (VERDICT r3 item 6; SURVEY.md §5
item 2: kernel tests "interpret mode on CPU, THEN compiled on TPU").

The default test suite proves every fused kernel against its jnp reference
in interpret mode (tests/test_pallas_kernels.py); this CLI runs the same
comparisons COMPILED on the real backend at serving shapes — Mosaic
compilation, VMEM tiling, and bf16 MXU behavior are only exercised here.

Tolerance policy (learned from the first on-chip run, r4): on TPU, XLA's
DEFAULT matmul precision feeds the MXU bf16 inputs, so BOTH the jnp path
and the kernels carry ~2^-8-relative rounding in different summation
orders; CPU-grade atols produce false FAILs (~1e-2 relative deltas).
References are therefore computed at matmul precision "float32" (true-f32
ground truth) and kernels must land within a scale-aware MXU bound
(MXU_REL x max|ref|); the jnp default-precision drift is recorded next to
each row to show the kernel is no worse than the path it replaces.

    python tools/kernel_parity.py --out docs/KERNEL_PARITY_r4.json
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/kernel_parity.py   # CPU dry run

Prints one row per kernel (max|Δ| vs reference, tolerance, PASS/FAIL) and
exits non-zero on any failure. One process = one TPU claim (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: list[dict] = []


def _install_sigterm():
    """SIGTERM → KeyboardInterrupt so an interrupted run UNWINDS (releases
    the PJRT device claim) instead of wedging the relay (CLAUDE.md)."""
    import signal

    def _h(signum, frame):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _h)


BACKEND = "cpu"  # set in main()

# TPU f32 "parity" is parity at MXU precision: XLA's DEFAULT matmul
# precision feeds the systolic array bf16 inputs (~2^-8 relative per
# contraction), and the jnp production path pays the same rounding in a
# different summation order. The honest on-chip contract is therefore
# |kernel - highest-precision reference| <= atol + rel * max|ref|,
# with the jnp-at-default-precision drift recorded alongside as context
# (the kernel must not be WORSE than the path it replaces).
MXU_REL = 2.5e-2  # blanket fallback for kernels with no measured envelope

# Per-kernel measured envelopes (VERDICT r4 item 7): the blanket 2.5e-2
# bound sat ~10x above the errors actually measured on chip, so a kernel
# regression that tripled its error would still have passed. The r4 on-chip
# run (docs/KERNEL_PARITY_r4.json, TPU v5 lite, batch 32, seed 0) measured
# these rel_err = max|Δ|/max|ref| values; the TPU bound is now
# max(2 x measured, MXU_FLOOR) — 2x covers compiler-version summation-order
# drift, the floor is the bf16 mantissa step (2^-8 ≈ 3.9e-3) no MXU kernel
# can beat. A real regression (error x3) now trips the harness.
MXU_FLOOR = 4e-3
MEASURED_REL_R4 = {
    "bidaf_attention_fused (f32, 32x512)": 2.42e-3,
    "bidaf_attention_fused (bf16)": 1.06e-2,
    "bidaf_fused_trainable grad[params]": 2.48e-3,
    "bidaf_fused_trainable grad[c]": 2.84e-3,
    "bidaf_fused_trainable grad[q]": 5.14e-3,
    "bidaf_attention_tiled (f32)": 2.35e-3,
    "bilstm_pallas out (1024 rows)": 3.20e-3,
    "bilstm_pallas h_n": 2.49e-3,
    "bilstm_pallas c_n": 2.54e-3,
    "bilstm_pallas_trainable grads": 1.84e-3,
    "log_mel_fused (512 frames)": 5.89e-3,
    "mfcc_fused (one-pass whole example)": 2.01e-3,
    "preprocess_frames_fused (240x320->224)": 8.17e-3,
}


def tpu_rel_bound(name: str, mxu_rel: float) -> float:
    """Per-kernel TPU relative bound: measured-envelope when we have one,
    else the caller's mxu_rel / blanket fallback."""
    measured = MEASURED_REL_R4.get(name)
    if measured is None:
        return mxu_rel
    return max(2.0 * measured, MXU_FLOOR)


def check(name: str, got, ref_hi, atol: float, rtol: float = 0.0,
          ref_default=None, mxu_rel: float = MXU_REL) -> None:
    """PASS if `got` matches `ref_hi` within (atol, rtol) on CPU, or within
    the scale-aware MXU tolerance on TPU. `ref_default` (the jnp path at
    DEFAULT matmul precision) is recorded as drift context."""
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref_hi, np.float32)
    abs_err = np.abs(got - ref)
    err = float(np.max(abs_err)) if got.size else 0.0
    scale = float(np.max(np.abs(ref))) if ref.size else 0.0
    if BACKEND == "tpu":
        rel = tpu_rel_bound(name, mxu_rel)
        bound = atol + rel * scale
    else:
        rel = rtol
        bound = atol + rtol * scale
    ok = bool(err <= bound) and got.shape == ref.shape
    # Per-element diagnostics (ADVICE r4): a single global-scale bound can
    # hide moderate errors in small-magnitude elements of wide-dynamic-range
    # outputs (grads). Record the tail and the fraction of elements that
    # would exceed an elementwise mixed bound atol + rel*|ref_i| — an early
    # regression signal even where the global bound still passes.
    row = {
        "kernel": name, "ok": ok, "max_abs_err": err,
        "ref_scale": scale, "rel_err": err / scale if scale else 0.0,
        "bound": bound, "atol": atol, "rtol": rtol, "tpu_rel": rel,
        "p999_abs_err": float(np.quantile(abs_err, 0.999)) if got.size else 0.0,
        "frac_exceed_elementwise": float(
            np.mean(abs_err > atol + rel * np.abs(ref))) if got.size else 0.0,
        "shape": list(got.shape),
    }
    if ref_default is not None:
        d = np.asarray(ref_default, np.float32)
        row["jnp_default_drift"] = float(np.max(np.abs(d - ref)))
    RESULTS.append(row)
    ctx = (f" jnp-default drift={row['jnp_default_drift']:.3e}"
           if "jnp_default_drift" in row else "")
    print(f"{'PASS' if ok else 'FAIL'}  {name:42s} "
          f"max|Δ|={err:.3e} (bound={bound:.3e}, scale={scale:.3g}){ctx}")


def ragged_mask(rng, B, T):
    lengths = rng.integers(1, T + 1, size=B)
    lengths[0] = T
    return (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--batch", type=int, default=32)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.ops import audio
    from mmbidaf_tpu.ops.bidaf import bidaf_apply, bidaf_init
    from mmbidaf_tpu.ops.lstm import bilstm_apply, bilstm_init
    from mmbidaf_tpu.ops.pallas.bidaf_kernel import (
        bidaf_attention_fused, bidaf_attention_fused_trainable,
    )
    from mmbidaf_tpu.ops.pallas.bidaf_tiled_kernel import bidaf_attention_tiled
    from mmbidaf_tpu.ops.pallas.lstm_kernel import bilstm_pallas, bilstm_pallas_trainable
    from mmbidaf_tpu.ops.pallas.melspec_kernel import log_mel_fused, mfcc_fused
    from mmbidaf_tpu.ops.pallas.preprocess_kernel import preprocess_frames_fused
    from mmbidaf_tpu.ops.vgg import preprocess_frames

    global BACKEND
    backend = BACKEND = jax.default_backend()
    device_kind = jax.devices()[0].device_kind
    print(f"backend={backend} device={device_kind}")
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(()) + 1.0)  # flush the relay claim
    print(f"claim: {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    B = a.batch

    # ---- fused BiDAF at serving shapes (text anchor vs audio tower) ----
    T_c, T_q, D = 32, 512, 256
    params = bidaf_init(jax.random.key(0), D)
    c = jnp.asarray(rng.standard_normal((B, T_c, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, T_q, D)), jnp.float32)
    cm = jnp.asarray(ragged_mask(rng, B, T_c))
    qm = jnp.asarray(ragged_mask(rng, B, T_q))
    with jax.default_matmul_precision("float32"):
        ref = jax.jit(bidaf_apply)(params, c, q, cm, qm)
    ref_def = jax.jit(bidaf_apply)(params, c, q, cm, qm)
    got = jax.jit(bidaf_attention_fused)(params, c, q, cm, qm)
    check("bidaf_attention_fused (f32, 32x512)", got, ref, atol=3e-4,
          rtol=1e-4, ref_default=ref_def)

    # bf16 operands (the serving compute dtype) — bf16-level tolerance
    to_bf = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                                   if x.dtype == jnp.float32 else x, t)
    ref16 = jax.jit(bidaf_apply)(to_bf(params), to_bf(c), to_bf(q), cm, qm)
    got16 = jax.jit(bidaf_attention_fused)(to_bf(params), to_bf(c), to_bf(q), cm, qm)
    check("bidaf_attention_fused (bf16)", got16.astype(jnp.float32),
          ref16.astype(jnp.float32), atol=0.15, rtol=0.05, mxu_rel=0.05)

    # ---- trainable BiDAF: gradients through the fused backward ----
    def loss_ref(p, cc, qq):
        return (bidaf_apply(p, cc, qq, cm, qm) ** 2).sum() / B

    def loss_fused(p, cc, qq):
        return (bidaf_attention_fused_trainable(p, cc, qq, cm, qm) ** 2).sum() / B

    with jax.default_matmul_precision("float32"):
        g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(params, c, q)
    g_got = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2)))(params, c, q)
    for (name, gr, gg) in [("params", g_ref[0], g_got[0]),
                           ("c", g_ref[1], g_got[1]), ("q", g_ref[2], g_got[2])]:
        gr_flat = np.concatenate([np.ravel(x) for x in jax.tree.leaves(gr)])
        gg_flat = np.concatenate([np.ravel(x) for x in jax.tree.leaves(gg)])
        check(f"bidaf_fused_trainable grad[{name}]", gg_flat, gr_flat,
              atol=5e-3, rtol=1e-3)

    # ---- tiled BiDAF (ring-ready blockwise variant) ----
    got_t = jax.jit(lambda *xs: bidaf_attention_tiled(*xs))(params, c, q, cm, qm)
    check("bidaf_attention_tiled (f32)", got_t, ref, atol=3e-4, rtol=1e-4,
          ref_default=ref_def)

    # ---- Pallas BiLSTM fwd at word-level serving shapes ----
    rows, T, Din, H = B * 32, 16, 128, 128
    lp = bilstm_init(jax.random.key(1), Din, H)
    x = jnp.asarray(rng.standard_normal((rows, T, Din)), jnp.float32) * 0.3
    m = jnp.asarray(ragged_mask(rng, rows, T))
    with jax.default_matmul_precision("float32"):
        out_ref, (h_ref, c_ref) = jax.jit(bilstm_apply)(lp, x, m)
    out_got, (h_got, c_got) = jax.jit(bilstm_pallas)(lp, x, m)
    check("bilstm_pallas out (1024 rows)", out_got, out_ref, atol=2e-4, rtol=1e-4)
    check("bilstm_pallas h_n", h_got, h_ref, atol=2e-4, rtol=1e-4)
    check("bilstm_pallas c_n", c_got, c_ref, atol=5e-4, rtol=1e-4)

    # ---- Pallas BiLSTM BPTT backward ----
    def l_ref(p, xx):
        o, (h, cc) = bilstm_apply(p, xx, m)
        return (o ** 2).sum() / rows + (h * cc).sum() / rows

    def l_got(p, xx):
        o, (h, cc) = bilstm_pallas_trainable(p, xx, m)
        return (o ** 2).sum() / rows + (h * cc).sum() / rows

    with jax.default_matmul_precision("float32"):
        gr = jax.jit(jax.grad(l_ref, argnums=(0, 1)))(lp, x)
    gg = jax.jit(jax.grad(l_got, argnums=(0, 1)))(lp, x)
    gr_flat = np.concatenate([np.ravel(t) for t in jax.tree.leaves(gr)])
    gg_flat = np.concatenate([np.ravel(t) for t in jax.tree.leaves(gg)])
    check("bilstm_pallas_trainable grads", gg_flat, gr_flat, atol=1e-3, rtol=1e-3)

    # ---- fused melspec / MFCC at the serving audio shape ----
    n_fft, win, n_mels, n_mfcc = 512, 400, 64, 40
    consts = {k: jnp.asarray(v) for k, v in audio.make_audio_frontend_consts(
        16000, n_fft, win, n_mels, n_mfcc).items()}
    frames = jnp.asarray(rng.standard_normal((B, 512, win)), jnp.float32) * 0.1
    with jax.default_matmul_precision("float32"):
        ref_lm = jax.jit(audio.log_mel)(frames, consts)
        ref_mf = jax.jit(audio.mfcc)(frames, consts)
    got_lm = jax.jit(lambda f, c: log_mel_fused(f, c))(frames, consts)
    check("log_mel_fused (512 frames)", got_lm, ref_lm, atol=2e-3, rtol=1e-3)
    got_mf = jax.jit(lambda f, c: mfcc_fused(f, c))(frames, consts)
    check("mfcc_fused (one-pass whole example)", got_mf, ref_mf, atol=5e-3, rtol=1e-3)

    # ---- one-pass preprocess kernel (kept as negative-result evidence) ----
    fr = jnp.asarray(rng.integers(0, 256, (64, 240, 320, 3)), jnp.uint8)
    with jax.default_matmul_precision("float32"):
        ref_pp = jax.jit(lambda f: preprocess_frames(f, 224))(fr)
    got_pp = jax.jit(lambda f: preprocess_frames_fused(f, 224))(fr)
    check("preprocess_frames_fused (240x320->224)", got_pp, ref_pp,
          atol=2e-3, rtol=1e-3)

    n_fail = sum(0 if r["ok"] else 1 for r in RESULTS)
    report = {
        "backend": backend, "device_kind": device_kind,
        "batch": B, "n_kernels": len(RESULTS), "n_fail": n_fail,
        "results": RESULTS,
    }
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {a.out}")
    print(f"{len(RESULTS) - n_fail}/{len(RESULTS)} parity checks passed")
    raise SystemExit(1 if n_fail else 0)


if __name__ == "__main__":
    _install_sigterm()
    try:
        main()
    except KeyboardInterrupt:
        print("kernel_parity interrupted; exiting cleanly", file=sys.stderr)
        raise SystemExit(130)
