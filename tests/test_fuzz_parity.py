"""Property-based parity fuzz: randomized shapes/lengths/masks vs the
torch oracle, and the bucket-trim serving path vs the full-cap decode.

Every case forces the degenerate geometries that fixed-shape parity tests
miss (VERDICT r3 item 7): a minimum-length row (K valid sentences of ONE
word, one keyframe, one audio frame), full-cap rows, fully-masked padding
sentences, W=1/T_s=1-sized configs, odd feature dims, and random tower
subsets.  Teacher-forcing log-probs must match the oracle elementwise on
valid slots; greedy picks must match wherever the oracle's top-2 margin
rules out fp-tie flips (untrained weights can score two sentences within
1e-5 — that's argmax coin-flipping, not semantics).

Default suite sweeps a fixed seed set (deterministic). Long sweeps:

    MMB_FUZZ_CASES=100 python -m pytest tests/test_fuzz_parity.py -q
    python tests/test_fuzz_parity.py 200        # standalone driver

Any failing seed is a promotable reproduction: its case is fully derived
from the integer, so paste it into the parametrize list below.
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors
from mmbidaf_tpu.interop.torch_port import port_mmbidaf
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_decode
from tests.oracles import torch_model as oracle

ATOL = 1e-4
TIE_GAP = 1e-3  # min oracle top-2 margin before greedy picks must agree


def _fuzz_cfg(rng: np.random.Generator):
    """Random tiny config: odd dims, tiny axes, random tower subset."""
    T_s = int(rng.integers(1, 10))
    K = int(rng.integers(1, min(4, T_s) + 1))
    use_images = bool(rng.integers(0, 2))
    use_audio = bool(rng.integers(0, 2))
    cfg = tiny_test_config(
        hidden_size=int(rng.integers(4, 25)),
        use_images=use_images,
        use_audio=use_audio,
    )
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            emb_dim=int(rng.integers(6, 33)),
            img_feat_dim=int(rng.integers(6, 41)),
            audio_feat_dim=int(rng.integers(4, 17)),
            max_decode_steps=K,
        ),
        data=dataclasses.replace(
            cfg.data,
            max_sentences=T_s,
            max_words=int(rng.integers(1, 10)),
            max_keyframes=int(rng.integers(1, 9)),
            max_audio_frames=int(rng.integers(1, 13)),
            vocab_size=int(rng.integers(30, 200)),
        ),
    )


def _fuzz_batch(rng: np.random.Generator, cfg, B: int = 4):
    """Ragged batch with forced extremes: row 0 = full caps, row 1 = the
    minimum legal geometry (K sentences x 1 word, 1 frame, 1 audio frame),
    remaining rows random-in-[1, cap]."""
    d, m = cfg.data, cfg.model
    T_s, W = d.max_sentences, d.max_words
    T_i, T_a, K = d.max_keyframes, d.max_audio_frames, m.max_decode_steps

    def lengths(cap, lo):
        ls = rng.integers(lo, cap + 1, size=B)
        ls[0] = cap            # full-cap row
        ls[1] = lo             # minimum-length row
        return ls

    n_sent = lengths(T_s, K)
    sent_mask = (np.arange(T_s)[None] < n_sent[:, None]).astype(np.float32)
    n_words = rng.integers(1, W + 1, size=(B, T_s))
    n_words[0] = W
    n_words[1] = 1             # every valid sentence in row 1 has ONE word
    word_mask = (np.arange(W)[None, None] < n_words[:, :, None]).astype(
        np.float32) * sent_mask[:, :, None]
    text_ids = np.where(
        word_mask > 0,
        rng.integers(2, d.vocab_size, size=(B, T_s, W)), 0).astype(np.int32)

    n_img = lengths(T_i, 1)
    img_mask = (np.arange(T_i)[None] < n_img[:, None]).astype(np.float32)
    images = (rng.standard_normal((B, T_i, m.img_feat_dim)).astype(np.float32)
              * img_mask[:, :, None])
    n_aud = lengths(T_a, 1)
    aud_mask = (np.arange(T_a)[None] < n_aud[:, None]).astype(np.float32)
    audio = (rng.standard_normal((B, T_a, m.audio_feat_dim)).astype(np.float32)
             * aud_mask[:, :, None])

    targets = np.stack(
        [rng.permutation(n)[:K] for n in n_sent]).astype(np.int32)
    return {
        "text_ids": text_ids, "word_mask": word_mask, "sent_mask": sent_mask,
        "images": images, "img_mask": img_mask,
        "audio": audio, "aud_mask": aud_mask,
        "targets": targets, "target_mask": np.ones((B, K), np.float32),
    }


def _oracle_pair(seed: int):
    rng = np.random.default_rng(seed)
    cfg = _fuzz_cfg(rng)
    m = cfg.model
    wv = random_word_vectors(rng, cfg.data.vocab_size, m.emb_dim)
    torch.manual_seed(seed)
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv), m.hidden_size,
        img_feat_dim=m.img_feat_dim if m.use_images else None,
        audio_feat_dim=m.audio_feat_dim if m.use_audio else None,
        num_decode_steps=m.max_decode_steps,
        mask_selected=m.mask_selected,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = port_mmbidaf(sd, use_images=m.use_images, use_audio=m.use_audio)
    batch = _fuzz_batch(rng, cfg)
    return cfg, tm, params, batch


def _torch_kwargs(batch, cfg, with_targets: bool):
    m = cfg.model
    kw = dict(
        text_ids=torch.from_numpy(batch["text_ids"]).long(),
        word_mask=torch.from_numpy(batch["word_mask"]),
        sent_mask=torch.from_numpy(batch["sent_mask"]),
    )
    if with_targets:
        kw["targets"] = torch.from_numpy(batch["targets"]).long()
    if m.use_images:
        kw["images"] = torch.from_numpy(batch["images"])
        kw["img_mask"] = torch.from_numpy(batch["img_mask"])
    if m.use_audio:
        kw["audio"] = torch.from_numpy(batch["audio"])
        kw["aud_mask"] = torch.from_numpy(batch["aud_mask"])
    return kw


def check_case(seed: int) -> None:
    """One fuzz case: teacher-forcing elementwise parity + tie-guarded
    greedy-pick parity + finiteness on valid slots."""
    cfg, tm, params, batch = _oracle_pair(seed)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    log_p = np.asarray(mmbidaf_apply(params, jbatch, cfg))
    with torch.no_grad():
        tlog_p, _ = tm(**_torch_kwargs(batch, cfg, with_targets=True))
    tlog_p = tlog_p.numpy()
    valid = np.broadcast_to(batch["sent_mask"][:, None, :] > 0, tlog_p.shape)
    np.testing.assert_allclose(
        log_p[valid], tlog_p[valid], atol=ATOL,
        err_msg=f"teacher-forcing log_p diverged (seed={seed}, "
                f"towers=img:{cfg.model.use_images} aud:{cfg.model.use_audio})")
    # valid-and-unmasked slots must be finite log-probs (<= 0 + fp slack)
    finite = log_p[valid][log_p[valid] > -1e29]
    assert np.all(np.isfinite(finite)) and np.all(finite < 1e-3), seed

    jlp, picks = mmbidaf_decode(params, jbatch, cfg)
    with torch.no_grad():
        tlp, tpicks = tm(**_torch_kwargs(batch, cfg, with_targets=False))
    tlp, tpicks = tlp.numpy(), tpicks.numpy()
    picks = np.asarray(picks)
    # greedy picks must agree for rows where EVERY step's oracle top-2
    # margin beats the fp-tie threshold; log_p parity must hold everywhere
    valid_d = np.broadcast_to(batch["sent_mask"][:, None, :] > 0, tlp.shape)
    np.testing.assert_allclose(
        np.asarray(jlp)[valid_d], tlp[valid_d], atol=ATOL,
        err_msg=f"greedy log_p diverged (seed={seed})")
    for b in range(tlp.shape[0]):
        margins = []
        for k in range(tlp.shape[1]):
            row = np.sort(tlp[b, k][tlp[b, k] > -1e29])
            margins.append(row[-1] - row[-2] if len(row) >= 2 else np.inf)
        if min(margins) > TIE_GAP:
            np.testing.assert_array_equal(
                picks[b], tpicks[b],
                err_msg=f"greedy picks diverged (seed={seed}, row={b}, "
                        f"min_margin={min(margins):.2e})")


DEFAULT_SEEDS = list(range(10))


def _seed_list():
    n = int(os.environ.get("MMB_FUZZ_CASES", 0))
    return list(range(n)) if n else DEFAULT_SEEDS


@pytest.mark.parametrize("seed", _seed_list())
def test_fuzz_forward_parity(seed):
    check_case(seed)


# -- bucket-trim serving path fuzz -------------------------------------------

def check_trim_case(seed: int) -> None:
    """Random true lengths through trim_raw_batch: the rung-trimmed decode
    must reproduce the full-cap decode's picks (tie-guarded) and log-probs."""
    from mmbidaf_tpu.data.frontend import frontend_init, make_end_to_end_decode
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.serving import serving_bucket_ladders, trim_raw_batch

    rng = np.random.default_rng(seed)
    cfg = tiny_test_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc))
    d = cfg.data
    B = 3
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    K = cfg.model.max_decode_steps

    n_sent = rng.integers(K, d.max_sentences + 1, size=B)
    n_img = rng.integers(1, d.max_keyframes + 1, size=B)
    n_aud = rng.integers(1, d.max_audio_frames + 1, size=B)
    raw = {
        "text_ids": rng.integers(
            2, d.vocab_size, (B, d.max_sentences, d.max_words)
        ).astype(np.int32),
        "word_mask": np.zeros((B, d.max_sentences, d.max_words), np.float32),
        "sent_mask": (np.arange(d.max_sentences)[None] < n_sent[:, None]
                      ).astype(np.float32),
        "frames": (rng.random((B, d.max_keyframes, 24, 32, 3)) * 255
                   ).astype(np.uint8),
        "img_mask": (np.arange(d.max_keyframes)[None] < n_img[:, None]
                     ).astype(np.float32),
        "waveform": (rng.standard_normal((B, n_samples)) * 0.1
                     ).astype(np.float32),
        "aud_mask": (np.arange(d.max_audio_frames)[None] < n_aud[:, None]
                     ).astype(np.float32),
    }
    n_words = rng.integers(1, d.max_words + 1, size=(B, d.max_sentences))
    raw["word_mask"] = (
        (np.arange(d.max_words)[None, None] < n_words[:, :, None])
        .astype(np.float32) * raw["sent_mask"][:, :, None])

    wv = random_word_vectors(rng, d.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(seed), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(seed + 1), cfg, vgg_spec=TINY_SPEC)
    decode = make_end_to_end_decode(cfg, vgg_spec=TINY_SPEC)

    lp_full, picks_full = decode(
        params, fe, {k: jnp.asarray(v) for k, v in raw.items()})
    lp_full, picks_full = np.asarray(lp_full), np.asarray(picks_full)

    trimmed = trim_raw_batch(raw, cfg, serving_bucket_ladders(cfg, True))
    lp_t, picks_t = decode(
        params, fe, {k: jnp.asarray(v) for k, v in trimmed.items()})
    lp_t, picks_t = np.asarray(lp_t), np.asarray(picks_t)

    T_t = lp_t.shape[2]
    for b in range(B):
        margins = []
        for k in range(lp_full.shape[1]):
            row = np.sort(lp_full[b, k][lp_full[b, k] > -1e29])
            margins.append(row[-1] - row[-2] if len(row) >= 2 else np.inf)
        if min(margins) > TIE_GAP:
            np.testing.assert_array_equal(
                picks_t[b], picks_full[b],
                err_msg=f"trimmed picks diverged (seed={seed}, row={b})")
            keep = lp_full[b][:, :T_t] > -1e29
            np.testing.assert_allclose(
                lp_t[b][keep], lp_full[b][:, :T_t][keep], atol=5e-4,
                err_msg=f"trimmed log_p diverged (seed={seed}, row={b})")


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fuzz_bucket_trim_parity(seed):
    check_trim_case(seed)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    failures = []
    for s in range(n):
        try:
            check_case(s)
            if s % 5 == 0:
                check_trim_case(1000 + s)
            print(f"seed {s}: OK", flush=True)
        except AssertionError as e:
            failures.append(s)
            print(f"seed {s}: FAIL\n{e}", flush=True)
    print(f"{n - len(failures)}/{n} cases passed; failures: {failures}")
    raise SystemExit(1 if failures else 0)
