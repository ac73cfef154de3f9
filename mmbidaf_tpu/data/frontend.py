"""Raw-inputs → model-features device-side preprocessing (SURVEY.md §4.1).

The reference does all of this offline on the host (ffmpeg/OpenCV frames,
librosa MFCC, GloVe lookups → .npy artifacts). Here the whole stack —
keyframe resize + VGG forward, waveform framing + matmul-DFT MFCC — is one
jittable stage that composes with the model into a single compiled
raw-video→summary program [B:5]. Only container decode (mp4 → RGB frames /
PCM) stays host-side, by necessity.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.ops import audio as audio_ops
from mmbidaf_tpu.ops import vgg as vgg_ops

# Auto frame-chunking engages when the VGG stack's two live activation
# buffers (first-conv width × image_size² per frame — the early layers
# dominate; pooling halves later stages) would exceed this budget. 14 GB
# keeps today's measured-working single-pass shapes (1024 frames @224²
# bf16 ≈ 13.2 GB) single-pass on the 16 GB chip while chunking anything
# bigger instead of OOMing.
_AUTO_VGG_ACT_BUDGET = 14e9


def _auto_vgg_chunk(
    n_frames: int, image_size: int, first_ch: int, itemsize: int,
    budget: float = _AUTO_VGG_ACT_BUDGET, shards: int = 1,
) -> int:
    """Frame-chunk size for ``vgg_frame_chunk=0`` (auto): 0 (single pass)
    while the estimated two-live-buffer activation footprint fits
    ``budget``; otherwise the largest 128-multiple chunk that fits, or the
    raw fitting count when even 128 frames exceed the budget (huge
    image_size) — the chunk must stay below the frame count or the
    oversized batch would run single-pass and OOM.

    ``shards``: ways the frame axis is data-parallel-sharded (GSPMD serving
    traces GLOBAL shapes but each chip only holds 1/shards of the
    activations) — the estimate is per shard and the returned global chunk
    keeps every shard evenly loaded (per-shard chunk × shards)."""
    per_frame = 2 * image_size * image_size * first_ch * itemsize
    if (n_frames // shards) * per_frame <= budget:
        return 0
    per_shard = int(budget / per_frame)
    per_shard = per_shard // 128 * 128 or max(1, per_shard)
    return per_shard * shards


def frontend_init(key: jax.Array, cfg: Config, vgg_spec=vgg_ops.VGG16_SPEC) -> dict:
    """Frontend params: VGG weights (portable from torchvision) + audio consts."""
    d = cfg.data
    params = {
        "audio_consts": audio_ops.make_audio_frontend_consts(
            d.sample_rate, d.n_fft, d.win_length, d.n_mels, d.n_mfcc, d.fmin, d.fmax
        ),
    }
    if cfg.model.use_images:
        params["vgg"] = vgg_ops.vgg_init(
            key, vgg_spec, image_size=d.image_size, fc_dim=cfg.model.img_feat_dim
        )
    return params


def cast_vgg_weights(fe_params: dict | None, compute_dtype) -> dict | None:
    """Hold the (frozen) VGG subtree in the compute dtype: the in-jit cast
    otherwise re-reads the f32 originals every call (fc1's [25088, 4096]
    table alone is 411 MB f32 vs 205 MB bf16 — ~0.25 ms/batch measured
    round 3). Bitwise identical to casting at use. The audio DFT/mel consts
    stay f32 (the MFCC frontend computes in f32 — same decision as the SP
    tower's stage dtypes). Shared by Summarizer and bench.py so serving and
    the benchmark measure the same program."""
    compute_dtype = jnp.dtype(compute_dtype)
    if fe_params is None or compute_dtype == jnp.float32 or "vgg" not in fe_params:
        return fe_params
    cast = lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x
    return dict(fe_params, vgg=jax.tree.map(cast, fe_params["vgg"]))


def apply_frontend(
    fe_params: dict,
    raw: Mapping[str, jax.Array],
    cfg: Config,
    vgg_spec=vgg_ops.VGG16_SPEC,
    sp_audio: bool = False,
    data_shards: int = 1,
) -> dict:
    """Raw batch → model-ready feature batch (jittable).

    Raw batch schema:
      frames   [B, T_i, H, W, 3] uint8   raw keyframes
      waveform [B, N] float32            raw audio (padded)
      text_ids/word_mask/sent_mask/img_mask/aud_mask: as in the model batch

    ``sp_audio=True`` (MeshConfig.sp_audio): the waveform passes through raw
    — the sequence-parallel tower (parallel/sp_tower.py) featurizes it
    inside the model with the frame axis sharded over the ``seq`` mesh axis.

    ``data_shards``: DP-serving shard count of the batch axis, so the
    auto frame-chunk heuristic (``vgg_frame_chunk=0``) budgets per-chip
    activations rather than the global traced shape.
    """
    d = cfg.data
    compute_dtype = jnp.dtype(cfg.model.compute_dtype)
    out = {k: raw[k] for k in ("text_ids", "word_mask", "sent_mask") if k in raw}
    # Precomputed-feature batches (tools/precompute_features.py) pass
    # through untouched — the frontend only runs on raw media keys.
    if cfg.model.use_images and "images" in raw and "frames" not in raw:
        out["images"] = raw["images"]
        out["img_mask"] = raw["img_mask"]
    if cfg.model.use_audio and "audio" in raw and "waveform" not in raw:
        out["audio"] = raw["audio"]
        out["aud_mask"] = raw["aud_mask"]
    if cfg.model.use_images and "frames" in raw:
        B, T_i = raw["frames"].shape[:2]
        flat = raw["frames"].reshape((B * T_i,) + raw["frames"].shape[2:])
        vgg_params = fe_params["vgg"]
        if compute_dtype != jnp.float32:
            # The VGG convs are ~95% of frontend FLOPs — run them on the
            # bf16 MXU path when the model's compute dtype asks for it.
            cast = lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x
            vgg_params = jax.tree.map(cast, vgg_params)

        def featurize(fr):
            # Resize runs directly in the compute dtype (memory-bound; bf16
            # halves its traffic), feeding the VGG's MXU path w/o a recast.
            imgs = vgg_ops.preprocess_frames(fr, d.image_size, dtype=compute_dtype)
            return vgg_ops.vgg_features(
                vgg_params, imgs, vgg_spec, winograd=cfg.model.use_winograd_conv
            )

        chunk = cfg.model.vgg_frame_chunk
        if chunk == 0:
            # Auto: a 128-video batch at 224² needs ~26 GB in one pass —
            # chunk it so oversized batches run instead of OOMing.
            chunk = _auto_vgg_chunk(
                flat.shape[0], d.image_size,
                next(c for c in vgg_spec if isinstance(c, int)),
                jnp.dtype(compute_dtype).itemsize,
                shards=data_shards,
            )
        if chunk and flat.shape[0] > chunk:
            # Sequential frame chunks cap peak activation HBM (the frames
            # are independent; only XLA fusion order differs vs one pass).
            n = flat.shape[0]
            pad = -n % chunk
            if pad:
                flat = jnp.concatenate(
                    [flat, jnp.zeros((pad,) + flat.shape[1:], flat.dtype)], axis=0
                )
            feats = jax.lax.map(featurize, flat.reshape((-1, chunk) + flat.shape[1:]))
            feats = feats.reshape((-1,) + feats.shape[2:])[:n]
        else:
            feats = featurize(flat)
        feats = feats.astype(jnp.float32)
        out["images"] = feats.reshape(B, T_i, -1) * raw["img_mask"][:, :, None]
        out["img_mask"] = raw["img_mask"]
    if cfg.model.use_audio and "waveform" in raw and sp_audio:
        out["waveform"] = raw["waveform"]
        out["aud_mask"] = raw["aud_mask"]
    elif cfg.model.use_audio and "waveform" in raw:
        # frame count follows the BATCH's (possibly bucketed) audio axis,
        # not the config's static max — bucketed_iterator trims waveform
        # and aud_mask together, keeping samples = frames*hop + win
        feats = audio_ops.waveform_to_features(
            raw["waveform"],
            fe_params["audio_consts"],
            d.win_length,
            d.hop_length,
            raw["aud_mask"].shape[1],
            feature=cfg.data.audio_features,
            fused=cfg.model.use_pallas_melspec,
            fft=cfg.data.audio_fft,
        )
        out["audio"] = feats * raw["aud_mask"][:, :, None]
        out["aud_mask"] = raw["aud_mask"]
    return out


def make_end_to_end_decode(
    cfg: Config, vgg_spec=vgg_ops.VGG16_SPEC, audio_g_fn=None, data_shards: int = 1
):
    """One jitted program: raw video batch → summary sentence indices.

    ``audio_g_fn`` routes the audio tower through the sequence-parallel
    chain (``MeshConfig.sp_audio``); the frontend then passes the raw
    waveform through for the tower to featurize sharded. ``data_shards``
    informs the auto frame-chunk heuristic under DP serving.
    """
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode

    @jax.jit
    def end_to_end(params: dict, fe_params: dict, raw: Mapping[str, jax.Array]):
        batch = apply_frontend(
            fe_params, raw, cfg, vgg_spec, sp_audio=audio_g_fn is not None,
            data_shards=data_shards,
        )
        return mmbidaf_decode(params, batch, cfg, audio_g_fn=audio_g_fn)

    return end_to_end
