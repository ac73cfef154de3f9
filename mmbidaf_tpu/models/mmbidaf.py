"""Full MMBiDAF model assembly (SURVEY.md §3.1 "Trimodal wiring", §4.4).

Pipeline (trimodal; towers drop out per config — the five graded configs
[B:6-12]):

    text_ids [B, T_s, W]  ─ GloVe+highway ─ word BiLSTM ─ final-state pool ─┐
                                                                            ├─ sentence BiLSTM → text_enc [B, T_s, 2h]
    imgs [B, T_i, D_v]    ─ img BiLSTM → img_enc [B, T_i, 2h]               │
    audio [B, T_a, D_a]   ─ aud BiLSTM → aud_enc [B, T_a, 2h]               │
                                                                            ▼
    G_ti = BiDAF(text_enc, img_enc)   [B, T_s, 8h]
    G_ta = BiDAF(text_enc, aud_enc)   [B, T_s, 8h]
    (text-only: G_tt = BiDAF(text_enc, text_enc) self-attention)
    fuse: concat(G_*) → linear → relu → modeling BiLSTM → M [B, T_s, 2h]
    pointer decoder over M → log-probs [B, K, T_s]

Exact fusion op and sentence pooling are [K-med] in the reference; the
choices here (concat+linear+modeling-BiLSTM; final-state pooling) are
documented in SURVEY §3.1 and mirrored exactly by the torch parity oracle.

Everything is a pure function over a params pytree: ``mmbidaf_init(rng, cfg,
word_vectors) → params``; ``mmbidaf_apply(params, batch, cfg) → log_probs``.
Sharding is applied by the caller (batch-axis NamedSharding, SURVEY §3.3).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.models.decoder import decoder_apply, decoder_init
from mmbidaf_tpu.models.embedding import embedding_apply, embedding_init
from mmbidaf_tpu.ops.bidaf import bidaf_apply, bidaf_init
from mmbidaf_tpu.ops.lstm import bilstm_apply, stacked_bilstm_apply, stacked_bilstm_init


def mmbidaf_init(key: jax.Array, cfg: Config, word_vectors: jax.Array) -> dict:
    m = cfg.model
    h = m.hidden_size
    L = m.num_rnn_layers
    keys = jax.random.split(key, 10)
    params: dict[str, Any] = {
        "embedding": embedding_init(keys[0], word_vectors, h, m.num_highway_layers),
        "word_lstm": stacked_bilstm_init(keys[1], h, h, L),
        "sent_lstm": stacked_bilstm_init(keys[2], 2 * h, h, L),
        "decoder": decoder_init(keys[9], 2 * h, 2 * h),
    }
    num_g = 0
    if m.use_images:
        params["img_lstm"] = stacked_bilstm_init(keys[3], m.img_feat_dim, h, L)
        params["att_img"] = bidaf_init(keys[4], 2 * h)
        num_g += 1
    if m.use_audio:
        params["aud_lstm"] = stacked_bilstm_init(keys[5], m.audio_feat_dim, h, L)
        params["att_aud"] = bidaf_init(keys[6], 2 * h)
        num_g += 1
    if num_g == 0:  # text-only: sentence self-attention
        params["att_self"] = bidaf_init(keys[4], 2 * h)
        num_g = 1
    fuse_in = num_g * 8 * h
    bound = 1.0 / jnp.sqrt(fuse_in)
    params["fuse_w"] = jax.random.uniform(keys[7], (fuse_in, 2 * h), jnp.float32, -bound, bound)
    params["fuse_b"] = jnp.zeros((2 * h,), jnp.float32)
    if m.fusion == "concat_linear_bilstm":
        params["model_lstm"] = stacked_bilstm_init(keys[8], 2 * h, h, L)
    return params


def encode_text(
    params: dict,
    text_ids: jax.Array,
    word_mask: jax.Array,
    sent_mask: jax.Array,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
    bilstm_fn=bilstm_apply,
) -> jax.Array:
    """Hierarchical text tower → sentence encodings ``[B, T_s, 2h]``.

    Word-level BiLSTM runs over ``[B*T_s, W]`` (one big batched scan — much
    better MXU utilization than per-sentence loops), pooled by final states.
    """
    B, T_s, W = text_ids.shape
    emb = embedding_apply(params["embedding"], text_ids, drop_prob, rng)  # [B,T_s,W,h]
    h = emb.shape[-1]
    flat = emb.reshape(B * T_s, W, h)
    flat_mask = word_mask.reshape(B * T_s, W)
    # Empty (fully padded) sentences would make every step masked; the scan
    # then returns the zero init state, which is what we want for pads.
    _, (h_n, _) = bilstm_fn(params["word_lstm"], flat, flat_mask)  # [B*T_s, 2h]
    sent_vecs = h_n.reshape(B, T_s, 2 * h)
    out, _ = bilstm_fn(params["sent_lstm"], sent_vecs, sent_mask)
    return out


def fuse_and_model(
    params: dict,
    gs: list[jax.Array],
    sent_mask: jax.Array,
    bilstm_fn=bilstm_apply,
    fusion: str = "concat_linear_bilstm",
) -> jax.Array:
    """Fuse the per-modality attention outputs. SURVEY §3.1 marks the
    reference's exact fusion op [K-med] as "concat + linear and/or a
    modeling BiLSTM" — both variants are supported so either reading of
    the reference ports cleanly:

      "concat_linear_bilstm" (default): concat → linear+relu → modeling
          BiLSTM (the squad-starter-style modeling layer).
      "concat_linear": concat → linear+relu only (M is the fused vector;
          no modeling recurrence — the model_lstm params are unused).
    """
    g = jnp.concatenate(gs, axis=-1) if len(gs) > 1 else gs[0]
    fused = jax.nn.relu(g @ params["fuse_w"] + params["fuse_b"])
    if fusion == "concat_linear":
        return fused * sent_mask[:, :, None]
    if fusion != "concat_linear_bilstm":
        raise ValueError(f"unknown fusion {fusion!r}")
    M, _ = bilstm_fn(params["model_lstm"], fused, sent_mask)
    return M


def _bidaf(att_params, c, q, c_mask, q_mask, drop, rng, cfg: Config):
    """Dispatch to the fused Pallas attention kernel when
    ``use_pallas_attention`` is set (SURVEY §8 ph. 6): the plain kernel on
    the inference path, the custom-VJP variant (fused Pallas backward) on
    the dropout-free training path."""
    if cfg.model.use_pallas_attention:
        if rng is None:
            from mmbidaf_tpu.ops.pallas.bidaf_kernel import bidaf_attention_fused

            return bidaf_attention_fused(att_params, c, q, c_mask, q_mask)
        if drop == 0.0:
            from mmbidaf_tpu.ops.pallas.bidaf_kernel import (
                bidaf_attention_fused_trainable,
            )

            return bidaf_attention_fused_trainable(att_params, c, q, c_mask, q_mask)
        # Dropout training path: dropout hits c/q only inside the
        # similarity (reference semantics) — apply the masks here with the
        # SAME rng consumption as ops.bidaf.similarity_matrix (parity),
        # and feed dropped + undropped operands to the fused kernel.
        from mmbidaf_tpu.ops.pallas.bidaf_kernel import bidaf_attention_fused_dropout

        rc, rq = jax.random.split(rng)
        keep = 1.0 - drop
        cd = c * jax.random.bernoulli(rc, keep, c.shape) / keep
        qd = q * jax.random.bernoulli(rq, keep, q.shape) / keep
        return bidaf_attention_fused_dropout(att_params, c, q, cd, qd, c_mask, q_mask)
    return bidaf_apply(att_params, c, q, c_mask, q_mask, drop, rng)


def _cast_compute(params: dict, batch: Mapping[str, jax.Array], dtype) -> tuple[dict, dict]:
    """Cast float params + batch features to the compute dtype (bf16 path:
    halves HBM traffic and doubles MXU rate; masks/ids stay as-is). The raw
    waveform stays f32 — when the SP audio tower is wired in, its matmul-DFT
    frontend runs in f32 like the local frontend does (sp_tower.py)."""
    cast = lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x
    return (
        jax.tree.map(cast, params),
        {k: v if k == "waveform" else cast(v) for k, v in batch.items()},
    )


def mmbidaf_fused_reps(
    params: dict,
    batch: Mapping[str, jax.Array],
    cfg: Config,
    rng: jax.Array | None = None,
    audio_g_fn=None,
) -> jax.Array:
    """Everything up to (and including) the fused sentence reps ``M``.

    With ``compute_dtype='bfloat16'`` the towers + attention run in bf16 and
    ``M`` is returned in f32 (the pointer decoder's log-softmax stays f32).

    ``audio_g_fn`` (built by ``parallel.sp_tower.make_sp_audio_tower`` when
    ``MeshConfig.sp_audio`` is set) replaces the local audio tower with the
    sequence-parallel chain; the batch then carries the raw ``waveform``
    instead of precomputed ``audio`` features.
    """
    m = cfg.model
    compute_dtype = jnp.dtype(m.compute_dtype)
    if compute_dtype != jnp.float32:
        params, batch = _cast_compute(params, batch, compute_dtype)
    drop = m.drop_prob if rng is not None else 0.0
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4

    # Pallas LSTM kernel: plain on the inference path, the custom-VJP
    # variant (fused Pallas BPTT backward) on the training path.
    if m.use_pallas_lstm:
        if rng is None:
            from mmbidaf_tpu.ops.pallas.lstm_kernel import bilstm_pallas

            base_bilstm = bilstm_pallas
        else:
            from mmbidaf_tpu.ops.pallas.lstm_kernel import bilstm_pallas_trainable

            base_bilstm = bilstm_pallas_trainable
        # Stacked params (num_rnn_layers > 1) loop the fused kernel
        # layer-by-layer; single-layer params pass through unchanged.
        def bilstm_fn(p, x, mask):
            return stacked_bilstm_apply(p, x, mask, bilstm_fn=base_bilstm)
    else:
        bilstm_fn = bilstm_apply  # dispatches stacked pytrees itself

    # Training-only rematerialization (TrainConfig.remat_towers): drop each
    # tower's activations after the forward and recompute them in backprop
    # — same math (grads equal to fp-reassociation noise), trades FLOPs for
    # HBM so bigger batches / longer buckets fit. Inference (rng=None)
    # never pays the barrier.
    remat = rng is not None and cfg.train.remat_towers
    maybe_ckpt = jax.checkpoint if remat else (lambda f: f)

    def _text_tower(p, text_ids, word_mask, sent_mask, r):
        return encode_text(p, text_ids, word_mask, sent_mask, drop, r, bilstm_fn)

    text_enc = maybe_ckpt(_text_tower)(
        params, batch["text_ids"], batch["word_mask"], batch["sent_mask"], rngs[0]
    )
    sent_mask = batch["sent_mask"]

    gs = []
    if m.use_images:

        def _img_tower(p, t_enc, images, img_mask, r):
            img_enc, _ = bilstm_fn(p["img_lstm"], images, img_mask)
            return _bidaf(p["att_img"], t_enc, img_enc, sent_mask,
                          img_mask, drop, r, cfg)

        gs.append(maybe_ckpt(_img_tower)(
            params, text_enc, batch["images"], batch["img_mask"], rngs[1]
        ))
    if m.use_audio:
        if audio_g_fn is not None:
            # The SP chain carries its own sharding structure (shard_map
            # stages) — remat inside it would need per-stage policies;
            # keep it un-remat'ed.
            gs.append(audio_g_fn(params, text_enc, batch, drop, rngs[2]))
        else:

            def _aud_tower(p, t_enc, audio, aud_mask, r):
                aud_enc, _ = bilstm_fn(p["aud_lstm"], audio, aud_mask)
                return _bidaf(p["att_aud"], t_enc, aud_enc, sent_mask,
                              aud_mask, drop, r, cfg)

            gs.append(maybe_ckpt(_aud_tower)(
                params, text_enc, batch["audio"], batch["aud_mask"], rngs[2]
            ))
    if not gs:
        gs.append(
            _bidaf(params["att_self"], text_enc, text_enc, sent_mask,
                   sent_mask, drop, rngs[3], cfg)
        )
    return fuse_and_model(
        params, gs, sent_mask, bilstm_fn, fusion=m.fusion
    ).astype(jnp.float32)


def mmbidaf_apply(
    params: dict,
    batch: Mapping[str, jax.Array],
    cfg: Config,
    rng: jax.Array | None = None,
    audio_g_fn=None,
) -> jax.Array:
    """Training forward (teacher forcing) → log-probs ``[B, K, T_s]``."""
    M = mmbidaf_fused_reps(params, batch, cfg, rng, audio_g_fn=audio_g_fn)
    log_p, _ = decoder_apply(
        params["decoder"],
        M,
        batch["sent_mask"],
        targets=batch["targets"],
        num_steps=cfg.model.max_decode_steps,
        teacher_forcing=True,
        mask_selected=cfg.model.mask_selected,
    )
    return log_p


def mmbidaf_decode(
    params: dict,
    batch: Mapping[str, jax.Array],
    cfg: Config,
    mode: str = "greedy",
    topk: int = 4,
    rng: jax.Array | None = None,
    audio_g_fn=None,
) -> tuple[jax.Array, jax.Array]:
    """Inference → ``(log_probs [B,K,T_s], picks [B,K])``; greedy or top-k
    sampling (the reference's two decode modes), or ``mode='beam'`` beam
    search over sentence sequences (beam width = ``topk``; returns the
    best beam's total log-prob broadcast in place of per-step log_probs)."""
    M = mmbidaf_fused_reps(params, batch, cfg, rng=None, audio_g_fn=audio_g_fn)
    if mode == "beam":
        from mmbidaf_tpu.models.decoder import decoder_beam_search

        seq_lp, picks = decoder_beam_search(
            params["decoder"], M, batch["sent_mask"],
            num_steps=cfg.model.max_decode_steps, beam_size=topk,
            mask_selected=cfg.model.mask_selected,
        )
        return seq_lp, picks
    return decoder_apply(
        params["decoder"],
        M,
        batch["sent_mask"],
        targets=None,
        num_steps=cfg.model.max_decode_steps,
        teacher_forcing=False,
        mask_selected=cfg.model.mask_selected,
        mode=mode,
        topk=topk,
        rng=rng,
    )
