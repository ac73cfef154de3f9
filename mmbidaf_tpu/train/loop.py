"""Jitted training step, loss, EMA (SURVEY.md §4.2 rebuild plan).

The reference's eager loop (forward → backward → clip → step → EMA) becomes
ONE donated-buffer jitted function ``train_step(state, batch) → (state,
metrics)``; the Python loop only feeds batches and logs. The embedding table
is frozen (GloVe, SURVEY §9) via an optax mask.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax

from mmbidaf_tpu.config import Config
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_decode


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any
    rng: jax.Array


def nll_sum(
    log_probs: jax.Array, targets: jax.Array, target_mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Summed NLL + valid-step count (the unnormalized pieces — gradient
    accumulation sums these across microbatches and divides once, which
    keeps accumulated gradients EXACTLY equal to the full-batch gradient
    even when microbatches carry unequal mask counts)."""
    gold_lp = jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]  # [B, K]
    target_mask = target_mask.astype(log_probs.dtype)
    return -(gold_lp * target_mask).sum(), target_mask.sum()


def nll_loss(log_probs: jax.Array, targets: jax.Array, target_mask: jax.Array) -> jax.Array:
    """Mean per-step NLL against gold sentence indices (SURVEY §1)."""
    total, count = nll_sum(log_probs, targets, target_mask)
    return total / jnp.maximum(count, 1.0)


def _frozen_mask(params: Any) -> Any:
    """True on the GloVe table (requires_grad=False in the reference)."""

    def mask_fn(path, _):
        return len(path) >= 2 and path[-1].key == "table"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def _trainable_mask(params: Any) -> Any:
    return jax.tree.map(lambda m: not m, _frozen_mask(params))


def make_lr_schedule(cfg: Config) -> optax.Schedule:
    """Warmup + {constant, cosine, exponential} decay (reference LR-scheduler slot)."""
    t = cfg.train
    floor = t.lr * t.lr_min_ratio
    if t.lr_schedule == "constant":
        main = optax.constant_schedule(t.lr)
    elif t.lr_schedule == "cosine":
        main = optax.cosine_decay_schedule(t.lr, t.decay_steps, alpha=t.lr_min_ratio)
    elif t.lr_schedule == "exponential":
        main = optax.exponential_decay(
            t.lr, t.decay_steps, decay_rate=t.lr_min_ratio, end_value=floor
        )
    else:
        raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
    if t.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, t.lr, t.warmup_steps)
        return optax.join_schedules([warmup, main], [t.warmup_steps])
    return main


def make_optimizer(cfg: Config, params: Any = None) -> optax.GradientTransformation:
    """Build the optimizer for ``cfg``. ``params`` is unused (kept for API
    compatibility): the frozen-GloVe mask is passed as a callable, so the
    transformation needs no parameter pytree at construction time."""
    del params
    t = cfg.train
    schedule = make_lr_schedule(cfg)
    if t.optimizer == "adadelta":
        opt = optax.adadelta(learning_rate=schedule)
    elif t.optimizer == "adam":
        opt = optax.adam(learning_rate=schedule)
    else:
        raise ValueError(f"unknown optimizer {t.optimizer!r}")
    # The optimizer runs ONLY on trainable leaves (optax.masked keeps no
    # accumulator state for the frozen GloVe table — [V, 300] adadelta/adam
    # moments and their per-step passes would be pure waste); the frozen
    # leaf's passed-through "update" (its zero grad — embedding lookup is
    # stop_gradient'ed) is then zeroed explicitly for safety.
    if t.flat_updates:
        # Flat path: ravel the 56 trainable leaves into ONE vector and run
        # decay+clip+optimizer on it — a handful of full-width fused passes
        # instead of ~6 tiny fusions per leaf (the measured "optimizer tail"
        # of the train step). Numerics: elementwise math is identical;
        # the global grad norm reassociates (one sum vs per-leaf partials),
        # and with l2_wd>0 the frozen table's decay term no longer enters
        # the clip norm (it was discarded by set_to_zero anyway — the flat
        # form is the more faithful reading of torch clip_grad_norm_ over
        # requires_grad params). Flag-parity tested in tests/test_train.py.
        inner = [optax.clip_by_global_norm(t.max_grad_norm), opt]
        if t.l2_wd > 0:
            inner.insert(0, optax.add_decayed_weights(t.l2_wd))
        chain = [optax.masked(optax.flatten(optax.chain(*inner)), _trainable_mask)]
    else:
        chain = [optax.clip_by_global_norm(t.max_grad_norm),
                 optax.masked(opt, _trainable_mask)]
        if t.l2_wd > 0:
            chain.insert(0, optax.add_decayed_weights(t.l2_wd))
    chain.append(optax.masked(optax.set_to_zero(), _frozen_mask))
    return optax.chain(*chain)


def init_train_state(key: jax.Array, params: Any, cfg: Config) -> TrainState:
    tx = make_optimizer(cfg, params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        rng=key,
    )


def make_train_step(
    cfg: Config, fe_params: Any = None, vgg_spec=None,
    audio_g_fn: Callable | None = None, data_shards: int = 1,
) -> Callable:
    """Build the jitted, donated train step for config ``cfg``.

    With ``fe_params`` given, batches may be RAW (frames/waveform instead of
    features): the device-side frontend runs inside the jitted step, frozen
    (the reference also trains on frozen VGG/MFCC features — SURVEY §3.1).

    ``audio_g_fn`` (``parallel.sp_tower.make_sp_audio_tower``, wired by
    ``MeshConfig.sp_audio``) runs the audio tower sequence-parallel; batches
    must then be raw (carry ``waveform``).

    ``data_shards``: ways the batch shards over the mesh's data axes, so
    the raw-mode frontend's auto frame-chunk heuristic budgets per-chip
    activations (see ``data/frontend.py::_auto_vgg_chunk``).
    """
    decay = cfg.train.ema_decay
    # Built eagerly from THIS cfg (a lazily-cached closure would silently
    # pin the first call's cfg); the optimizer state lives in TrainState.
    tx = make_optimizer(cfg)

    if fe_params is not None:
        from mmbidaf_tpu.data.frontend import apply_frontend
        from mmbidaf_tpu.ops.vgg import VGG16_SPEC

        spec = vgg_spec or VGG16_SPEC
    elif audio_g_fn is not None:
        raise ValueError(
            "audio_g_fn (MeshConfig.sp_audio) needs raw waveform batches — "
            "pass fe_params so the train step runs the device-side frontend"
        )

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Mapping[str, jax.Array]):
        rng, step_rng = jax.random.split(state.rng)
        raw_mode = fe_params is not None and ("frames" in batch or "waveform" in batch)
        if audio_g_fn is not None and "waveform" not in batch:
            raise ValueError(
                "MeshConfig.sp_audio: the batch must carry the raw "
                "'waveform' (precomputed-feature batches cannot feed the "
                "sequence-parallel frontend)"
            )

        def featurize(b):
            if not raw_mode:
                return b
            feat = apply_frontend(
                fe_params, b, cfg, spec, sp_audio=audio_g_fn is not None,
                data_shards=data_shards,
            )
            feat["targets"] = b["targets"]
            feat["target_mask"] = b["target_mask"]
            return feat

        accum = cfg.train.grad_accum_steps
        if accum == 1:
            batch_f = featurize(batch)

            def loss_fn(params):
                log_p = mmbidaf_apply(
                    params, batch_f, cfg, rng=step_rng, audio_g_fn=audio_g_fn
                )
                return nll_loss(log_p, batch_f["targets"], batch_f["target_mask"])

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        else:
            # Gradient accumulation: scan over microbatches summing the
            # UNNORMALIZED nll and its grads, divide by the total valid-step
            # count once — bitwise the full-batch gradient semantics (modulo
            # fp reassociation) even with ragged target masks. The (frozen)
            # frontend runs INSIDE each microbatch too, so the raw-video
            # path's dominant VGG activations also shrink ~1/accum.
            def sum_loss_fn(params, mb, rng):
                mb_f = featurize(mb)
                log_p = mmbidaf_apply(params, mb_f, cfg, rng=rng, audio_g_fn=audio_g_fn)
                total, count = nll_sum(log_p, mb_f["targets"], mb_f["target_mask"])
                return total, count

            b_dim = jax.tree.leaves(batch)[0].shape[0]
            if b_dim % accum:
                raise ValueError(
                    f"grad_accum_steps {accum} must divide batch size {b_dim}"
                )
            mbs = jax.tree.map(
                lambda a: a.reshape(accum, a.shape[0] // accum, *a.shape[1:]),
                batch,
            )
            mb_rngs = jax.random.split(step_rng, accum)

            def acc_body(carry, xs):
                g_acc, l_acc, c_acc = carry
                mb, rng_i = xs
                (total, count), g = jax.value_and_grad(sum_loss_fn, has_aux=True)(
                    state.params, mb, rng_i
                )
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    l_acc + total,
                    c_acc + count,
                ), None

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (grads, loss_sum, count_sum), _ = jax.lax.scan(
                acc_body, (g0, jnp.zeros(()), jnp.zeros(())), (mbs, mb_rngs)
            )
            denom = jnp.maximum(count_sum, 1.0)
            grads = jax.tree.map(lambda g: g / denom, grads)
            loss = loss_sum / denom
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA with bias correction by step (starter variant, SURVEY §9).
        # The frozen table's shadow is the table itself — skipping the blend
        # saves two [V, 300] passes per step.
        step = state.step + 1
        d = jnp.minimum(decay, (1.0 + step) / (10.0 + step))
        frozen = _frozen_mask(params)
        ema_params = jax.tree.map(
            lambda e, p, f: p if f else d * e + (1.0 - d) * p,
            state.ema_params, params, frozen,
        )
        grad_norm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        return (
            TrainState(step=step, params=params, opt_state=opt_state,
                       ema_params=ema_params, rng=rng),
            metrics,
        )

    return train_step


def make_eval_step(
    cfg: Config, audio_g_fn: Callable | None = None, out_sharding=None
) -> Callable:
    """``out_sharding`` (a NamedSharding) forces the outputs' placement —
    multi-process runs pass the replicated sharding so every host can fetch
    the picks (a batch-sharded output is not addressable off-host; the
    all-gather XLA inserts is a [B, K] int array, negligible)."""
    kw = {} if out_sharding is None else {"out_shardings": out_sharding}

    @partial(jax.jit, **kw)
    def eval_step(params: Any, batch: Mapping[str, jax.Array]):
        # Loss must be TEACHER-FORCED: greedy decode masks already-picked
        # sentences, so when greedy and gold disagree on order the gold
        # index can be masked (-1e30 log-prob) and the NLL explodes.
        log_p_tf = mmbidaf_apply(params, batch, cfg, rng=None, audio_g_fn=audio_g_fn)
        loss = nll_loss(log_p_tf, batch["targets"], batch["target_mask"])
        _, picks = mmbidaf_decode(params, batch, cfg, audio_g_fn=audio_g_fn)
        return {"loss": loss, "picks": picks}

    return eval_step
