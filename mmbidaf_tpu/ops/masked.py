"""Masked softmax exactly matching the reference's ``masked_softmax``.

SURVEY.md §9: ``softmax(mask*x + (1-mask)*(-1e30))`` — the large-negative fill
is applied *before* softmax (the multiplicative form, per the squad-starter
lineage), with a log-softmax variant where NLL follows. Parity dies at the
attention layer if this form differs (SURVEY §8 R3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mask_logits(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """``mask*logits + (1-mask)*(-1e30)`` with mask broadcast to logits."""
    mask = jnp.broadcast_to(mask, logits.shape).astype(logits.dtype)
    return mask * logits + (1.0 - mask) * NEG_INF


def masked_softmax(
    logits: jax.Array,
    mask: jax.Array,
    axis: int = -1,
    log_softmax: bool = False,
) -> jax.Array:
    """Softmax over ``axis`` treating ``mask==0`` positions as -1e30."""
    masked = mask_logits(logits, mask)
    if log_softmax:
        return jax.nn.log_softmax(masked, axis=axis)
    return jax.nn.softmax(masked, axis=axis)
