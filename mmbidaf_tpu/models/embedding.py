"""Text embedding: frozen GloVe lookup → linear proj (no bias) → 2-layer highway.

SURVEY.md §9 "Embedding": GloVe vectors frozen, OOV→zeros at a reserved
index, projection 300→h, then highway at dim h. The lookup is a gather from
an on-device ``[V, 300]`` table — part of the jitted graph (device-side
preprocessing stage, SURVEY §2 L1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mmbidaf_tpu.ops.highway import highway_apply, highway_init


def embedding_init(
    key: jax.Array,
    word_vectors: jax.Array,
    hidden_size: int,
    num_highway_layers: int = 2,
    dtype=jnp.float32,
) -> dict:
    """``word_vectors`` is the pretrained ``[V, emb_dim]`` GloVe table."""
    k_proj, k_hwy = jax.random.split(key)
    emb_dim = word_vectors.shape[1]
    bound = 1.0 / jnp.sqrt(emb_dim)
    return {
        "table": jnp.asarray(word_vectors, dtype),
        "proj_w": jax.random.uniform(k_proj, (emb_dim, hidden_size), dtype, -bound, bound),
        "highway": highway_init(k_hwy, num_highway_layers, hidden_size, dtype),
    }


def embedding_apply(
    params: dict,
    token_ids: jax.Array,
    drop_prob: float = 0.0,
    rng: jax.Array | None = None,
) -> jax.Array:
    """``token_ids [...]`` → embeddings ``[..., hidden]``.

    Dropout is applied to the raw GloVe vectors before projection (parity
    with the reference's ``Embedding.forward``).
    """
    # The table is FROZEN (reference: requires_grad=False) — stop_gradient
    # removes the [V, emb_dim] scatter-add from every backward pass.
    emb = jax.lax.stop_gradient(params["table"])[token_ids]
    if drop_prob > 0.0 and rng is not None:
        keep = 1.0 - drop_prob
        emb = emb * jax.random.bernoulli(rng, keep, emb.shape) / keep
    emb = emb @ params["proj_w"]
    return highway_apply(params["highway"], emb)
