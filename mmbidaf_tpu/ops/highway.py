"""Highway network (SURVEY.md §9 "Highway").

Per layer: ``g = σ(W_g x + b_g)``, ``t = relu(W_t x + b_t)``,
``x ← g∘t + (1−g)∘x``. Two layers by default, no dropout inside.

Pure function + param pytree. Weights are stored as ``[in, out]`` so the
forward is ``x @ W`` (torch ``nn.Linear`` stores the transpose — the port in
``mmbidaf_tpu.interop.torch_port`` handles that).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def highway_init(key: jax.Array, num_layers: int, dim: int, dtype=jnp.float32) -> dict:
    layers = []
    for i in range(num_layers):
        k_g, k_t, key = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(dim)  # torch Linear default init range
        layers.append(
            {
                "gate_w": jax.random.uniform(k_g, (dim, dim), dtype, -bound, bound),
                "gate_b": jnp.zeros((dim,), dtype),
                "transform_w": jax.random.uniform(k_t, (dim, dim), dtype, -bound, bound),
                "transform_b": jnp.zeros((dim,), dtype),
            }
        )
    return {"layers": layers}


def highway_apply(params: dict, x: jax.Array) -> jax.Array:
    for layer in params["layers"]:
        g = jax.nn.sigmoid(x @ layer["gate_w"] + layer["gate_b"])
        t = jax.nn.relu(x @ layer["transform_w"] + layer["transform_b"])
        x = g * t + (1.0 - g) * x
    return x
