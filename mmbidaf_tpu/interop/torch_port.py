"""PyTorch state_dict → JAX pytree weight porting (SURVEY.md §4.5, §9).

Handles the parity-critical conventions:
- ``nn.Linear`` stores ``W ∈ [out, in]`` → transpose to our ``x @ W`` layout.
- ``nn.LSTM``: ``weight_ih_l0 ∈ [4h, in]``, ``weight_hh_l0 ∈ [4h, h]``, two
  bias vectors that are *summed*; gate block order i, f, g, o (we keep the
  same order, so no permutation); reverse direction in ``*_l0_reverse``.

This module takes a plain ``dict[str, np.ndarray]`` (call
``{k: v.detach().numpy() for k, v in sd.items()}`` on the torch side) so the
product path never imports torch.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def port_linear(sd: Mapping[str, np.ndarray], prefix: str, bias: bool = True) -> dict:
    """``nn.Linear`` → ``{"w": [in, out], "b": [out]}`` (b absent if bias=False)."""
    out = {"w": jnp.asarray(np.asarray(sd[_key(prefix, "weight")]).T)}
    if bias:
        out["b"] = jnp.asarray(np.asarray(sd[_key(prefix, "bias")]))
    return out


def port_lstm_direction(sd: Mapping[str, np.ndarray], prefix: str, suffix: str = "") -> dict:
    """One direction of ``nn.LSTM`` layer 0 → our ``{w_x, w_h, b}`` layout."""
    w_ih = np.asarray(sd[_key(prefix, f"weight_ih_l0{suffix}")])  # [4h, in]
    w_hh = np.asarray(sd[_key(prefix, f"weight_hh_l0{suffix}")])  # [4h, h]
    b = np.asarray(sd[_key(prefix, f"bias_ih_l0{suffix}")]) + np.asarray(
        sd[_key(prefix, f"bias_hh_l0{suffix}")]
    )
    return {
        "w_x": jnp.asarray(w_ih.T),
        "w_h": jnp.asarray(w_hh.T),
        "b": jnp.asarray(b),
    }


def port_bilstm(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """Bidirectional ``nn.LSTM`` → ``{"fwd": ..., "bwd": ...}``."""
    return {
        "fwd": port_lstm_direction(sd, prefix),
        "bwd": port_lstm_direction(sd, prefix, "_reverse"),
    }


def port_highway(sd: Mapping[str, np.ndarray], prefix: str, num_layers: int = 2) -> dict:
    """``HighwayEncoder`` (gates/transforms ModuleLists) → our layout."""
    layers = []
    for i in range(num_layers):
        g = port_linear(sd, _key(prefix, f"gates.{i}"))
        t = port_linear(sd, _key(prefix, f"transforms.{i}"))
        layers.append(
            {
                "gate_w": g["w"],
                "gate_b": g["b"],
                "transform_w": t["w"],
                "transform_b": t["b"],
            }
        )
    return {"layers": layers}


def port_bidaf_attention(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """``BiDAFAttention`` weights ([d,1]/[1,1,d] shapes) → flat vectors."""
    return {
        "w_c": jnp.asarray(np.asarray(sd[_key(prefix, "c_weight")]).reshape(-1)),
        "w_q": jnp.asarray(np.asarray(sd[_key(prefix, "q_weight")]).reshape(-1)),
        "w_cq": jnp.asarray(np.asarray(sd[_key(prefix, "cq_weight")]).reshape(-1)),
        "bias": jnp.asarray(np.asarray(sd[_key(prefix, "bias")]).reshape(())),
    }


def port_embedding(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """``Embedding`` (frozen GloVe + proj + 2-layer highway) → our layout."""
    return {
        "table": jnp.asarray(np.asarray(sd[_key(prefix, "embed.weight")])),
        "proj_w": port_linear(sd, _key(prefix, "proj"), bias=False)["w"],
        "highway": port_highway(sd, _key(prefix, "hwy")),
    }


def port_lstm_cell(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """``nn.LSTMCell`` → our ``{w_x, w_h, b}`` layout (same i,f,g,o order)."""
    b = np.asarray(sd[_key(prefix, "bias_ih")]) + np.asarray(sd[_key(prefix, "bias_hh")])
    return {
        "w_x": jnp.asarray(np.asarray(sd[_key(prefix, "weight_ih")]).T),
        "w_h": jnp.asarray(np.asarray(sd[_key(prefix, "weight_hh")]).T),
        "b": jnp.asarray(b),
    }


def port_decoder(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """``SentencePointerDecoder`` oracle → our decoder params."""
    return {
        "lstm": port_lstm_cell(sd, _key(prefix, "cell")),
        "w_m": jnp.asarray(np.asarray(sd[_key(prefix, "w_m")])),
        "w_d": jnp.asarray(np.asarray(sd[_key(prefix, "w_d")])),
        "v": jnp.asarray(np.asarray(sd[_key(prefix, "v")])),
        "start": jnp.asarray(np.asarray(sd[_key(prefix, "start")])),
    }


def port_mmbidaf(
    sd: Mapping[str, np.ndarray],
    use_images: bool = True,
    use_audio: bool = True,
) -> dict:
    """Full reference ``MMBiDAF`` state_dict → our model params pytree.

    This is the checkpoint-import path of SURVEY.md §4.5 — given a trained
    reference checkpoint (torch ``state_dict`` exported to numpy), produces a
    params pytree whose jitted forward reproduces the torch forward.
    """
    params = {
        "embedding": port_embedding(sd, "emb"),
        "word_lstm": port_bilstm(sd, "word_enc.rnn"),
        "sent_lstm": port_bilstm(sd, "sent_enc.rnn"),
        "decoder": port_decoder(sd, "decoder"),
    }
    if use_images:
        params["img_lstm"] = port_bilstm(sd, "img_enc.rnn")
        params["att_img"] = port_bidaf_attention(sd, "att_img")
    if use_audio:
        params["aud_lstm"] = port_bilstm(sd, "aud_enc.rnn")
        params["att_aud"] = port_bidaf_attention(sd, "att_aud")
    if not use_images and not use_audio:
        params["att_self"] = port_bidaf_attention(sd, "att_self")
    fuse = port_linear(sd, "fuse")
    params["fuse_w"] = fuse["w"]
    params["fuse_b"] = fuse["b"]
    params["model_lstm"] = port_bilstm(sd, "model_enc.rnn")
    return params
