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


def port_lstm_direction(
    sd: Mapping[str, np.ndarray], prefix: str, suffix: str = "", layer: int = 0
) -> dict:
    """One direction of ``nn.LSTM`` layer ``layer`` → our ``{w_x, w_h, b}`` layout."""
    w_ih = np.asarray(sd[_key(prefix, f"weight_ih_l{layer}{suffix}")])  # [4h, in]
    w_hh = np.asarray(sd[_key(prefix, f"weight_hh_l{layer}{suffix}")])  # [4h, h]
    b = np.asarray(sd[_key(prefix, f"bias_ih_l{layer}{suffix}")]) + np.asarray(
        sd[_key(prefix, f"bias_hh_l{layer}{suffix}")]
    )
    return {
        "w_x": jnp.asarray(w_ih.T),
        "w_h": jnp.asarray(w_hh.T),
        "b": jnp.asarray(b),
    }


def port_bilstm(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """Bidirectional ``nn.LSTM`` → ``{"fwd": ..., "bwd": ...}``.

    The layer count is read off the state_dict (``weight_ih_l{k}`` keys):
    1 layer gives the flat pytree, deeper stacks give ``{"layers": [...]}``
    matching :func:`mmbidaf_tpu.ops.lstm.stacked_bilstm_init`.
    """
    num_layers = 0
    while _key(prefix, f"weight_ih_l{num_layers}") in sd:
        num_layers += 1
    if num_layers == 0:
        raise KeyError(f"no nn.LSTM weights under prefix {prefix!r}")

    def one(layer: int) -> dict:
        return {
            "fwd": port_lstm_direction(sd, prefix, layer=layer),
            "bwd": port_lstm_direction(sd, prefix, "_reverse", layer=layer),
        }

    if num_layers == 1:
        return one(0)
    return {"layers": [one(k) for k in range(num_layers)]}


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


# ---------------------------------------------------------------------------
# Reverse direction: JAX params pytree → reference-layout state_dict (numpy).
# Lets models trained here be loaded by the PyTorch reference (or any tool
# expecting its checkpoint format). export then port_mmbidaf is identity.
# ---------------------------------------------------------------------------

def _export_linear(out: dict, prefix: str, w, b=None) -> None:
    out[_key(prefix, "weight")] = np.asarray(w).T
    if b is not None:
        out[_key(prefix, "bias")] = np.asarray(b)


def _export_lstm_direction(
    out: dict, prefix: str, p: dict, suffix: str = "", layer: int = 0
) -> None:
    out[_key(prefix, f"weight_ih_l{layer}{suffix}")] = np.asarray(p["w_x"]).T
    out[_key(prefix, f"weight_hh_l{layer}{suffix}")] = np.asarray(p["w_h"]).T
    b = np.asarray(p["b"])
    # torch stores two bias vectors that are summed; split evenly.
    out[_key(prefix, f"bias_ih_l{layer}{suffix}")] = b * 0.5
    out[_key(prefix, f"bias_hh_l{layer}{suffix}")] = b * 0.5


def _export_bilstm(out: dict, prefix: str, p: dict) -> None:
    layers = p["layers"] if "layers" in p else [p]
    for k, lp in enumerate(layers):
        _export_lstm_direction(out, prefix, lp["fwd"], layer=k)
        _export_lstm_direction(out, prefix, lp["bwd"], "_reverse", layer=k)


def _export_bidaf(out: dict, prefix: str, p: dict) -> None:
    out[_key(prefix, "c_weight")] = np.asarray(p["w_c"]).reshape(-1, 1)
    out[_key(prefix, "q_weight")] = np.asarray(p["w_q"]).reshape(-1, 1)
    out[_key(prefix, "cq_weight")] = np.asarray(p["w_cq"]).reshape(1, 1, -1)
    out[_key(prefix, "bias")] = np.asarray(p["bias"]).reshape(1)


def export_mmbidaf(params: dict) -> dict:
    """Our params pytree → reference-layout ``dict[str, np.ndarray]``."""
    out: dict = {}
    emb = params["embedding"]
    out["emb.embed.weight"] = np.asarray(emb["table"])
    _export_linear(out, "emb.proj", emb["proj_w"])
    for i, layer in enumerate(emb["highway"]["layers"]):
        _export_linear(out, f"emb.hwy.gates.{i}", layer["gate_w"], layer["gate_b"])
        _export_linear(out, f"emb.hwy.transforms.{i}", layer["transform_w"], layer["transform_b"])
    _export_bilstm(out, "word_enc.rnn", params["word_lstm"])
    _export_bilstm(out, "sent_enc.rnn", params["sent_lstm"])
    if "img_lstm" in params:
        _export_bilstm(out, "img_enc.rnn", params["img_lstm"])
        _export_bidaf(out, "att_img", params["att_img"])
    if "aud_lstm" in params:
        _export_bilstm(out, "aud_enc.rnn", params["aud_lstm"])
        _export_bidaf(out, "att_aud", params["att_aud"])
    if "att_self" in params:
        _export_bidaf(out, "att_self", params["att_self"])
    _export_linear(out, "fuse", params["fuse_w"], params["fuse_b"])
    _export_bilstm(out, "model_enc.rnn", params["model_lstm"])
    dec = params["decoder"]
    out["decoder.cell.weight_ih"] = np.asarray(dec["lstm"]["w_x"]).T
    out["decoder.cell.weight_hh"] = np.asarray(dec["lstm"]["w_h"]).T
    out["decoder.cell.bias_ih"] = np.asarray(dec["lstm"]["b"]) * 0.5
    out["decoder.cell.bias_hh"] = np.asarray(dec["lstm"]["b"]) * 0.5
    out["decoder.w_m"] = np.asarray(dec["w_m"])
    out["decoder.w_d"] = np.asarray(dec["w_d"])
    out["decoder.v"] = np.asarray(dec["v"])
    out["decoder.start"] = np.asarray(dec["start"])
    return out
