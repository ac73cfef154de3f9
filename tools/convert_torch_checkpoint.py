"""Convert a reference PyTorch checkpoint into an orbax run directory.

The migration path for reference users (SURVEY §4.5): take a
``torch.save``'d checkpoint (either a bare ``state_dict`` or the
starter-style ``{"model_state": ...}`` wrapper), port every tensor through
``interop.torch_port`` (LSTM gate order i,f,g,o, summed biases, transposed
Linears, ``_reverse`` directions), and write a normal run directory —
``config.json`` + ``ckpts/`` — that ``infer.py --load_dir`` and
``Summarizer.from_checkpoint`` consume. Parity of the ported forward is
covered by tests/test_model_parity.py (allclose + exact greedy picks).

    python tools/convert_torch_checkpoint.py --torch_ckpt best.pth.tar \\
        --config_json cfg.json --out runs/imported \\
        [--vocab vocab.json --emb emb.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_ckpt", required=True, help=".pt / .pth.tar file")
    ap.add_argument("--config_json", required=True,
                    help="model config matching the checkpoint's architecture")
    ap.add_argument("--out", required=True, help="run directory to create")
    ap.add_argument("--vocab", default=None, help="vocab json (for serving)")
    ap.add_argument("--emb", default=None, help="embedding .npz (for serving)")
    args = ap.parse_args()

    import torch  # test-time dependency; conversion is a host-side tool

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.config import config_from_json
    from mmbidaf_tpu.interop.torch_port import port_mmbidaf
    from mmbidaf_tpu.train import checkpoint as ckpt
    from mmbidaf_tpu.train.loop import init_train_state

    cfg = config_from_json(args.config_json)
    blob = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("model_state", blob.get("state_dict", blob)) if isinstance(blob, dict) else blob
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "shape")}

    params = port_mmbidaf(
        sd, use_images=cfg.model.use_images, use_audio=cfg.model.use_audio
    )
    params = jax.tree.map(jnp.asarray, params)

    # A fresh TrainState around the ported params (step 0, fresh optimizer
    # state, EMA = params — the reference stores only model weights).
    state = init_train_state(jax.random.key(cfg.train.seed), params, cfg)

    ckpt.save_config(args.out, cfg)
    manager = ckpt.make_manager(os.path.join(args.out, "ckpts"),
                                cfg.train.max_checkpoints, "loss", maximize=False)
    ckpt.save(manager, state, {"loss": 0.0})
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"converted {len(sd)} torch tensors -> {args.out} "
          f"({n / 1e6:.2f}M params, orbax step 0)")


if __name__ == "__main__":
    main()
