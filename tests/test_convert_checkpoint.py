"""tools/convert_torch_checkpoint.py: a torch.save'd reference checkpoint
becomes a loadable orbax run whose forward matches the torch oracle."""

import json
import os
import subprocess
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import config_to_dict, tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_init, mmbidaf_decode
from mmbidaf_tpu.train import checkpoint as ckpt
from mmbidaf_tpu.train.loop import init_train_state
from tests.oracles import torch_model as oracle

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_convert_torch_checkpoint_cli(tmp_path):
    cfg = tiny_test_config()
    rng = np.random.default_rng(5)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    torch.manual_seed(5)
    tm = oracle.MMBiDAF(
        torch.from_numpy(wv), cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim,
        audio_feat_dim=cfg.model.audio_feat_dim,
        num_decode_steps=cfg.model.max_decode_steps,
    ).eval()
    # starter-style wrapper, exactly what the reference's CheckpointSaver writes
    torch.save({"model_state": tm.state_dict(), "step": 1234},
               tmp_path / "best.pth.tar")
    with open(tmp_path / "cfg.json", "w") as f:
        json.dump(config_to_dict(cfg), f)

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = tmp_path / "imported"
    res = subprocess.run(
        [sys.executable, "tools/convert_torch_checkpoint.py",
         "--torch_ckpt", str(tmp_path / "best.pth.tar"),
         "--config_json", str(tmp_path / "cfg.json"), "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert (out / "config.json").exists()

    # restore through the normal run-dir path and compare decode picks
    # against the torch oracle (the checkpoint-parity contract).
    template_params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    template = init_train_state(jax.random.key(1), template_params, cfg)
    manager = ckpt.make_manager(str(out / "ckpts"))
    restored = ckpt.restore_latest(manager, template)
    assert restored is not None

    batch = synthetic_batch(rng, cfg, batch_size=2)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    _, picks = mmbidaf_decode(restored.ema_params, jb, cfg)

    with torch.no_grad():
        _, t_picks = tm(
            text_ids=torch.from_numpy(batch["text_ids"]).long(),
            word_mask=torch.from_numpy(batch["word_mask"]),
            sent_mask=torch.from_numpy(batch["sent_mask"]),
            images=torch.from_numpy(batch["images"]),
            img_mask=torch.from_numpy(batch["img_mask"]),
            audio=torch.from_numpy(batch["audio"]),
            aud_mask=torch.from_numpy(batch["aud_mask"]),
        )
    np.testing.assert_array_equal(np.asarray(picks), t_picks.numpy())
