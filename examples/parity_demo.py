"""Executable parity demo: reference-style torch checkpoint → JAX forward.

Builds the torch reference model (the oracle from tests/), exports its
state_dict, ports it through ``interop.torch_port.port_mmbidaf``, and shows
the jitted JAX forward reproducing the torch forward (fp32 tolerance) with
identical greedy picks — the checkpoint-parity contract of SURVEY.md §1.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/parity_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import torch

    import jax
    import jax.numpy as jnp

    from mmbidaf_tpu.config import tiny_test_config
    from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
    from mmbidaf_tpu.interop.torch_port import port_mmbidaf
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode
    from tests.oracles import torch_model as oracle

    cfg = tiny_test_config(hidden_size=24)
    rng = np.random.default_rng(0)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)

    torch.manual_seed(0)
    reference = oracle.MMBiDAF(
        torch.from_numpy(wv), cfg.model.hidden_size,
        img_feat_dim=cfg.model.img_feat_dim,
        audio_feat_dim=cfg.model.audio_feat_dim,
        num_decode_steps=cfg.model.max_decode_steps,
    ).eval()
    print(f"torch reference: {sum(p.numel() for p in reference.parameters()):,} params")

    sd = {k: v.detach().numpy() for k, v in reference.state_dict().items()}
    params = port_mmbidaf(sd)  # ← the checkpoint-import path
    print("ported state_dict →", len(jax.tree.leaves(params)), "JAX arrays")

    batch = synthetic_batch(rng, cfg, batch_size=2)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    log_p, picks = mmbidaf_decode(params, jbatch, cfg)

    with torch.no_grad():
        t_log_p, t_picks = reference(
            text_ids=torch.from_numpy(batch["text_ids"]).long(),
            word_mask=torch.from_numpy(batch["word_mask"]),
            sent_mask=torch.from_numpy(batch["sent_mask"]),
            images=torch.from_numpy(batch["images"]),
            img_mask=torch.from_numpy(batch["img_mask"]),
            audio=torch.from_numpy(batch["audio"]),
            aud_mask=torch.from_numpy(batch["aud_mask"]),
        )

    valid = batch["sent_mask"][:, None, :] > 0
    valid = np.broadcast_to(valid, t_log_p.shape)
    max_err = float(np.abs(np.asarray(log_p)[valid] - t_log_p.numpy()[valid]).max())
    picks_match = bool((np.asarray(picks) == t_picks.numpy()).all())
    print(f"forward max |Δlog_p| at valid positions: {max_err:.2e}")
    print(f"greedy picks identical: {picks_match}")
    print(f"  torch picks: {t_picks.numpy().tolist()}")
    print(f"  jax picks:   {np.asarray(picks).tolist()}")
    assert max_err < 5e-5 and picks_match
    print("PARITY OK")


if __name__ == "__main__":
    main()
