"""Golden-file regression (SURVEY.md §5 item 5): fixed seed + fixed tiny
config → checked-in output statistics, to catch silent numerical drift
across JAX upgrades. Regenerate with ``python tests/test_golden.py``.

The goldens are pinned on the CPU backend only (the conftest test mesh):
TPU numerics legitimately differ (MXU accumulation order, bf16 paths), so
an on-TPU golden would pin noise, not correctness — TPU behavior is
covered by the parity and kernel tests instead.
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_apply, mmbidaf_init

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "golden_logits.json")


def _compute():
    cfg = tiny_test_config()
    rng = np.random.default_rng(1234)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(1234), cfg, jnp.asarray(wv))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(rng, cfg, batch_size=2).items()}
    log_p = np.asarray(mmbidaf_apply(params, batch, cfg))
    return {
        "sum": float(log_p.sum()),
        "mean_valid": float(log_p[log_p > -1e20].mean()),
        "first_row": [float(x) for x in log_p[0, 0, :5]],
    }


def test_golden_regression():
    got = _compute()
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    np.testing.assert_allclose(got["sum"], want["sum"], rtol=1e-4)
    np.testing.assert_allclose(got["mean_valid"], want["mean_valid"], rtol=1e-4)
    np.testing.assert_allclose(got["first_row"], want["first_row"], rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(_compute(), f, indent=1)
    print("wrote", GOLDEN_PATH)
