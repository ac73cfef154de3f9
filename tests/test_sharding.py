"""Multi-device correctness on the faked v5e-8 CPU mesh (SURVEY.md §5 item 3):
sharded batch-32 inference equals single-device inference; sharded train step
runs and reduces gradients.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mmbidaf_tpu.config import tiny_test_config
from mmbidaf_tpu.data.synthetic import random_word_vectors, synthetic_batch
from mmbidaf_tpu.models.mmbidaf import mmbidaf_decode, mmbidaf_init
from mmbidaf_tpu.parallel import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)
from mmbidaf_tpu.train.loop import init_train_state, make_train_step
from mmbidaf_tpu.config import MeshConfig


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    rng = np.random.default_rng(11)
    wv = random_word_vectors(rng, cfg.data.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    batch = synthetic_batch(rng, cfg, batch_size=32)
    return cfg, params, batch


def test_sharded_inference_equals_single_device(setup, eight_device_mesh):
    cfg, params, batch = setup
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    # Single-device ground truth.
    log_p_1, picks_1 = jax.jit(
        lambda p, b: mmbidaf_decode(p, b, cfg)
    )(params, jbatch)

    # 8-way batch-sharded.
    mesh = eight_device_mesh
    sparams = shard_params(params, mesh)
    sbatch = shard_batch(jbatch, mesh)
    log_p_8, picks_8 = jax.jit(
        lambda p, b: mmbidaf_decode(p, b, cfg),
        out_shardings=batch_sharding(mesh),
    )(sparams, sbatch)

    np.testing.assert_array_equal(np.asarray(picks_1), np.asarray(picks_8))
    np.testing.assert_allclose(
        np.asarray(log_p_1), np.asarray(log_p_8), atol=1e-5
    )


def test_sharded_train_step_runs(setup, eight_device_mesh):
    cfg, params, batch = setup
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, optimizer="adam", lr=1e-3)
    )
    mesh = eight_device_mesh
    state = init_train_state(jax.random.key(1), shard_params(params, mesh), cfg)
    sbatch = shard_batch({k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    train_step = make_train_step(cfg)
    state, metrics = train_step(state, sbatch)
    assert np.isfinite(float(metrics["loss"]))
    # Params remain replicated after the update (grads were psum-reduced).
    fuse_sh = state.params["fuse_w"].sharding
    assert fuse_sh.is_fully_replicated


def test_two_level_dcn_mesh_factory():
    mesh = make_mesh(MeshConfig(num_dcn=2, num_data=4))
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
