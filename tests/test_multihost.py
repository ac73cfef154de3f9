"""Two-process multi-host tests over the ('dcn', 'data') 2-level mesh
(SURVEY.md §3.3 comm-backend row; VERDICT r2 #8 / r3 item 5).

Spawns two CPU-backend processes that rendezvous via
``jax.distributed.initialize`` (through the repo's ``initialize_distributed``
env hook), build the DCN-aware mesh with one "host" per dcn row, and prove
multi-host DP / DP×TP / DP×SP training and the train.py CLI bit-match the
same steps run in-process — the multi-host path is a config change, not a
rewrite.

IN THE DEFAULT SUITE since r4 (VERDICT r3 item 5): adds ~20 min on this
1-core box (the two CLI tests dominate). Opt out for quick iteration with
``MMB_SKIP_MULTIHOST=1``. De-flake rules baked in below: small per-process
device counts (1-core box — 8 faked devices across 2 processes starve the
collective rendezvous), generous staged timeouts, kill-both-on-timeout so
one wedged process can't cascade into the next test's port/rendezvous,
and NO compilation cache in two-process runs (asymmetric cache hits make
one process enter the gloo rendezvous while its peer still compiles —
the 30 s GetKeyValue deadline then kills it; reproduced + fixed r4).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    os.environ.get("MMB_SKIP_MULTIHOST") == "1",
    reason="two-process multi-host tests disabled by MMB_SKIP_MULTIHOST=1",
)

_WORKER = """
import os, sys
sys.path.insert(0, __REPO__)
import numpy as np
import jax
from mmbidaf_tpu.parallel import initialize_distributed, make_mesh, batch_sharding
from mmbidaf_tpu.config import MeshConfig

assert initialize_distributed(), "coordinator env vars not picked up"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

# 2-level mesh: dcn axis = one row per host, data axis within the host.
mesh = make_mesh(MeshConfig(num_dcn=2, num_data=4))
assert mesh.axis_names == ("dcn", "data")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Globally-sharded batch: each process provides its local shard.
sh = batch_sharding(mesh)
global_shape = (8, 16)
local = np.arange(8 * 16, dtype=np.float32).reshape(global_shape)
arr = jax.make_array_from_callback(global_shape, sh, lambda idx: local[idx])

@jax.jit
def total(x):
    return x.sum()

got = float(jax.device_get(total(arr)))
want = float(local.sum())
assert got == want, (got, want)

# local_batch_rows: each host owns its dcn row's contiguous batch block
from mmbidaf_tpu.parallel import local_batch_rows
rows = local_batch_rows(mesh, 8)
want_rows = np.arange(4) + 4 * jax.process_index()
np.testing.assert_array_equal(rows, want_rows)
assert local_batch_rows(mesh, 9) is None  # non-divisible -> replicate: all rows

print(f"proc {jax.process_index()}: multihost psum OK ({got})", flush=True)
"""


def _spawn_two(cmds, timeout=300, devices=4):
    """Run two coordinated processes (``devices`` faked CPU devices each)
    and return their combined stdout+stderr. ``cmds`` maps process id ->
    argv. NB this box has ONE physical core: every faked device thread and
    both processes share it, so collective rendezvous is slow — keep the
    per-test device count and program sizes small."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            XLA_FLAGS=f"--xla_force_host_platform_device_count={devices}",
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                cmds[pid], env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    except subprocess.TimeoutExpired:
        # kill BOTH processes before failing: a survivor would keep the
        # rendezvous port + CPU and cascade into the next test's spawn
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] or "" for p in procs]
        pytest.fail(
            f"two-process run timed out after {timeout}s; tails:\n"
            + "\n---\n".join(o[-1500:] for o in outs)
        )
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_dcn_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.replace("__REPO__", repr(REPO)))
    outs = _spawn_two({pid: [sys.executable, str(script)] for pid in range(2)})
    for out in outs:
        assert "multihost psum OK" in out


def run_train_steps(n_steps: int = 5):
    """Five tiny train steps on a 2x4 ('dcn','data') mesh — run BOTH by the
    in-process 8-device parent (reference) and by each process of the
    two-process rendezvous (4 local devices each). Identical mesh shape +
    shardings on identical data, so the loss trajectories must agree to fp
    tolerance; only the collective transport differs. Every host passes the
    same GLOBAL batch (parallel.mesh._put_global uploads only local shards)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmbidaf_tpu.config import MeshConfig, tiny_test_config
    from mmbidaf_tpu.data.synthetic import batch_stream, random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.parallel import make_mesh, shard_batch, shard_params
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, batch_size=8),
        mesh=MeshConfig(num_dcn=2, num_data=4),
    )
    mesh = make_mesh(cfg.mesh)
    wv = random_word_vectors(np.random.default_rng(0), cfg.data.vocab_size,
                             cfg.model.emb_dim)
    # init locally, place globally once (same order as train.py: eager
    # optax/EMA init on multi-process global arrays is not portable)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    state = shard_params(init_train_state(jax.random.key(1), params, cfg), mesh)
    train_step = make_train_step(cfg)
    stream = batch_stream(3, cfg, cfg.train.batch_size)
    losses = []
    for _ in range(n_steps):
        nb = next(stream)
        batch = shard_batch({k: jnp.asarray(v) for k, v in nb.items()}, mesh)
        state, metrics = train_step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses


_TRAIN_WORKER = """
import json, sys
sys.path.insert(0, __REPO__)
sys.path.insert(0, __REPO__ + "/tests")
import jax
from mmbidaf_tpu.parallel import initialize_distributed

assert initialize_distributed(), "coordinator env vars not picked up"
assert jax.device_count() == 8 and jax.local_device_count() == 4
from test_multihost import run_train_steps

print("LOSSES", json.dumps(run_train_steps()), flush=True)
"""


def test_two_process_train_parity(tmp_path):
    """The ACTUAL train step across two processes == the same steps on the
    in-process 8-device mesh (multi-host training, not just a psum smoke)."""
    import json

    import numpy as np

    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER.replace("__REPO__", repr(REPO)))
    outs = _spawn_two({pid: [sys.executable, str(script)] for pid in range(2)})

    got = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, out[-3000:]
        got.append(json.loads(line[-1][len("LOSSES "):]))
    assert got[0] == got[1], "hosts disagree on the replicated loss"

    want = run_train_steps()
    assert len(want) == len(got[0]) and all(np.isfinite(want))
    np.testing.assert_allclose(got[0], want, rtol=2e-5, atol=1e-6)


def run_sp_train_steps(n_steps: int = 3):
    """DP x SP across "hosts": the sp_audio tower (SP-MFCC -> SP-BiLSTM ->
    ring BiDAF) on a 2x2x2 ('dcn','data','seq') mesh — the batch dim sharded
    over BOTH dcn and data (sp_tower.sp_axes), the audio frame axis over seq.
    Run by the in-process 8-device parent (reference) and by each process of
    the two-process rendezvous; loss trajectories must match."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmbidaf_tpu.config import MeshConfig, tiny_test_config
    from mmbidaf_tpu.data.frontend import frontend_init
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.parallel import (
        make_mesh, make_sp_audio_tower, shard_batch, shard_params,
    )
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        # raw-audio path: frame bucket must divide the seq axis; the model's
        # audio feature dim is the frontend's n_mfcc (same as test_sp_product)
        data=dataclasses.replace(cfg.data, max_audio_frames=16),
        model=dataclasses.replace(
            cfg.model, audio_feat_dim=cfg.data.n_mfcc, drop_prob=0.0
        ),
        train=dataclasses.replace(cfg.train, batch_size=8),
        mesh=MeshConfig(num_dcn=2, num_data=2, num_seq=2, sp_audio=True),
    )
    mesh = make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    d = cfg.data
    wv = random_word_vectors(rng, d.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    state = shard_params(init_train_state(jax.random.key(2), params, cfg), mesh)
    fe = shard_params(fe, mesh)
    train_step = make_train_step(
        cfg, fe_params=fe, vgg_spec=TINY_SPEC,
        audio_g_fn=make_sp_audio_tower(mesh, cfg),
    )

    B = cfg.train.batch_size
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    losses = []
    for _ in range(n_steps):
        nb = {
            "text_ids": rng.integers(
                2, d.vocab_size, (B, d.max_sentences, d.max_words)
            ).astype(np.int32),
            "word_mask": np.ones((B, d.max_sentences, d.max_words), np.float32),
            "sent_mask": np.ones((B, d.max_sentences), np.float32),
            "frames": (rng.random((B, d.max_keyframes, 48, 64, 3)) * 255
                       ).astype(np.uint8),
            "img_mask": np.ones((B, d.max_keyframes), np.float32),
            "waveform": (rng.standard_normal((B, n_samples)) * 0.1
                         ).astype(np.float32),
            "aud_mask": np.ones((B, d.max_audio_frames), np.float32),
            # distinct picks per example: the decoder masks already-picked
            # sentences, so a repeated target hits a -1e30 log-prob
            "targets": np.stack(
                [rng.permutation(d.max_sentences)[: cfg.model.max_decode_steps]
                 for _ in range(B)]
            ).astype(np.int32),
            "target_mask": np.ones((B, cfg.model.max_decode_steps), np.float32),
        }
        batch = shard_batch(nb, mesh)
        state, metrics = train_step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses


def run_tp_train_steps(n_steps: int = 3):
    """DP × TP across "hosts": the tp_vgg frontend (VGG classifier sharded
    over 'model') on a 2x2x2 ('dcn','data','model') mesh — the batch dim
    sharded over dcn × data, the fc weights over model (each process
    uploads only its local weight shards via _put_global). Run by the
    in-process 8-device parent (reference) and by each process of the
    two-process rendezvous; loss trajectories must match."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mmbidaf_tpu.config import MeshConfig, tiny_test_config
    from mmbidaf_tpu.data.frontend import frontend_init
    from mmbidaf_tpu.data.synthetic import random_word_vectors
    from mmbidaf_tpu.models.mmbidaf import mmbidaf_init
    from mmbidaf_tpu.ops.vgg import TINY_SPEC
    from mmbidaf_tpu.parallel import (
        make_mesh, shard_batch, shard_frontend, shard_params,
    )
    from mmbidaf_tpu.train.loop import init_train_state, make_train_step

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, img_feat_dim=32, audio_feat_dim=cfg.data.n_mfcc,
            drop_prob=0.0,
        ),
        train=dataclasses.replace(cfg.train, batch_size=8),
        mesh=MeshConfig(num_dcn=2, num_data=2, num_model=2, tp_vgg=True),
    )
    mesh = make_mesh(cfg.mesh)
    rng = np.random.default_rng(0)
    d = cfg.data
    wv = random_word_vectors(rng, d.vocab_size, cfg.model.emb_dim)
    params = mmbidaf_init(jax.random.key(0), cfg, jnp.asarray(wv))
    fe = frontend_init(jax.random.key(1), cfg, vgg_spec=TINY_SPEC)
    state = shard_params(init_train_state(jax.random.key(2), params, cfg), mesh)
    fe = shard_frontend(fe, mesh, tp_vgg=True)
    train_step = make_train_step(cfg, fe_params=fe, vgg_spec=TINY_SPEC)

    B = cfg.train.batch_size
    n_samples = d.max_audio_frames * d.hop_length + d.win_length
    losses = []
    for _ in range(n_steps):
        nb = {
            "text_ids": rng.integers(
                2, d.vocab_size, (B, d.max_sentences, d.max_words)
            ).astype(np.int32),
            "word_mask": np.ones((B, d.max_sentences, d.max_words), np.float32),
            "sent_mask": np.ones((B, d.max_sentences), np.float32),
            "frames": (rng.random((B, d.max_keyframes, 24, 20, 3)) * 255
                       ).astype(np.uint8),
            "img_mask": np.ones((B, d.max_keyframes), np.float32),
            "waveform": (rng.standard_normal((B, n_samples)) * 0.1
                         ).astype(np.float32),
            "aud_mask": np.ones((B, d.max_audio_frames), np.float32),
            "targets": np.stack(
                [rng.permutation(d.max_sentences)[: cfg.model.max_decode_steps]
                 for _ in range(B)]
            ).astype(np.int32),
            "target_mask": np.ones((B, cfg.model.max_decode_steps), np.float32),
        }
        batch = shard_batch(nb, mesh)
        state, metrics = train_step(state, batch)
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses


_TP_TRAIN_WORKER = """
import json, sys
sys.path.insert(0, __REPO__)
sys.path.insert(0, __REPO__ + "/tests")
import jax
from mmbidaf_tpu.parallel import initialize_distributed

assert initialize_distributed(), "coordinator env vars not picked up"
assert jax.device_count() == 8 and jax.local_device_count() == 4
from test_multihost import run_tp_train_steps

print("LOSSES", json.dumps(run_tp_train_steps()), flush=True)
"""


def test_two_process_tp_train_parity(tmp_path):
    """tp_vgg training across two processes == the same steps in-process:
    multi-host DP × tensor parallelism (each host uploads only its shards
    of the 'model'-sharded classifier)."""
    import json

    import numpy as np

    script = tmp_path / "tp_train_worker.py"
    script.write_text(_TP_TRAIN_WORKER.replace("__REPO__", repr(REPO)))
    outs = _spawn_two({pid: [sys.executable, str(script)] for pid in range(2)},
                      timeout=600)

    got = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, out[-3000:]
        got.append(json.loads(line[-1][len("LOSSES "):]))
    assert got[0] == got[1], "hosts disagree on the replicated loss"

    want = run_tp_train_steps()
    assert len(want) == len(got[0]) and all(np.isfinite(want))
    np.testing.assert_allclose(got[0], want, rtol=2e-5, atol=1e-6)


_SP_TRAIN_WORKER = """
import json, sys
sys.path.insert(0, __REPO__)
sys.path.insert(0, __REPO__ + "/tests")
import jax
from mmbidaf_tpu.parallel import initialize_distributed

assert initialize_distributed(), "coordinator env vars not picked up"
assert jax.device_count() == 8 and jax.local_device_count() == 4
from test_multihost import run_sp_train_steps

print("LOSSES", json.dumps(run_sp_train_steps()), flush=True)
"""


def test_two_process_sp_train_parity(tmp_path):
    """sp_audio training across two processes == the same steps in-process:
    the full product composition (multi-host DP x sequence parallelism)."""
    import json

    import numpy as np

    script = tmp_path / "sp_train_worker.py"
    script.write_text(_SP_TRAIN_WORKER.replace("__REPO__", repr(REPO)))
    outs = _spawn_two({pid: [sys.executable, str(script)] for pid in range(2)},
                      timeout=600)

    got = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert line, out[-3000:]
        got.append(json.loads(line[-1][len("LOSSES "):]))
    assert got[0] == got[1], "hosts disagree on the replicated loss"

    want = run_sp_train_steps()
    assert len(want) == len(got[0]) and all(np.isfinite(want))
    np.testing.assert_allclose(got[0], want, rtol=2e-5, atol=1e-6)


def test_two_process_train_cli_real_corpus(tmp_path):
    """Real-corpus bucketed training across two processes: each host
    decodes only its own batch rows (local_batch_rows -> decode_rows, incl.
    the eval featurization assembly) yet host 0's logged eval_loss matches
    a single-process 8-device run of the same corpus/flags."""
    import json

    import numpy as np

    corpus = tmp_path / "corpus"
    res = subprocess.run(
        [sys.executable, "examples/make_synthetic_corpus.py",
         "--out", str(corpus), "--videos", "8", "--sentences", "8",
         "--frames", "4", "--seconds", "1.2"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
    )
    assert res.returncode == 0, res.stderr[-2000:]

    # 2 devices/host (4 total), batch 4 (2 local rows per host): this box
    # has ONE core — 8 faked devices starve the collective rendezvous
    # (observed flaky AwaitAndLogIfStuck aborts); 4 keeps it reliable.
    def argv(save, cache=False):
        # --jax_cache ONLY for the single-process reference run (pure
        # compile-time win, no cross-process collectives). NEVER for the
        # two-process phase: a cache hit in one process and a miss in the
        # other makes their startups ASYMMETRIC, and gloo's KV rendezvous
        # has a hard 30 s GetKeyValue deadline — the cache-hit process
        # enters the collective and times out while its peer is still
        # compiling (reproduced r4: JaxRuntimeError DEADLINE_EXCEEDED
        # cpu:gloo GetKeyValue; plus XLA:CPU AOT reload warns of machine-
        # feature mismatch on entries written by the in-process suite).
        return [
            sys.executable, "train.py", "--data_dir", str(corpus),
            "--vgg", "tiny", "--buckets", "auto",
            "--hidden_size", "12", "--batch_size", "4",
            "--num_steps", "4", "--eval_steps", "2", "--drop_prob", "0.0",
            "--save_dir", str(save),
        ] + (["--jax_cache", os.path.join(REPO, ".jax_cache_cpu")]
             if cache else [])

    def eval_losses(save):
        logs = [json.loads(ln) for ln in
                (save / "mmbidaf" / "log.jsonl").read_text().splitlines()]
        return [l["eval_loss"] for l in logs if "eval_loss" in l]

    # reference: single process, same 4 devices in-process
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    res = subprocess.run(argv(tmp_path / "ref", cache=True), env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, (res.stdout + res.stderr)[-3000:]
    want = eval_losses(tmp_path / "ref")
    assert want, "reference run logged no eval_loss"

    outs = _spawn_two({pid: argv(tmp_path / "mh") for pid in range(2)},
                      timeout=900, devices=2)
    assert "across 2 hosts" in outs[0]
    got = eval_losses(tmp_path / "mh")
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-6)


def test_two_process_train_cli(tmp_path):
    """Full train.py across two processes: collective orbax checkpointing,
    host-0-only logging, eval with replicated picks."""
    save = tmp_path / "runs"
    argv = [
        sys.executable, "train.py",
        "--hidden_size", "12", "--batch_size", "8", "--num_steps", "4",
        "--max_sentences", "6", "--max_words", "5", "--eval_steps", "2",
        "--drop_prob", "0.0", "--save_dir", str(save),
        # no --jax_cache in two-process runs: asymmetric cache hits blow
        # gloo's 30 s rendezvous deadline (see the real-corpus test)
    ]
    outs = _spawn_two({0: argv, 1: argv}, timeout=600)

    assert "across 2 hosts" in outs[0]
    assert "eval_loss" in outs[0] and "done" in outs[0]
    # non-primary host computes silently: no scalar lines, no log files
    assert "eval_loss" not in outs[1]
    run_dir = save / "mmbidaf"
    assert (run_dir / "log.jsonl").exists()
    ckpts = run_dir / "ckpts"
    assert ckpts.exists() and any(ckpts.iterdir()), "no checkpoint written"
