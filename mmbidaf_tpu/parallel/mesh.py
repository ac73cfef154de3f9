"""ICI/DCN sharding layer (SURVEY.md §3.3) — the one genuinely new layer.

Primary strategy is data parallelism: the batch axis is sharded over the
``('data',)`` mesh; params are replicated. Gradients reduce via the implicit
``psum`` XLA inserts under jit when outputs are replicated — no hand-written
collectives, they ride ICI.

The mesh factory is DCN-aware: ``make_mesh(num_dcn=2)`` builds a 2-level
``('dcn', 'data')`` mesh so multi-host later is a config change, not a
rewrite (DCN axis stays size 1 on a single host / v5e-8 slice).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from mmbidaf_tpu.config import MeshConfig


SEQ_AXIS = "seq"      # conventional name; never used for batch sharding
MODEL_AXIS = "model"  # tensor-parallel axis; never used for batch sharding


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build the device mesh with Auto axis types (classic GSPMD propagation:
    XLA resolves intermediate shardings and inserts collectives itself).

    Axes, outer→inner: ``dcn`` (if num_dcn>1) × ``data`` × ``seq`` (if
    num_seq>1) × ``model`` (if num_model>1). The ``seq`` axis carries the
    audio-tower sequence parallelism (``MeshConfig.sp_audio``); the
    ``model`` axis carries VGG-classifier tensor parallelism
    (``MeshConfig.tp_vgg``); batch sharding skips both. ``model`` sits
    innermost so its all-reduce rides adjacent ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if cfg.seq_axis != SEQ_AXIS:
        # batch_sharding identifies the SP axis by name; renaming it would
        # silently shard the batch over the frame axis.
        raise ValueError(f"seq_axis must be {SEQ_AXIS!r}, got {cfg.seq_axis!r}")
    if cfg.model_axis != MODEL_AXIS:
        # same rule for the TP axis: batch_sharding skips it by name.
        raise ValueError(
            f"model_axis must be {MODEL_AXIS!r}, got {cfg.model_axis!r}"
        )
    num_seq = max(cfg.num_seq, 1)
    num_dcn = max(cfg.num_dcn, 1)
    num_model = max(cfg.num_model, 1)
    if cfg.num_data < 0:
        num_data = len(devices) // (num_seq * num_dcn * num_model)
        if num_data < 1:
            raise ValueError(
                f"mesh needs num_dcn*num_seq*num_model = "
                f"{num_dcn * num_seq * num_model} devices, have {len(devices)}"
            )
    else:
        num_data = cfg.num_data
    n = num_dcn * num_data * num_seq * num_model
    if n > len(devices):
        raise ValueError(
            f"mesh {num_dcn}x{num_data}x{num_seq}x{num_model} needs {n} "
            f"devices, have {len(devices)}"
        )
    devices = devices[:n]
    shape, names = [], []
    if num_dcn > 1:
        shape.append(num_dcn)
        names.append(cfg.dcn_axis)
    shape.append(num_data)
    names.append(cfg.data_axis)
    if num_seq > 1:
        shape.append(num_seq)
        names.append(cfg.seq_axis)
    if num_model > 1:
        shape.append(num_model)
        names.append(cfg.model_axis)
    return Mesh(
        np.asarray(devices).reshape(shape),
        tuple(names),
        axis_types=(AxisType.Auto,) * len(names),
    )


def _data_axes(mesh: Mesh) -> tuple[str, ...]:
    """All mesh axes that shard the batch (dcn × data when 2-level); the
    ``seq`` axis shards the audio frame axis and the ``model`` axis shards
    TP weight matrices instead — never the batch."""
    return tuple(
        name for name in mesh.axis_names if name not in (SEQ_AXIS, MODEL_AXIS)
    )


def data_shard_count(mesh: Mesh) -> int:
    """Number of ways the batch dim shards on this mesh (product of the
    data axes; ``seq``/``model`` never carry the batch)."""
    return int(np.prod([mesh.shape[a] for a in _data_axes(mesh)], dtype=int))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard dim 0 (batch) over every mesh axis; other dims replicated."""
    return NamedSharding(mesh, P(_data_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(v: Any, sh: NamedSharding):
    """Place a host array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put``. Multi-process (``jax.distributed``
    initialized, mesh spanning hosts): every process holds the same GLOBAL
    host value (the data layer is deterministic per seed, so each host
    regenerates it — SPMD single-controller convention); this process
    uploads only the shards its local devices own and assembles the global
    ``jax.Array`` from them.
    """
    if jax.process_count() == 1:
        return jax.device_put(v, sh)
    if isinstance(v, jax.Array) and jnp.issubdtype(v.dtype, jax.dtypes.prng_key):
        # typed PRNG keys (TrainState.rng) have no numpy form: place the
        # raw key data and re-wrap (all processes run the wrap in lockstep)
        raw = _put_global(jax.random.key_data(v), sh)
        return jax.random.wrap_key_data(raw, impl=jax.random.key_impl(v))
    v = np.asarray(v)
    imap = sh.addressable_devices_indices_map(v.shape)
    arrs = [jax.device_put(v[idx], d) for d, idx in imap.items()]
    return jax.make_array_from_single_device_arrays(v.shape, sh, arrs)


def local_batch_rows(mesh: Mesh, batch_size: int) -> np.ndarray | None:
    """Global batch-dim rows owned by THIS process's devices, or None when
    single-process (= all rows).

    Multi-host data loading: every host iterates the same global stream
    (seed-deterministic), but only the rows returned here are ever uploaded
    by ``_put_global`` — so the expensive host work (video decode, resize,
    collate) can skip the other hosts' rows (``bucketed_iterator``'s
    ``decode_rows``). Rows that don't divide the mesh fall back to
    replication in ``shard_batch``; return None there too (every host
    needs every row).
    """
    if jax.process_count() == 1:
        return None
    n = data_shard_count(mesh)
    if batch_size % n:
        return None  # shard_batch will replicate: all rows needed
    sh = batch_sharding(mesh)
    rows: set[int] = set()
    for (sl, *_rest) in sh.addressable_devices_indices_map((batch_size,)).values():
        start, stop, step = sl.indices(batch_size)
        rows.update(range(start, stop, step))
    return np.asarray(sorted(rows), dtype=np.int64)


def shard_batch(batch: Mapping[str, Any], mesh: Mesh) -> dict:
    """Place every array in the batch with its dim-0 sharded over the mesh.

    Batch values are GLOBAL (multi-process runs pass the same full batch on
    every host; each uploads only its own shards — ``_put_global``).

    Arrays whose leading dim doesn't divide the mesh (e.g. a tiny debug
    batch on an 8-device mesh) are replicated instead — correct, just not
    parallel; size the batch as a multiple of the mesh for real runs. A
    replicated array with leading dim > mesh size is almost certainly a
    typo'd batch size silently running ``n``× slower, so that case warns.
    """
    import warnings

    sh = batch_sharding(mesh)
    rep = replicated_sharding(mesh)
    n = data_shard_count(mesh)

    def place(k, v):
        v = jnp.asarray(v) if not hasattr(v, "shape") else v
        ok = len(v.shape) > 0 and v.shape[0] % n == 0
        if not ok and len(v.shape) > 0 and v.shape[0] > n:
            warnings.warn(
                f"shard_batch: '{k}' leading dim {v.shape[0]} does not divide "
                f"the {n}-device mesh; replicating (runs {n}x slower). Size "
                f"the batch as a multiple of {n}.",
                stacklevel=3,
            )
        return _put_global(v, sh if ok else rep)

    return {k: place(k, v) for k, v in batch.items()}


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate the params pytree across the mesh (all hosts pass the same
    values in multi-process runs — init is seed-deterministic)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), params)


def shard_frontend(fe_params: Any, mesh: Mesh, tp_vgg: bool = False) -> Any:
    """Place frontend params; with ``tp_vgg`` the VGG classifier is
    tensor-parallel over the mesh's ``model`` axis (SURVEY §3.3 TP row —
    delivered as an option for the parameter-dominant stage).

    The fc layers hold ~119M of VGG-16's ~134M params (fc1 25088×4096 =
    102.8M, fc2 16.8M; the towers are ~10M and stay replicated — TP there
    would trade negligible memory for collective latency). Megatron-style
    split, pure GSPMD annotations (Auto axes, XLA inserts the collective):

    - ``fc1_w [flat, fc]`` column-parallel → ``P(None, 'model')``,
      ``fc1_b`` → ``P('model')``; the fc1→ReLU activation stays sharded
      on its feature axis with no communication.
    - ``fc2_w [fc, fc]`` row-parallel → ``P('model', None)``: the
      contraction runs over the sharded axis and XLA all-reduces the
      partial sums once, after fc2 — one collective for the whole
      classifier.

    Per-chip classifier weight memory and weight-streaming traffic drop
    ``num_model``× (the fc GEMMs are weight-bound at serving batch sizes).
    Everything else (convs, audio consts) replicates.
    """
    if not tp_vgg:
        return shard_params(fe_params, mesh)
    if MODEL_AXIS not in mesh.axis_names:
        raise ValueError(
            "tp_vgg needs a 'model' mesh axis: set MeshConfig.num_model > 1"
        )
    if not isinstance(fe_params, Mapping) or "vgg" not in fe_params:
        raise ValueError(
            "tp_vgg shards the VGG classifier but the frontend has no "
            "'vgg' params (image tower disabled?)"
        )
    n = mesh.shape[MODEL_AXIS]
    fc_dim = int(fe_params["vgg"]["fc1_w"].shape[1])
    if fc_dim % n:
        raise ValueError(
            f"tp_vgg: the model axis ({n}) must divide fc_dim {fc_dim}; "
            f"pick num_model from the divisors of {fc_dim}"
        )
    tp_specs = {
        "fc1_w": P(None, MODEL_AXIS),
        "fc1_b": P(MODEL_AXIS),
        "fc2_w": P(MODEL_AXIS, None),
    }
    rep = replicated_sharding(mesh)
    # ONE placement per leaf: the fc leaves must never be uploaded
    # replicated first (a full-classifier HBM spike + wasted H2D of the
    # very weights tp_vgg exists to split).
    out = {
        k: jax.tree.map(lambda x: _put_global(x, rep), sub)
        for k, sub in fe_params.items()
        if k != "vgg"
    }
    out["vgg"] = {
        k: _put_global(v, NamedSharding(mesh, tp_specs[k]))
        if k in tp_specs
        else jax.tree.map(lambda x: _put_global(x, rep), v)
        for k, v in fe_params["vgg"].items()
    }
    return out


def initialize_distributed() -> bool:
    """Multi-host bring-up hook: call ``jax.distributed.initialize`` when the
    standard coordinator env vars are present (SURVEY §3.3 — multi-host is a
    config change, not a rewrite). Returns True if distributed mode started.

    On cloud TPU pods the coordinates are auto-detected; elsewhere (e.g. the
    CPU two-process smoke test) NUM_PROCESSES / PROCESS_ID are read from the
    environment and passed explicitly.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return False
    nproc = os.environ.get("NUM_PROCESSES") or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")
    if nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        jax.distributed.initialize()  # cloud auto-detection path
    return True
