"""Orbax checkpointing: params + opt_state + step + EMA (SURVEY.md §6).

Replaces the reference's ``util.CheckpointSaver`` (torch.save state_dict,
retain best-k by metric) with orbax ``CheckpointManager``: atomic writes,
best-k retention by a tracked metric, auto-resume-from-latest.
"""

from __future__ import annotations

import os
import orbax.checkpoint as ocp

from mmbidaf_tpu.train.loop import TrainState


def make_manager(
    save_dir: str,
    max_checkpoints: int = 5,
    metric_name: str = "ROUGE-L",
    maximize: bool = True,
) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_checkpoints,
        best_fn=lambda metrics: metrics.get(metric_name, 0.0),
        best_mode="max" if maximize else "min",
        create=True,
        enable_async_checkpointing=False,
    )
    return ocp.CheckpointManager(os.path.abspath(save_dir), options=options)


def _state_dict(state: TrainState) -> dict:
    """The one serialized layout (save, preemption save, and restore all
    share it — a field added in only one place would otherwise produce
    checkpoints that mismatch on the other path)."""
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "rng": state.rng,
    }


def save(manager: ocp.CheckpointManager, state: TrainState, metrics: dict) -> None:
    manager.save(
        int(state.step),
        args=ocp.args.StandardSave(_state_dict(state)),
        metrics={k: float(v) for k, v in metrics.items()},
    )
    manager.wait_until_finished()


def save_unranked(manager: ocp.CheckpointManager, state: TrainState) -> None:
    """Save WITHOUT metrics: orbax's best-k retention only ranks checkpoints
    that carry metrics (``keep_checkpoints_without_metrics`` defaults True),
    so an unranked save survives eviction regardless of its quality — the
    right semantics for preemption saves, which exist to resume from, not
    to compete for best-k (verified empirically: a low-METRIC save at the
    same point IS evicted immediately)."""
    if manager.latest_step() == int(state.step):
        return  # this step is already on disk (e.g. eval save just ran)
    manager.save(
        int(state.step),
        args=ocp.args.StandardSave(_state_dict(state)),
    )
    manager.wait_until_finished()


def restore_latest(manager: ocp.CheckpointManager, template: TrainState) -> TrainState | None:
    """Auto-resume: restore the newest checkpoint, or None if none exist."""
    step = manager.latest_step()
    if step is None:
        return None
    target = _state_dict(template)
    try:
        restored = manager.restore(step, args=ocp.args.StandardRestore(target))
    except Exception as e:  # noqa: BLE001 — re-raise with the likely cause
        raise RuntimeError(
            f"checkpoint restore at step {step} failed: {e}\n"
            "If the structure mismatch is inside 'opt_state', the run was "
            "probably saved under the other `train.flat_updates` setting "
            "(flat path keeps one raveled accumulator vector; the tree path "
            "keeps per-leaf moments). Resume with a config overlay matching "
            "the run, e.g. --config_json '{\"train\": {\"flat_updates\": "
            "false}}' (docs/OPERATIONS.md)."
        ) from e
    # Orbax lands restored arrays on the default device; re-place each leaf
    # on its template's sharding so resume works on a sharded mesh (restored
    # single-device-committed params alongside mesh-placed batches otherwise
    # fail jit's device check).
    import jax

    restored = jax.tree.map(
        lambda r, t: jax.device_put(r, t.sharding) if hasattr(t, "sharding") else r,
        restored,
        target,
    )
    return TrainState(**restored)


def save_config(save_dir: str, cfg) -> None:
    """Persist the full Config next to the checkpoints (reproducibility:
    a checkpoint without its bucket shapes/arch dims is not loadable)."""
    import json

    from mmbidaf_tpu.config import config_to_dict

    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "config.json"), "w") as f:
        json.dump(config_to_dict(cfg), f, indent=1)


def load_config(save_dir: str):
    from mmbidaf_tpu.config import config_from_json

    return config_from_json(os.path.join(save_dir, "config.json"))
