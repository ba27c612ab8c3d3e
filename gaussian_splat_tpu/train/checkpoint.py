"""Checkpoint / resume for the sharded training state.

The reference's only persistence is the PLY itself (its test scene is a
training-iteration-30000 artifact, /root/reference/src/main.mm:69-70, reloaded
from disk every launch, instanced_splat_renderer.mm:339-393). This module adds:

  * Orbax checkpoints of the full TrainState pytree (model + optimizer moments
    + step) — sharding-aware, multi-host safe, restartable (SURVEY §5
    failure-detection: checkpoint + restart-from-checkpoint is the v1 recovery
    story).
  * PLY export via `gaussian_splat_tpu.io.ply` remains the interchange format
    (the ecosystem's de-facto checkpoint), usable at any step.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


# One manager per directory for the process lifetime: constructing a fresh
# CheckpointManager per save leaks its background threads and re-scans the
# step directory every call — with checkpoint_every small that dominates a
# long run (advisor finding, round 4).
_MANAGERS: dict = {}


def _manager(directory: str):
    import orbax.checkpoint as ocp

    key = os.path.abspath(directory)
    mgr = _MANAGERS.get(key)
    if mgr is None:
        mgr = ocp.CheckpointManager(
            key,
            options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
        )
        _MANAGERS[key] = mgr
    return mgr


def close_managers() -> None:
    """Flush and release every cached CheckpointManager (end of training)."""
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()
        mgr.close()
    _MANAGERS.clear()


def save_checkpoint(directory: str, state) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = int(state.step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def restore_checkpoint(directory: str, template):
    """Restore the latest checkpoint into the structure of `template`
    (preserves shardings of the template's arrays)."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    # a save from another process/manager instance may have landed since this
    # manager's last directory scan
    mgr.reload()
    step = mgr.latest_step()
    if step is None:
        return None
    return mgr.restore(step, args=ocp.args.StandardRestore(template))


def latest_step(directory: str) -> Optional[int]:
    mgr = _manager(directory)
    mgr.reload()
    return mgr.latest_step()
