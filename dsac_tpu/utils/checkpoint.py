"""Checkpointing: full training-state snapshots via orbax.

The reference snapshots WEIGHTS ONLY via torch.save every N updates
(core/lua/train_obj.lua:209-213, 257-261) — no optimizer state, RNG, or
step counter, so "resume" restarts the schedule.  Here the whole pytree
(params, optimizer states, step) is saved and restored — and the e2e CLI
additionally persists its data-stream RNG in a JSON sidecar
(cli/train_ransac.py:rng_sidecar) so a resumed run continues the frame
schedule instead of replaying it — and the
reference's fixed model names (obj_model_init, score_model_init,
obj_model_endtoend, score_model_endtoend; core/properties.cpp:69-70) are
kept as snapshot directory names.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

OBJ_INIT = "obj_model_init"
SCORE_INIT = "score_model_init"
OBJ_E2E = "obj_model_endtoend"
SCORE_E2E = "score_model_endtoend"
OBJ_SOFTAM = "obj_model_softam_endtoend"
SCORE_SOFTAM = "score_model_softam_endtoend"


def _globalize(state: Any) -> Any:
    """Make every leaf serializable in a multi-PROCESS run.

    Orbax refuses host-local jax.Arrays (e.g. a bare ``jnp.asarray(step)``
    scalar, or params produced outside shard_map) when
    ``jax.process_count() > 1``: their device set does not span all
    processes.  Such leaves are by construction replicated host values —
    every process holds the same bytes — so they are re-placed as global
    fully-replicated arrays over all devices.  Genuinely sharded global
    arrays (not fully addressable locally) pass through untouched.
    Single-process runs are returned as-is (zero overhead).
    """
    if jax.process_count() == 1:
        return state
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    rep = NamedSharding(Mesh(np.asarray(jax.devices()), ("_ckpt",)), P())

    converted = []

    def fix(x):
        if (isinstance(x, jax.Array) and x.is_fully_addressable
                and len(x.sharding.device_set) < jax.device_count()):
            v = np.asarray(x)
            converted.append(v)
            return jax.device_put(v, rep)
        return x

    out = jax.tree.map(fix, state)
    # the "host-local leaves are replicated" assumption is VERIFIED, not
    # trusted: a per-process-divergent leaf (e.g. a local step counter
    # outside the collective path) silently persisted as "replicated"
    # would be a corrupt checkpoint.  One tiny allgathered record per
    # save — [n_converted, digest] — catches it loudly.  The gather runs
    # UNCONDITIONALLY: if processes disagree on WHICH leaves are
    # host-local, a converted-only gather would deadlock (some processes
    # skip the collective) instead of raising.
    import hashlib
    from jax.experimental import multihost_utils
    digest = hashlib.sha256()
    for v in converted:
        digest.update(np.ascontiguousarray(v).tobytes())
    d = digest.digest()[:16] if converted else bytes(16)
    h = np.concatenate([np.asarray([len(converted)], np.uint32),
                        np.frombuffer(d, np.uint32)])  # x64-safe
    all_h = np.asarray(multihost_utils.process_allgather(h))
    if not (all_h == all_h[0]).all():
        raise ValueError(
            "checkpoint.save: processes disagree on host-local leaves "
            f"(count+digest rows {all_h.tolist()}) — they cannot be "
            "globalized as replicated arrays. Make per-process state a "
            "properly sharded global array before saving.")
    return out


def save(directory: str | Path, name: str, state: Any, step: int | None = None,
         keep: int = 3):
    """Snapshot `state` (any pytree) under directory/name[/step]."""
    path = Path(directory).resolve() / name
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mgr:
        mgr.save(0 if step is None else int(step),
                 args=ocp.args.StandardSave(_globalize(state)))
        mgr.wait_until_finished()


def restore(directory: str | Path, name: str, template: Any = None,
            step: int | None = None) -> Any:
    """Restore the latest (or a specific) snapshot; `template` provides the
    pytree structure/dtypes (required for typed restore)."""
    path = Path(directory).resolve() / name
    if not path.exists():
        # avoid CheckpointManager's dir-creation side effect on probe reads
        raise FileNotFoundError(f"no checkpoint under {path}")
    with ocp.CheckpointManager(path) as mgr:
        target = mgr.latest_step() if step is None else int(step)
        if target is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        if template is not None:
            return mgr.restore(target,
                               args=ocp.args.StandardRestore(template))
    # untyped restore: rebuild a HOST-numpy template from the snapshot's
    # own metadata, so snapshots written on one backend (TPU) restore on
    # any other (CPU) — a raw mgr.restore(target) replays the saved
    # shardings and fails off-device
    item = path / str(target) / "default"
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        meta = ckptr.metadata(item)
        tree = getattr(meta, "item_metadata", meta)
        if hasattr(tree, "tree"):
            tree = tree.tree
        template = jax.tree.map(
            lambda m: np.zeros(m.shape, m.dtype), tree,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"))
        return ckptr.restore(item, args=ocp.args.StandardRestore(template))


def latest_step(directory: str | Path, name: str) -> int | None:
    path = Path(directory).resolve() / name
    if not path.exists():
        return None
    with ocp.CheckpointManager(path) as mgr:
        return mgr.latest_step()
