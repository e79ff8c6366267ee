"""Checkpoint / resume for filter and graph state.

The reference's only persistence is the final landmark map text file
(reference filters/base_filter.py:214-272) plus a dill cache of SymPy
lambdas; there is no mid-run checkpointing (SURVEY.md §5). Here any
state pytree (MekfState, GraphState, or an arbitrary nest) round-trips
through a single compressed .npz (leaves in tree order), so long runs
resume exactly — surfaced as `--checkpoint-every N` / `--resume PATH`
on the online driver (apps/run_slam.py), resume-equality tested in
tests/test_io_apps.py.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax


def save_checkpoint(path, state) -> None:
    """Persist a state pytree (named-tuple nests of arrays)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, num_leaves=np.int64(len(leaves)),
                        **arrays)


def load_checkpoint(path, like):
    """Restore into the structure of `like` (a template pytree with the
    same treedef — e.g. the output of init_state / init_graph)."""
    data = np.load(Path(path))
    n = int(data["num_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    template_leaves, treedef = jax.tree.flatten(like)
    if len(template_leaves) > n:
        # forward migration: state fields are only ever APPENDED (e.g.
        # MekfState.dropped_obs), so a pre-upgrade checkpoint is the
        # template minus trailing leaves — fill those from the
        # template's defaults instead of refusing to resume
        leaves = leaves + [np.asarray(t)
                           for t in template_leaves[n:]]
    elif len(template_leaves) < n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has "
            f"{len(template_leaves)}")
    import jax.numpy as jnp
    cast = [jnp.asarray(x, t.dtype) if hasattr(t, "dtype") else x
            for x, t in zip(leaves, template_leaves)]
    return jax.tree.unflatten(treedef, cast)
