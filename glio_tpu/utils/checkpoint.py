"""Checkpoint / resume for estimator state.

The reference has none (SURVEY.md §5: state lives in process memory,
outputs are append-only CSVs).  Here every estimator's carry is a pytree
of arrays, so checkpointing is trivial and exact: save the carry, resume
the ``lax.scan`` replay from any keyframe.  Uses orbax when available,
npz otherwise — both produce bit-identical resumes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_pytree(path: str, tree) -> None:
    """Save any pytree-of-arrays checkpoint as an npz archive."""
    flat, _ = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(path, *[np.asarray(x) for x in flat])


def load_pytree(path: str, like):
    """Load a checkpoint written by save_pytree, shaped `like` a template
    pytree (same structure, returns device arrays with template dtypes)."""
    z = np.load(path)
    arrays = [z[k] for k in z.files]
    flat, treedef = jax.tree_util.tree_flatten(like)
    assert len(arrays) == len(flat), \
        f"checkpoint has {len(arrays)} leaves, template has {len(flat)}"
    out = [jnp.asarray(a, dtype=l.dtype) for a, l in zip(arrays, flat)]
    return jax.tree_util.tree_unflatten(treedef, out)


def save_orbax(path: str, tree) -> bool:
    """Save with orbax if installed; returns False if unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), tree, force=True)
    return True


def load_orbax(path: str, like=None):
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.abspath(path), item=like)
