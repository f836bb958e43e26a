"""Checkpoint/resume for pipeline state (SURVEY §5.4 — absent upstream).

Everything that persists across frames lives in the explicit state pytree
(superpixel labels, optical-flow prev frame, history rings) plus small
host-side module state (running histograms, plane parameters).  One .npz
holds all of it; sequences resume mid-stream.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_checkpoint(path: str, state, frame_id: int, host_state: dict | None = None):
    leaves, treedef = jax.tree.flatten(jax.device_get(state))
    meta = {
        "frame_id": int(frame_id),
        "treedef": str(treedef),
        "host_state": host_state or {},
    }
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez_compressed(path, __meta__=json.dumps(meta, default=_jsonable), **arrays)


def _jsonable(x):
    if isinstance(x, np.ndarray):
        return {"__nd__": x.tolist(), "dtype": str(x.dtype)}
    if isinstance(x, (np.integer, np.floating)):
        return x.item()
    raise TypeError(type(x))


def _unjson(x):
    if isinstance(x, dict) and "__nd__" in x:
        return np.array(x["__nd__"], dtype=x["dtype"])
    if isinstance(x, dict):
        return {k: _unjson(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_unjson(v) for v in x]
    return x


def load_checkpoint(path: str, example_state):
    """Restores leaves into the structure of `example_state`.

    Returns (state, frame_id, host_state).
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves = [data[f"leaf_{i}"] for i in range(len(data.files) - 1)]
    _, treedef = jax.tree.flatten(example_state)
    if meta.get("treedef") and meta["treedef"] != str(treedef):
        # Same-shaped leaves of a different pipeline would silently land
        # in the wrong slots; make config/checkpoint mismatch loud.
        raise ValueError(
            f"checkpoint '{path}' was saved by a pipeline with a different "
            f"state structure:\n  saved:   {meta['treedef']}\n"
            f"  current: {treedef}"
        )
    state = jax.tree.unflatten(treedef, leaves)
    return state, meta["frame_id"], _unjson(meta["host_state"])
