"""Multi-sequence data-parallel scale-out.

The reference is strictly single-process single-GPU (SURVEY §2.7).  The
TPU-native scale-out story: run B independent video sequences in lock-step,
`vmap` the pipeline step over the batch and shard the batch axis across a
device mesh — throughput scales with chips over ICI with zero collectives
on the hot path (each sequence's state stays chip-local).

Spatial (width-sharded) processing with halo exchange lives in
parallel/spatial.py.
"""

from __future__ import annotations

import jax
import numpy as np

from ..runtime.pipeline import Pipeline


def make_batched_step(pipeline: Pipeline, batch: int, variant_frame: int = 2):
    """Returns (batched_step, init_state_fn, init_params_fn).

    batched_step(state, frame, host_params) -> (state, outputs), all leaves
    carrying a leading [batch] axis.  Host params are shared (replicated)
    across the batch.
    """
    variant = pipeline.variant(variant_frame)
    step = pipeline.make_step(variant)

    def batched_step(state, frame, host_params):
        return jax.vmap(step, in_axes=(0, 0, None))(state, frame, host_params)

    def init_state():
        one = pipeline.init_state()
        return jax.tree.map(lambda x: np.stack([x] * batch, axis=0), one)

    def init_params():
        return pipeline.init_host_params()

    return batched_step, init_state, init_params
