"""Module framework: the TPU-native re-design of the reference's scheduler.

In the reference, a module is an opaque side-effectful CUDA call wired into a
thread pool through a key/value promise store (include/modules/module.hpp,
src/utils/data.cpp).  Here a module is a *pure function* over named arrays:
``compute`` is traced into one fused XLA program per frame, so the "promise
store" becomes dataflow inside a jit and XLA schedules the op DAG.

Cross-frame dependencies — ``module_dependency_t.runOffset < 0`` in the
reference (include/modules/module.hpp:14-26) — become ring buffers in an
explicit state pytree maintained by the Pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Hashable, Mapping

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class Dependency:
    """A required data key, optionally from a previous frame (offset <= 0)."""

    key: str
    offset: int = 0
    optional: bool = False


@dataclasses.dataclass(frozen=True)
class PipelineContext:
    """Static facts about the pipeline shared by all modules at trace time."""

    height: int
    width: int
    q: np.ndarray  # 4x4 float32 disparity->3D reprojection matrix
    grayscale: bool = False
    extras: Mapping[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def image_size(self) -> tuple[int, int]:
        return (self.height, self.width)


class StepContext:
    """Per-trace access to frame inputs and history ring buffers."""

    def __init__(self, frame: Mapping[str, jax.Array], history: Mapping[str, jax.Array]):
        self.frame = frame  # left, right, frame_id (+ source extras)
        self._history = history

    @property
    def frame_id(self) -> jax.Array:
        """1-based frame id, traced int32 scalar (reference run ids are 1-based)."""
        return self.frame["frame_id"]

    def history(self, key: str, offset: int) -> jax.Array:
        """Value of `key` from `offset` frames ago (offset <= -1).

        history entries older than the first frame contain the init value;
        use `history_len` to mask them out.
        """
        assert offset < 0
        return self._history[key][-offset - 1]

    def history_stack(self, key: str) -> jax.Array:
        """[K, ...] stack: index k = value from frame (t-1-k)."""
        return self._history[key]

    def history_len(self, key: str) -> jax.Array:
        """Traced count of valid history entries for `key` at this frame."""
        k = self._history[key].shape[0]
        return jax.numpy.minimum(self.frame_id - 1, k)


class SpatialContext:
    """Row-sharded execution context for ``Module.compute_spatial``.

    The spatial latency mode (parallel/spatial_flagship.py) runs the SAME
    module list as the production Pipeline inside a ``shard_map`` over a
    1-D mesh axis, each shard owning ``h_local`` consecutive image rows.
    This object is the only thing that distinguishes a spatial trace from
    a single-chip trace: halo exchanges stand in for the reference's CUDA
    shared-memory tile aprons (include/utils/cuda.cuh:59-191) and ``psum``
    for its global reductions.
    """

    def __init__(self, axis: str, n: int, h_local: int, global_h: int):
        self.axis = axis
        self.n = n
        self.h_local = h_local
        self.global_h = global_h

    @property
    def row0(self) -> jax.Array:
        """Traced global row index of this shard's first row."""
        return jax.lax.axis_index(self.axis) * self.h_local

    def exchange(self, x, up: int, down: int, fill="edge") -> jax.Array:
        """Extend a row shard with `up`/`down` neighbor rows over ICI."""
        from ..parallel.halo import exchange_row_halo

        return exchange_row_halo(x, up, down, self.axis, fill=fill)

    def psum(self, x):
        return jax.lax.psum(x, self.axis)

    def all_gather_rows(self, x) -> jax.Array:
        """Reassemble the full-height array on every shard (axis 0)."""
        return jax.lax.all_gather(x, self.axis, axis=0, tiled=True)

    def slice_rows(self, full) -> jax.Array:
        """This shard's rows of a full-height array (axis 0)."""
        return jax.lax.dynamic_slice_in_dim(full, self.row0, self.h_local, 0)


class Module:
    """A compute module: pure function from named arrays to named arrays."""

    name: str = "module"

    def provides(self) -> list[str]:
        return []

    def requires(self) -> list[Dependency]:
        return []

    def output_spec(self, ctx: PipelineContext) -> dict[str, jax.ShapeDtypeStruct]:
        """Shapes/dtypes of provided keys (needed to build history rings)."""
        return {}

    def init_state(self, ctx: PipelineContext) -> dict[str, np.ndarray]:
        """Persistent cross-frame state (checkpointable pytree leaves)."""
        return {}

    def host_param_spec(self, ctx: PipelineContext) -> dict[str, jax.ShapeDtypeStruct]:
        """Small host-fed inputs (e.g. plane classification ranges)."""
        return {}

    def initial_host_params(self, ctx: PipelineContext) -> dict[str, np.ndarray]:
        return {}

    def host_fetch_keys(self) -> list[str]:
        """Output keys this module wants back on host each frame."""
        return []

    def host_fetch_reduce(self) -> dict[str, str]:
        """Batch reduction per host-fetched key for multi-sequence mode.

        'sum' marks an additive key (histograms) safe to aggregate over
        the sequence axis; undeclared keys are passed as sequence 0 with
        a warning (see parallel/system.py::MultiSeqSystem).
        """
        return {}

    def host_update(
        self,
        ctx: PipelineContext,
        frame_id: int,
        fetched: Mapping[str, np.ndarray],
        system=None,
    ) -> dict[str, np.ndarray] | None:
        """Host-side per-frame hook; may return updated host params.

        `system` (when provided) allows global-data insertion, mirroring
        System::insertGlobalData (include/cartslam.hpp:84).
        """
        return None

    def variant(self, frame_id: int) -> Hashable:
        """Static trace variant for this frame (e.g. superpixel reset)."""
        return None

    def host_state(self) -> dict:
        """Checkpointable host-side state (running histograms etc.)."""
        return {}

    def restore_host_state(self, state: dict) -> None:
        pass

    def compute(
        self,
        ctx: PipelineContext,
        step: StepContext,
        deps: Mapping[str, jax.Array],
        state: Mapping[str, jax.Array],
        params: Mapping[str, jax.Array],
        variant: Hashable,
    ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
        """Returns (outputs keyed by provided names, new state)."""
        raise NotImplementedError

    # ------------------------------------------------------ spatial (sharded)

    def compute_spatial(
        self,
        ctx: PipelineContext,
        step: StepContext,
        deps: Mapping[str, jax.Array],
        state: Mapping[str, jax.Array],
        params: Mapping[str, jax.Array],
        variant: Hashable,
        sp: SpatialContext,
    ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
        """`compute` on a row shard inside the spatial latency mode.

        Every array (deps, state leaves, history, frame images, outputs)
        is this shard's `sp.h_local` consecutive rows; halo rows come from
        `sp.exchange` and global reductions from `sp.psum`.  The contract
        is the production `compute`'s math restricted to the shard — the
        parity suite (tests/test_spatial_flagship.py) pins the sharded
        chain bit-for-bit against the full-frame Pipeline.
        """
        raise NotImplementedError(
            f"module {self.name} does not support the spatial latency "
            "mode (no compute_spatial); run it in single-chip or multiseq "
            "mode"
        )

    def supports_spatial(self) -> bool:
        return type(self).compute_spatial is not Module.compute_spatial

    def spatial_row_dims(self, ctx: PipelineContext) -> dict[str, int | None]:
        """Row-axis index overrides for state leaves and output keys.

        The spatial composer shards every state leaf and output over the
        mesh axis at the dimension whose extent equals ctx.height (first
        match); keys mapped to None here stay replicated (e.g. global
        histograms emitted via psum), and explicit indices resolve
        ambiguous shapes.
        """
        return {}

    def spatial_validate(self, ctx: PipelineContext, n: int, h_local: int):
        """Raise if this module cannot run at `h_local` rows per shard
        (halo depths exceeding one neighbor shard, etc.)."""


class HostModule:
    """A host-side consumer (visualization/recording) of fetched outputs.

    Mirrors the reference's VisualizationModule family
    (include/modules/visualization.hpp): runs off the device path, consumes
    numpy copies of selected keys, and produces BGR images for the viewer.
    """

    name: str = "hostmodule"

    def requires(self) -> list[Dependency]:
        return []

    def provides_data(self) -> list[str]:
        """Per-run data keys this module computes on host (e.g. planes_eq).

        Returned keys of `process` are merged into the frame's fetched
        dict, so they participate in the run-data contract — retained runs
        (System.get_run_by_id) and downstream host modules see them, like
        the reference's promise-store keys (include/modules/planefit.hpp:9-16).
        """
        return []

    def process(
        self,
        ctx: PipelineContext,
        frame_id: int,
        frame: Mapping[str, np.ndarray],
        fetched: Mapping[str, np.ndarray],
        globals_: Mapping[str, Any],
    ) -> dict[str, Any] | None:
        """Compute per-run host data (keys listed by provides_data)."""
        return None

    def render(
        self,
        ctx: PipelineContext,
        frame_id: int,
        frame: Mapping[str, np.ndarray],
        fetched: Mapping[str, np.ndarray],
        globals_: Mapping[str, Any],
    ) -> np.ndarray | None | dict[str, np.ndarray]:
        """Return a BGR uint8 image (or dict window-name -> image)."""
        return None
