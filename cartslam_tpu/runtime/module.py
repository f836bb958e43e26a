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
