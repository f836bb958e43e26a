"""SuperPixelModule (reference: src/modules/superpixels.cu:19-121).

Persistent label image in module state = the reference's stateful
ContourRelaxation object (temporal superpixel tracking).  Reset to the
block grid every `reset_iterations` frames; `initial_iterations` sweeps on
frame 1 and on reset frames, `iterations` otherwise (superpixels.cu:93-113).
The iteration count changes the traced program, so it is a Pipeline variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import color
from ..ops import superpixels as spops
from ..runtime.module import Dependency, Module, PipelineContext

KEY_SUPERPIXELS = "superpixels"
KEY_MAX_LABEL = "superpixels_max_label"
KEY_DERIVATIVE = "disparity_derivative"


class SuperPixelModule(Module):
    name = "SuperPixelDetect"

    def __init__(
        self,
        image_size: tuple[int, int],
        initial_iterations: int = 18,
        iterations: int = 6,
        block_size: int = 12,
        reset_iterations: int = 64,
        direct_clique_cost: float = 0.5,
        diagonal_clique_cost: float = 0.5 / np.sqrt(2),
        compactness_weight: float = 0.1,
        progressive_compactness_cost: float = 0.0,
        image_weight: float = 1.5,
        disparity_weight: float = 1.0,
        relax_phases: int = 1,
        stats_refresh: str = "frame",
    ):
        # stats_refresh='frame' (default) keeps label statistics fixed
        # across the frame's sweeps, dropping the per-phase scatter that
        # dominates relax on TPU (~40% of the module).  Gated by
        # tests/test_quality.py: it matches or beats the
        # reference-faithful 'phase' mode on boundary recall,
        # under-segmentation, and plane accuracy.
        if block_size < 1:
            raise ValueError("blockSize must be more than 1")
        if direct_clique_cost < 0:
            raise ValueError("directCliqueCost must be non-negative")
        if compactness_weight < 0 or image_weight < 0 or disparity_weight < 0:
            raise ValueError("weight must be non-negative")

        self.image_size = image_size
        self.initial_iterations = initial_iterations
        self.iterations = iterations
        self.block_size = block_size
        self.reset_iterations = reset_iterations
        self.direct_clique_cost = direct_clique_cost
        self.diagonal_clique_cost = diagonal_clique_cost
        self.compactness_weight = compactness_weight
        self.progressive_compactness_cost = progressive_compactness_cost
        self.image_weight = image_weight
        self.disparity_weight = disparity_weight
        self.relax_phases = relax_phases
        self.stats_refresh = stats_refresh

        h, w = image_size
        bx = -(-w // block_size)
        by = -(-h // block_size)
        # reference: maxLabelId = nBlocksX * nBlocksY (initialization.cu:50);
        # stat tables are sized maxLabelId + 1.
        self.max_label_id = bx * by
        self.num_labels = self.max_label_id + 1

    # ------------------------------------------------------------- contracts

    def provides(self):
        return [KEY_SUPERPIXELS, KEY_MAX_LABEL]

    def requires(self):
        if self.disparity_weight > 0:
            return [Dependency(KEY_DERIVATIVE)]
        return []

    def output_spec(self, ctx: PipelineContext):
        return {
            KEY_SUPERPIXELS: jax.ShapeDtypeStruct((ctx.height, ctx.width), jnp.int32),
            KEY_MAX_LABEL: jax.ShapeDtypeStruct((), jnp.int32),
        }

    def init_state(self, ctx: PipelineContext):
        labels, _ = spops.block_init_labels(
            ctx.height, ctx.width, self.block_size, self.block_size
        )
        return {"labels": np.asarray(labels)}

    def variant(self, frame_id: int) -> str:
        if frame_id == 1:
            return "initial"
        if frame_id % self.reset_iterations == 0:
            return "reset"
        return "normal"

    # --------------------------------------------------------------- compute

    def compute(self, ctx, step, deps, state, params, variant):
        left = step.frame["left"]
        if ctx.grayscale:
            img = left[..., None].astype(jnp.float32)
            img_channels = 1
        else:
            img = color.bgr_to_ycrcb(left).astype(jnp.float32)
            img_channels = 3

        # Gaussian specs must align positionally with feature_data; the
        # compactness spec goes last (its data is implicit pixel coords).
        feature_data = []
        specs = []
        if self.disparity_weight > 0:
            feature_data.append(deps[KEY_DERIVATIVE].astype(jnp.float32))
            specs.append(spops.FeatureSpec("gaussian", self.disparity_weight, 2))
        feature_data.append(img)
        # YCrCb / grayscale image channels are uint8-valued: the tight
        # bound nearly halves the moment tally's byte-plane matmul rows.
        specs.append(spops.FeatureSpec(
            "gaussian", self.image_weight, img_channels, bounds=(0, 255)
        ))
        specs.append(
            spops.FeatureSpec(
                "compactness",
                self.compactness_weight,
                2,
                self.progressive_compactness_cost,
            )
        )

        labels = state["labels"]
        if variant == "reset":
            labels, _ = spops.block_init_labels(
                ctx.height, ctx.width, self.block_size, self.block_size
            )
        iters = (
            self.initial_iterations
            if variant in ("initial", "reset")
            else self.iterations
        )

        labels = spops.relax(
            labels,
            feature_data,
            specs,
            self.num_labels,
            iters,
            self.direct_clique_cost,
            self.diagonal_clique_cost,
            phases=self.relax_phases,
            stats_refresh=self.stats_refresh,
        )
        outputs = {
            KEY_SUPERPIXELS: labels,
            KEY_MAX_LABEL: jnp.int32(self.max_label_id),
        }
        return outputs, {"labels": labels}

    # ------------------------------------------------------ spatial (sharded)

    def spatial_validate(self, ctx, n, h_local):
        ph = max(1, self.relax_phases)
        for it, name in (
            (self.iterations, "iterations"),
            (self.initial_iterations, "initial_iterations"),
        ):
            if it * ph > h_local:
                raise ValueError(
                    f"superpixels {name}*phases={it * ph} exceeds the "
                    f"{h_local}-row shard"
                )

    def compute_spatial(self, ctx, step, deps, state, params, variant, sp):
        """Sharded contour relaxation: `iterations * phases`-row halos
        (label influence moves one row per phase update) + psum'd label
        moments — exact in both 'frame' and 'phase' stats modes; OOB
        label fills (-1) reproduce image-edge masking at the global
        borders (ops/superpixels.py:relax)."""
        left = step.frame["left"]
        if ctx.grayscale:
            img = left[..., None].astype(jnp.float32)
            img_channels = 1
        else:
            img = color.bgr_to_ycrcb(left).astype(jnp.float32)
            img_channels = 3

        iters = (
            self.initial_iterations
            if variant in ("initial", "reset")
            else self.iterations
        )
        halo = iters * max(1, self.relax_phases)

        labels = state["labels"]
        if variant == "reset":
            # The reference re-initializes the label grid every
            # resetIterations frames (superpixels.cu:105-113); the global
            # block grid restricted to this shard's rows.
            full, _ = spops.block_init_labels(
                ctx.height, ctx.width, self.block_size, self.block_size
            )
            labels = sp.slice_rows(jnp.asarray(full))

        feature_data = []
        specs = []
        if self.disparity_weight > 0:
            feature_data.append(
                sp.exchange(deps[KEY_DERIVATIVE].astype(jnp.float32),
                            halo, halo)
            )
            specs.append(spops.FeatureSpec("gaussian", self.disparity_weight, 2))
        feature_data.append(sp.exchange(img, halo, halo))
        specs.append(spops.FeatureSpec(
            "gaussian", self.image_weight, img_channels, bounds=(0, 255)
        ))
        specs.append(
            spops.FeatureSpec(
                "compactness",
                self.compactness_weight,
                2,
                self.progressive_compactness_cost,
            )
        )
        lab_ext = sp.exchange(labels, halo, halo, fill=-1)
        labels_ext = spops.relax(
            lab_ext,
            feature_data,
            specs,
            self.num_labels,
            iters,
            self.direct_clique_cost,
            self.diagonal_clique_cost,
            phases=self.relax_phases,
            stats_refresh=self.stats_refresh,
            axis_name=sp.axis,
            row_offset=sp.row0 - halo,
            global_h=ctx.height,
            halo_rows=(halo, halo),
        )
        labels = labels_ext[halo:-halo]
        outputs = {
            KEY_SUPERPIXELS: labels,
            KEY_MAX_LABEL: jnp.int32(self.max_label_id),
        }
        return outputs, {"labels": labels}
