"""ImageFeatureDetectorModule (reference: src/modules/features.cpp).

ORB-style keypoints+descriptors on both stereo images (the reference runs
its detector on left and right via a visitor, features.cpp:20-25).  Output
keys: 'features' float32 [2, K, 3] (x, y, score; score <= 0 marks an unused
slot — static-shape stand-in for the dynamic keypoint vectors) and
'feature_descriptors' uint32 [2, K, 8].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import color
from ..ops.features import detect_orb_pyramid
from ..runtime.module import Module, PipelineContext

KEY_FEATURES = "features"
KEY_DESCRIPTORS = "feature_descriptors"


class ImageFeatureDetectorModule(Module):
    name = "ImageFeatureDetector"

    def __init__(
        self,
        max_keypoints: int = 5000,
        threshold: int = 20,
        levels: int = 3,
    ):
        self.max_keypoints = max_keypoints
        self.threshold = threshold
        self.levels = levels

    def provides(self):
        return [KEY_FEATURES, KEY_DESCRIPTORS]

    def output_spec(self, ctx: PipelineContext):
        k = self.max_keypoints
        return {
            KEY_FEATURES: jax.ShapeDtypeStruct((2, k, 4), jnp.float32),
            KEY_DESCRIPTORS: jax.ShapeDtypeStruct((2, k, 8), jnp.uint32),
        }

    def compute(self, ctx, step, deps, state, params, variant):
        outs = []
        descs = []
        for img in (step.frame["left"], step.frame["right"]):
            gray = img if ctx.grayscale else color.bgr_to_gray(img)
            kps, d = detect_orb_pyramid(
                gray, self.max_keypoints, self.threshold, self.levels
            )
            outs.append(kps)
            descs.append(d)
        return {
            KEY_FEATURES: jnp.stack(outs, axis=0),
            KEY_DESCRIPTORS: jnp.stack(descs, axis=0),
        }, {}
