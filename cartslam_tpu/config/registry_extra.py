"""Registry builders for feature/plane-fit modules (split to keep imports lazy)."""

from __future__ import annotations


def build_features_module(cfg: dict, st):
    from ..models.features import ImageFeatureDetectorModule

    ftype = cfg.get("feature_type", "orb")
    if ftype != "orb":
        raise ValueError(f"unknown feature type '{ftype}'")
    return ImageFeatureDetectorModule(max_keypoints=cfg.get("keypoints", 5000))


def build_planefit_module(cfg: dict, st):
    from ..models.planefit import SuperPixelPlaneFitModule

    return SuperPixelPlaneFitModule(
        num_labels=st.num_superpixel_labels(),
        fit_method=cfg.get("fit_method", "ransac"),
    )


def build_planecluster_module(cfg: dict, st):
    from ..models.planecluster import SuperPixelPlaneClusterModule

    return SuperPixelPlaneClusterModule(
        num_labels=st.num_superpixel_labels(),
        fit_method=cfg.get("fit_method", "ransac"),
    )
