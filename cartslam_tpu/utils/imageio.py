"""Image file IO helpers (BGR layout, matching cv::imread)."""

from __future__ import annotations

import numpy as np


def imread_bgr(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        rgb = np.asarray(Image.open(path).convert("RGB"))
        return rgb[..., ::-1].copy()


def imwrite_bgr(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        rgb = img[..., ::-1] if img.ndim == 3 else img
        Image.fromarray(rgb).save(path)
