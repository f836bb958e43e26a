"""Color conversions matching OpenCV semantics used by the reference.

The reference converts BGR->GRAY before SGM (src/modules/disparity/disparity.cu:64-66)
and BGR->YCrCb before superpixel relaxation (src/modules/superpixels.cu:82).
Images are kept BGR uint8 [H, W, 3] throughout, matching cv::imread layout.
"""

import jax.numpy as jnp

# OpenCV ITU-R BT.601 luma weights (B, G, R order).
_B_W = 0.114
_G_W = 0.587
_R_W = 0.299

# OpenCV YCrCb constants for 8-bit images.
_CR_W = 0.713
_CB_W = 0.564
_DELTA = 128.0


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 [H,W,3] -> gray uint8 [H,W] (cv::COLOR_BGR2GRAY)."""
    f = img.astype(jnp.float32)
    y = f[..., 0] * _B_W + f[..., 1] * _G_W + f[..., 2] * _R_W
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def bgr_to_ycrcb(img: jnp.ndarray) -> jnp.ndarray:
    """BGR uint8 [H,W,3] -> YCrCb uint8 [H,W,3] (cv::COLOR_BGR2YCrCb)."""
    f = img.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = b * _B_W + g * _G_W + r * _R_W
    cr = (r - y) * _CR_W + _DELTA
    cb = (b - y) * _CB_W + _DELTA
    out = jnp.stack([y, cr, cb], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def gray_to_bgr(img: jnp.ndarray) -> jnp.ndarray:
    """Gray uint8 [H,W] -> BGR uint8 [H,W,3]."""
    return jnp.repeat(img[..., None], 3, axis=-1)
