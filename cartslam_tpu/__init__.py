"""cartslam_tpu — a TPU-native real-time stereo-vision perception framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CART-SLAM
(reference: /root/reference, a C++17/CUDA pipeline).  The reference's
thread-pool + promise-store module scheduler becomes a single jit-compiled
dataflow ``step`` function per frame; its ~20 CUDA kernels become jnp/Pallas
ops; its cross-frame dependencies (negative run offsets) become ring buffers
threaded through an explicit state pytree.

Layout:
    ops/       pure-function compute ops (census/SGM disparity, derivatives,
               depth reprojection, optical flow, superpixels, plane seg/fit)
    models/    pipeline modules (requires/provides contracts mirroring the
               reference's module zoo, reference: include/modules/*)
    runtime/   pipeline composer + System driver (reference: src/cartslam.cpp)
    sources/   data sources (KITTI, synthetic, ZED-format; reference: src/sources)
    parallel/  device-mesh scale-out (multi-sequence DP + spatial sharding)
    utils/     colors, csv, peaks, plane math
    viz/       array renderers + host viewer (reference: src/utils/ui.cpp)
    config/    JSON config reader w/ same schema (reference: src/cartconfig.cpp)
"""

__version__ = "0.1.0"

DISPARITY_INVALID = -32768  # reference: include/modules/disparity.hpp:17
DERIVATIVE_INVALID = -32768  # reference: src/modules/planeseg/planeseg.cu:14

# Plane classes, reference: include/modules/planeseg.hpp:37-41
PLANE_HORIZONTAL = 0
PLANE_VERTICAL = 1
PLANE_UNKNOWN = 2
