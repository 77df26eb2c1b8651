"""panodepth — TPU-native high-resolution panoramic depth estimation.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
"High-Resolution Depth Estimation for 360-degree Panoramas Through
Perspective and Panoramic Depth Images Registration" (Peng & Zhang,
WACV 2023): perspective-view extraction from equirectangular panoramas,
per-view polynomial depth registration against a panoramic baseline, and
multiresolution gradient-domain fusion into a high-resolution
equirectangular depth map — designed for TPU (dense stencils, vmapped
closed-form solvers, static precomputed geometry) rather than translated
from the reference's C++/OpenGL/Ceres implementation.
"""

from .config import (
    LAYOUTS,
    MergeConfig,
    ViewLayout,
    ZENITH_RANGE,
    five_fold_leres,
)
from .metrics import Metrics, error_metrics, paired_metrics
from .pipeline import merge_arrays, merge_depth_maps, run_batch

__version__ = "0.1.0"
