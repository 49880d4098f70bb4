"""orbslam2_nmi_tpu — a TPU-native monocular SLAM engine with NMI absolute localization.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of gsanya/orbslam2_NMI
(ORB-SLAM2 + Normalized-Mutual-Information localization against a prior 3-D model).

Design stance (see SURVEY.md §7): arrays, not object graphs. The map is a set of
fixed-capacity SoA arrays with validity masks; all math is jitted JAX + Pallas
kernels; host Python orchestrates tracking / mapping / loop closing as a
step-interleaved scheduler instead of the reference's 4 POSIX threads
(reference: src/System.cc:107-128).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry-safe default: TPU matmuls/convs default to bf16, which is fine for
# ML but poisons pose chains, fundamental matrices and GN normal equations
# (measured: the fused tracking chain drifted to NMI!=0.3 within 12 frames at
# 960x540 purely from bf16 pose composition). HIGHEST costs nothing on the
# tiny geometry products; the perf-critical image kernels opt back into fast
# precision explicitly (ops/pyramid.py convs; ops/raster.py and
# ops/histogram_nmi.py already pin their own operand dtypes).
# Only applied when the embedding application has not chosen a precision of
# its own — mutating process-global JAX config from a library import would
# otherwise silently change unrelated code's numerics.
if _jax.config.jax_default_matmul_precision is None:
    _jax.config.update("jax_default_matmul_precision", "highest")

from orbslam2_nmi_tpu.config import (  # noqa: F401
    CameraConfig,
    NMIConfig,
    ORBConfig,
    SystemConfig,
    load_yaml_config,
)
