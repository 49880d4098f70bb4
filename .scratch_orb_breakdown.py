"""Scratch: per-stage ORB extraction timing on the real chip."""
import numpy as np
import jax
import jax.numpy as jnp

import bench
from orbslam2_nmi_tpu.config import ORBConfig
from orbslam2_nmi_tpu.ops import fast as fast_ops
from orbslam2_nmi_tpu.ops import orb, pyramid as pyr

cfg = ORBConfig(n_features=2000, scale_factor=1.2, n_levels=8, ini_th_fast=20, min_th_fast=7)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (540, 960)).astype(np.uint8))
imgf = img.astype(jnp.float32)

t = bench._per_iter(lambda x: orb.extract_orb(x.astype(jnp.uint8), cfg).desc, (imgf,))
print("extract_orb total: %.2f ms" % (t * 1e3))

t = bench._per_iter(lambda x: pyr.build_pyramid(x, 8, 1.2)[-1], (imgf,))
print("pyramid: %.2f ms" % (t * 1e3))

levels = pyr.build_pyramid(imgf, 8, 1.2)
budgets = [int(b) for b in cfg.features_per_level()]
border = cfg.edge_threshold - 3

lv = levels[0]
t = bench._per_iter(
    lambda x: fast_ops.detect_with_fallback(x, 20, 7, cell=cfg.cell_size, border=border)[1],
    (lv,),
)
print("FAST level0: %.2f ms" % (t * 1e3))

keep, score = fast_ops.detect_with_fallback(lv, 20, 7, cell=cfg.cell_size, border=border)
t = bench._per_iter(
    lambda s: orb.select_spatial_topk(s, budgets[0], orb._distribution_cell(*lv.shape, budgets[0]))[0],
    (score,),
)
print("topk level0 (n=%d): %.2f ms" % (budgets[0], t * 1e3))

t = bench._per_iter(lambda x: orb.orientation_maps(x)[0], (lv,))
print("orientation maps level0: %.2f ms" % (t * 1e3))

t = bench._per_iter(lambda x: pyr.gaussian_blur(x, 7, 2.0), (lv,))
print("blur level0: %.2f ms" % (t * 1e3))

ys, xs, sc, valid = orb.select_spatial_topk(score, budgets[0], orb._distribution_cell(*lv.shape, budgets[0]))
m10, m01 = orb.orientation_maps(lv)
angles = jnp.arctan2(m01[ys, xs], m10[ys, xs])
blurred = pyr.gaussian_blur(lv, 7, 2.0)
t = bench._per_iter(lambda b: orb.compute_descriptors(b, xs, ys, angles), (blurred,))
print("descriptors level0 (n=%d): %.2f ms" % (budgets[0], t * 1e3))
