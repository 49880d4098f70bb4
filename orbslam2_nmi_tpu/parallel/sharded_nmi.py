"""Multi-chip NMI pose-grid search: translation candidates sharded over ICI.

The single-chip NMI path (ops/histogram_nmi.py) already evaluates the whole
6-D grid in one dispatch; this module spreads the *render/translation* axis S
across a device mesh with shard_map. Each chip renders its slice of candidate
camera centers, scores it against the (replicated) rotation-warped camera
images, and the global best cell is found with an argmax tournament over a
psum/all_gather of the per-shard score blocks (SURVEY.md §2.4 P7).

Scaling shape: per-chip work drops as S/D while the readback stays one [S, R]
score array; ICI traffic is only the [S, R] floats (KBs), so efficiency is
essentially linear until per-chip S becomes too small to fill the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from orbslam2_nmi_tpu.ops import histogram_nmi, homography, render
from orbslam2_nmi_tpu.parallel.mesh import POSE_AXIS


def pad_to_multiple(x: jnp.ndarray, m: int, axis: int = 0, fill=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def sharded_nmi_search(
    mesh,
    model: render.RenderModel,
    frame_gray: jnp.ndarray,  # [H, W] float32, replicated
    Tcw: jnp.ndarray,  # [4, 4]
    offsets_cam: jnp.ndarray,  # [S, 3] translation candidates (padded to D)
    angles: jnp.ndarray,  # [R, 3] rotation candidates
    K: jnp.ndarray,
    height: int,
    width: int,
    near: float,
    far: float,
    point_size: int = 3,
    metric: str = "SUC",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Evaluate the full (S x R) NMI grid with S sharded over the mesh.

    Returns the [S, R] score matrix (padded rows score -inf). The caller takes
    argmax exactly as in the single-chip path.
    """
    n_dev = mesh.shape[POSE_AXIS]
    S = offsets_cam.shape[0]
    R = angles.shape[0]
    offsets_p = pad_to_multiple(offsets_cam, n_dev, axis=0, fill=1e6)  # far away => empty render
    angles_p = pad_to_multiple(angles, n_dev, axis=0)  # identity-rotation pads
    S_pad = offsets_p.shape[0]
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"

    # homographies + warp-path choice from the FULL angle set (so the sharded
    # warp takes the exact same code path as the single-device reference run)
    Hs, warp_one = _shard_warp_plan(frame_gray, K, angles_p)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(POSE_AXIS, None), P(POSE_AXIS, None, None)),
        out_specs=P(POSE_AXIS, None),
    )
    def eval_shard(offsets_local, Hs_local):
        # the rotation warps are sharded too (R/D per chip) and exchanged
        # with one [R, H, W] all_gather — a replicated warp costs n_dev x the
        # FLOPs for the same wall time (the r3 scaling bench's NMI overhead)
        warped_rep = jax.lax.all_gather(
            warp_one(Hs_local), POSE_AXIS, axis=0, tiled=True
        )
        synth = render.render_translation_grid(
            model, Tcw, K, offsets_local, height, width, near, far, point_size
        )
        return histogram_nmi.nmi_scores(
            synth, warped_rep, metric=metric, use_pallas=use_pallas
        )

    scores = eval_shard(offsets_p, Hs)
    valid = (jnp.arange(S_pad) < S)[:, None]
    return jnp.where(valid, scores, -jnp.inf)[:S, :R]


def _shard_warp_plan(frame_gray, K, angles_p):
    """(homographies [R_pad, 3, 3], warp_fn(Hs_local) -> [R_loc, H, W]) using
    the same two-pass/gather decision warp_rotation_grid makes for the FULL
    angle set — sharding must not change which warp algorithm runs."""
    import numpy as np

    bound = homography.shift_bounds_for_angles(
        np.asarray(K), np.asarray(angles_p), *frame_gray.shape
    )
    use_two_pass = max(bound) <= 64
    Hs = homography.homographies_from_angles(K, angles_p)
    if use_two_pass:
        return Hs, lambda h: homography._warp_grid_two_pass_jit(frame_gray, h, bound)
    return Hs, lambda h: homography._warp_grid_gather_jit(frame_gray, h)


def sharded_nmi_search_mesh(
    mesh,
    binned,  # ops.raster.BinnedMesh (binned at the grid-center pose)
    frame_gray: jnp.ndarray,  # [H, W] float32, replicated
    Tcw: jnp.ndarray,  # [4, 4]
    offsets_cam: jnp.ndarray,  # [S, 3] translation candidates
    angles: jnp.ndarray,  # [R, 3] rotation candidates
    K,
    near: float,
    far: float,
    metric: str = "SUC",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Mesh-raster variant of sharded_nmi_search (the reference's default
    render mode 1): each chip rasterizes its slice of translation candidates
    from the shared binned mesh. The tri_data/texture arrays are replicated —
    they are read-only model state, exactly like `model` in the splat path."""
    import numpy as np

    from orbslam2_nmi_tpu.ops import raster

    n_dev = mesh.shape[POSE_AXIS]
    S = offsets_cam.shape[0]
    R = angles.shape[0]
    offsets_p = pad_to_multiple(offsets_cam, n_dev, axis=0, fill=1e6)
    angles_p = pad_to_multiple(angles, n_dev, axis=0)
    S_pad = offsets_p.shape[0]
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    K_np = np.asarray(K, np.float32)

    Hs, warp_one = _shard_warp_plan(frame_gray, jnp.asarray(K_np), angles_p)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(POSE_AXIS, None), P(POSE_AXIS, None, None)),
        out_specs=P(POSE_AXIS, None),
        check_vma=False,  # pallas_call outputs carry no varying-mesh-axes info
    )
    def eval_shard(offsets_local, Hs_local):
        # warps sharded over the same axis + one all_gather (see
        # sharded_nmi_search)
        warped_rep = jax.lax.all_gather(
            warp_one(Hs_local), POSE_AXIS, axis=0, tiled=True
        )
        synth = raster.render_mesh_grid(
            binned, Tcw, K_np, offsets_local, near, far, interpret=not use_pallas
        )
        return histogram_nmi.nmi_scores(
            synth, warped_rep, metric=metric, use_pallas=use_pallas
        )

    scores = eval_shard(offsets_p, Hs)
    valid = (jnp.arange(S_pad) < S)[:, None]
    return jnp.where(valid, scores, -jnp.inf)[:S, :R]
