"""Local mapping: map-point culling, triangulation, fusion, local BA, KF culling.

The step-interleaved equivalent of the reference's LocalMapping thread
(src/LocalMapping.cc:50-115 Run loop). Each new keyframe is processed
synchronously between tracking steps — the reference's queue/mutex protocol
(InsertKeyFrame :117, stop/finish flags LocalMapping.h:58-71) becomes a plain
call, preserving the architectural effect that tracking never waits on an
*in-flight* BA (BA runs between frames, never concurrently with one).

Parity notes:
  * recent-point culling ratios and windows: LocalMapping.cc:173-204
  * triangulation vs top-20 covisible KFs with baseline/median-depth,
    epipolar, parallax, reprojection and scale-consistency gates:
    LocalMapping.cc:210 + ORBmatcher::SearchForTriangulation (:690)
  * neighbor fuse: LocalMapping.cc SearchInNeighbors
  * local BA with NMI-relocalized keyframes FIXED: Optimizer.cc:548 (FORK)
  * KF culling (>=90% redundant), NMI KFs immune: LocalMapping.cc:696 (FORK)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbslam2_nmi_tpu.config import SystemConfig
from orbslam2_nmi_tpu.ops import matching, triangulate
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.solvers import local_ba
from orbslam2_nmi_tpu.utils.bucketing import bucket, pad_rows, row_mask


def _next_pow2(n: int, lo: int = 64) -> int:
    v = lo
    while v < n:
        v *= 2
    return v


class LocalMapper:
    def __init__(self, cfg: SystemConfig, map_store: MapStore, log_fn=None):
        self.cfg = cfg
        self.map = map_store
        self.log = log_fn or (lambda s: None)
        self.K = cfg.camera.K
        n_lv = cfg.orb.n_levels
        sf = cfg.orb.scale_factor
        self.inv_sigma2 = (1.0 / (sf ** np.arange(n_lv)) ** 2).astype(np.float32)
        self.recent_points: list[tuple[int, int]] = []  # (mp, created_at_kf)
        self.enable_kf_culling = True

    # ------------------------------------------------------------- pipeline

    def process_keyframe(self, k: int, abort_fn=None):
        """LocalMapping::Run body for one queued KF (LocalMapping.cc:50-115).

        `abort_fn` is the InterruptBA hook (LocalMapping.cc mbAbortBA): when it
        returns True (a newer KF is already queued), the local BA is skipped —
        it reruns at the newer KF, which is the reference's net behavior. Map
        mutations run under the map lock; the BA device solve does not.
        """
        with self.map.lock:
            # a System::Reset may have wiped the map while this KF sat in the
            # queue (the reference drains the mapping thread during Reset,
            # Tracking.cc:1764-1779; our epoch check is the async equivalent)
            epoch = self.map.epoch
            if k >= self.map.n_keyframes or not self.map.kf_valid[k]:
                return
            self._refresh_point_stats(k)
            self._cull_recent_points(k)
            self._create_new_map_points(k, abort_fn=abort_fn)
            # the reference skips SearchInNeighbors entirely when a newer KF
            # is already queued (LocalMapping::Run, LocalMapping.cc:84-88
            # `if(!CheckNewKeyFrames()) SearchInNeighbors()`): keeping mapper
            # latency low matters more than an immediately-deduped map
            if not (abort_fn and abort_fn()):
                self._fuse_neighbors(k)
            self.map.bump_version()
        if self.map.n_keyframes > 2 and not (abort_fn and abort_fn()):
            self.local_bundle_adjust(k, epoch=epoch)
        with self.map.lock:
            if self.map.epoch != epoch:
                return
            if self.enable_kf_culling:
                self._cull_keyframes(k)
                self.map.bump_version()

    def _refresh_point_stats(self, k: int):
        for f in np.nonzero(self.map.kf_mp_idx[k] >= 0)[0]:
            p = int(self.map.kf_mp_idx[k, f])
            self.map.update_point_stats(
                p, self.K, self.cfg.orb.scale_factor, self.cfg.orb.n_levels
            )

    # ------------------------------------------------------------- culling

    def _cull_recent_points(self, k: int):
        """MapPointCulling (LocalMapping.cc:173-204)."""
        keep = []
        for p, born in self.recent_points:
            if not self.map.mp_valid[p]:
                continue
            ratio = self.map.mp_found[p] / max(self.map.mp_visible[p], 1)
            age = k - born
            if ratio < 0.25:
                self.map.remove_map_point(p)
            elif age >= 2 and self.map.mp_obs_n[p] <= 2:
                self.map.remove_map_point(p)
            elif age >= 3:
                pass  # graduated — stop tracking
            else:
                keep.append((p, born))
        self.recent_points = keep

    def _cull_keyframes(self, k: int):
        """KeyFrameCulling (LocalMapping.cc:696): a covisible KF is redundant if
        >= 90% of its points are seen by >= 3 other KFs at same-or-finer scale.
        FORK rule: never cull NMI-relocalized keyframes."""
        m = self.map
        for kc in m.covisible_keyframes(k):
            kc = int(kc)
            if kc == 0 or m.kf_nmi_reloc[kc]:
                continue
            fs = np.nonzero(m.kf_mp_idx[kc] >= 0)[0]
            if len(fs) < 20:
                continue
            # vectorized observation-table walk (same layout as _ba_snapshot)
            ps = m.kf_mp_idx[kc, fs]
            lvl = m.kf_feat_octave[kc, fs]
            kk = m.mp_obs_kf[ps]  # [F, M]
            ff = m.mp_obs_feat[ps]
            slot = np.arange(kk.shape[1])[None, :]
            omask = (slot < m.mp_obs_n[ps][:, None]) & (kk >= 0) & (kk != kc)
            kk0 = np.maximum(kk, 0)
            omask &= m.kf_feat_octave[kk0, np.maximum(ff, 0)] <= lvl[:, None] + 1
            n_other = omask.sum(1)
            n_redundant = int((m.mp_valid[ps] & (n_other >= 3)).sum())
            if n_redundant >= 0.9 * len(fs):
                m.remove_keyframe(kc)
                self.log(f"culled redundant keyframe {kc}")

    # ------------------------------------------------------- new map points

    def _create_new_map_points(self, k: int, abort_fn=None):
        """CreateNewMapPoints (LocalMapping.cc:210), batched: ONE epipolar-
        match dispatch + ONE triangulation dispatch covering every usable
        neighbor pair (matching.match_epipolar_batch /
        triangulate.triangulate_and_gate_batch). The reference polls
        CheckNewKeyFrames() between neighbors (LocalMapping.cc:224) to abort;
        here the whole fan costs two dispatches, so the abort check runs
        before the device work and once after."""
        m = self.map
        ck = self._center(k)
        pairs = []
        for kn in self.map.best_covisible(k, 20):
            kn = int(kn)
            baseline = float(np.linalg.norm(self._center(kn) - ck))
            med_depth = self._median_depth(kn)
            if med_depth <= 0 or baseline / med_depth < 0.01:
                continue
            if (m.kf_feat_valid[kn] & (m.kf_mp_idx[kn] < 0)).sum() >= 5:
                pairs.append(kn)
        free1 = m.kf_feat_valid[k] & (m.kf_mp_idx[k] < 0)
        if not pairs or free1.sum() < 5 or (abort_fn and abort_fn()):
            return

        # ---- one epipolar-match dispatch across all pairs (pair axis padded
        # to a bucket so the program compiles once per bucket, not per count)
        sigma2 = 1.0 / self.inv_sigma2
        N = len(pairs)
        NP = 1
        while NP < N:
            NP *= 2
        F = m.kf_feat_desc.shape[1]
        pad_pairs = pairs + [pairs[0]] * (NP - N)
        desc2 = m.kf_feat_desc[pad_pairs]
        free2 = m.kf_feat_valid[pad_pairs] & (m.kf_mp_idx[pad_pairs] < 0)
        free2[N:] = False  # padding pairs match nothing
        xy2 = m.kf_feat_xy[pad_pairs]
        F12 = np.stack(
            [self._fundamental(k, kn) for kn in pad_pairs]
        ).astype(np.float32)
        s2 = sigma2[m.kf_feat_octave[pad_pairs]].astype(np.float32)
        idx_b = np.asarray(
            matching.match_epipolar_batch(
                jnp.asarray(m.kf_feat_desc[k]),
                jnp.asarray(np.broadcast_to(free1, (NP, F)).copy()),
                jnp.asarray(m.kf_feat_xy[k]),
                jnp.asarray(desc2),
                jnp.asarray(free2),
                jnp.asarray(xy2),
                jnp.asarray(F12),
                jnp.asarray(s2),
            )
        )[:N]  # [N, F] match into each neighbor

        # ---- one triangulation dispatch across all matched pairs
        f1_list = [np.nonzero(idx_b[i] >= 0)[0] for i in range(N)]
        n_max = max((len(f) for f in f1_list), default=0)
        if n_max == 0:
            return
        nb = bucket(n_max)
        uv1 = np.zeros((NP, nb, 2), np.float32)
        uv2 = np.zeros((NP, nb, 2), np.float32)
        s1g = np.ones((NP, nb), np.float32)
        s2g = np.ones((NP, nb), np.float32)
        vmask = np.zeros((NP, nb), bool)
        for i, kn in enumerate(pairs):
            f1s = f1_list[i]
            f2s = idx_b[i, f1s]
            nn = len(f1s)
            uv1[i, :nn] = m.kf_feat_xy[k][f1s]
            uv2[i, :nn] = m.kf_feat_xy[kn][f2s]
            s1g[i, :nn] = self.inv_sigma2[m.kf_feat_octave[k, f1s]]
            s2g[i, :nn] = self.inv_sigma2[m.kf_feat_octave[kn, f2s]]
            vmask[i, :nn] = True
        tri = triangulate.triangulate_and_gate_batch(
            jnp.asarray(self.K),
            jnp.asarray(m.kf_Tcw[k]),
            jnp.asarray(m.kf_Tcw[pad_pairs]),
            jnp.asarray(uv1),
            jnp.asarray(uv2),
            jnp.asarray(s1g),
            jnp.asarray(s2g),
            jnp.asarray(vmask),
        )
        ok_b = np.asarray(tri.valid)
        pts_b = np.asarray(tri.points_w)

        # ---- host insertion (same gates + bookkeeping as the per-pair path)
        sf = self.cfg.orb.scale_factor
        created = 0
        for i, kn in enumerate(pairs):
            f1s = f1_list[i]
            nn = len(f1s)
            if nn == 0:
                continue
            f2s = idx_b[i, f1s]
            ok = ok_b[i, :nn].copy()
            pts = pts_b[i, :nn]
            # scale consistency (LocalMapping.cc ratioDist vs ratioOctave, 1.5)
            d1 = np.linalg.norm(pts - ck, axis=-1)
            d2 = np.linalg.norm(pts - self._center(kn), axis=-1)
            ratio_dist = d2 / np.maximum(d1, 1e-9)
            ratio_oct = sf ** (
                m.kf_feat_octave[k, f1s].astype(np.float32)
                - m.kf_feat_octave[kn, f2s].astype(np.float32)
            )
            ok &= (ratio_dist < ratio_oct * sf * 1.5) & (ratio_dist * sf * 1.5 > ratio_oct)
            for j in np.nonzero(ok)[0]:
                f1, f2 = int(f1s[j]), int(f2s[j])
                if m.kf_mp_idx[kn, f2] >= 0:
                    continue
                existing = int(m.kf_mp_idx[k, f1])
                if existing >= 0:
                    # the same new-KF feature matched (and passed the
                    # triangulation gates) in an EARLIER pair this round:
                    # that is a third view of the same landmark — bind it as
                    # an extra observation instead of dropping the match
                    # (the sequential reference reaches the same state one
                    # step later through SearchInNeighbors' fuse)
                    if m.mp_valid[existing]:
                        m.add_observation(kn, f2, existing)
                    continue
                p = m.add_map_point(pts[j], m.kf_feat_desc[k, f1], k, np.zeros(3, np.float32))
                m.add_observation(k, f1, p)
                m.add_observation(kn, f2, p)
                m.update_point_stats(p, self.K, sf, self.cfg.orb.n_levels)
                self.recent_points.append((p, k))
                created += 1
        if created:
            self.log(f"KF {k}: created {created} map points")

    def _triangulate_pair(self, k1: int, k2: int) -> int:
        m = self.map
        free1 = m.kf_feat_valid[k1] & (m.kf_mp_idx[k1] < 0)
        free2 = m.kf_feat_valid[k2] & (m.kf_mp_idx[k2] < 0)
        if free1.sum() < 5 or free2.sum() < 5:
            return 0
        # epipolar-constrained match (SearchForTriangulation) — mask built on
        # device inside one fused dispatch (matching.match_epipolar)
        F12 = self._fundamental(k1, k2)
        xy1 = m.kf_feat_xy[k1]
        xy2 = m.kf_feat_xy[k2]
        sigma2 = (1.0 / self.inv_sigma2)[m.kf_feat_octave[k2]]
        idx, _ = matching.match_epipolar(
            jnp.asarray(m.kf_feat_desc[k1]),
            jnp.asarray(free1),
            jnp.asarray(m.kf_feat_desc[k2]),
            jnp.asarray(free2),
            jnp.asarray(xy1),
            jnp.asarray(xy2),
            jnp.asarray(F12.astype(np.float32)),
            jnp.asarray(sigma2.astype(np.float32)),
        )
        idx = np.asarray(idx)
        f1s = np.nonzero(idx >= 0)[0]
        if len(f1s) == 0:
            return 0
        f2s = idx[f1s]
        nb = bucket(len(f1s))
        tri = triangulate.triangulate_and_gate(
            jnp.asarray(self.K),
            jnp.asarray(m.kf_Tcw[k1]),
            jnp.asarray(m.kf_Tcw[k2]),
            jnp.asarray(pad_rows(xy1[f1s], nb)),
            jnp.asarray(pad_rows(xy2[f2s], nb)),
            jnp.asarray(pad_rows(self.inv_sigma2[m.kf_feat_octave[k1, f1s]], nb, 1.0)),
            jnp.asarray(pad_rows(self.inv_sigma2[m.kf_feat_octave[k2, f2s]], nb, 1.0)),
            jnp.asarray(row_mask(len(f1s), nb)),
        )
        ok = np.array(tri.valid)[: len(f1s)]  # writable copy
        pts = np.asarray(tri.points_w)[: len(f1s)]
        # scale consistency (LocalMapping.cc ratioDist vs ratioOctave, factor 1.5)
        d1 = np.linalg.norm(pts - self._center(k1), axis=-1)
        d2 = np.linalg.norm(pts - self._center(k2), axis=-1)
        ratio_dist = d2 / np.maximum(d1, 1e-9)
        sf = self.cfg.orb.scale_factor
        ratio_oct = sf ** (
            m.kf_feat_octave[k1, f1s].astype(np.float32)
            - m.kf_feat_octave[k2, f2s].astype(np.float32)
        )
        ok &= (ratio_dist < ratio_oct * sf * 1.5) & (ratio_dist * sf * 1.5 > ratio_oct)
        n_new = 0
        for i in np.nonzero(ok)[0]:
            f1, f2 = int(f1s[i]), int(f2s[i])
            if m.kf_mp_idx[k1, f1] >= 0 or m.kf_mp_idx[k2, f2] >= 0:
                continue
            p = m.add_map_point(pts[i], m.kf_feat_desc[k1, f1], k1, np.zeros(3, np.float32))
            m.add_observation(k1, f1, p)
            m.add_observation(k2, f2, p)
            m.update_point_stats(p, self.K, sf, self.cfg.orb.n_levels)
            self.recent_points.append((p, k1))
            n_new += 1
        return n_new

    # ----------------------------------------------------------------- fuse

    def _fuse_neighbors(self, k: int):
        """SearchInNeighbors (LocalMapping.cc SearchInNeighbors): project this
        KF's points into neighbors (and back) and merge duplicates — all
        (src, dst) directions matched in ONE device dispatch
        (matching.fuse_match_batch), mutations applied sequentially on the
        host afterwards. The per-direction matches are computed against the
        pre-fuse map state; stale entries (a point replaced by an earlier
        direction's merge) are dropped by the validity guards at apply time —
        the same tolerance the reference's MapPoint::Replace forwarding gives
        its sequential loop."""
        m = self.map
        neighbors = [int(x) for x in self.map.best_covisible(k, 10)]
        directions = [(k, kn) for kn in neighbors] + [(kn, k) for kn in neighbors]

        jobs = []  # (k_src, k_dst, src_ps, proj)
        for k_src, k_dst in directions:
            src_ps = np.unique(m.kf_mp_idx[k_src])
            src_ps = src_ps[src_ps >= 0]
            src_ps = src_ps[m.mp_valid[src_ps]]
            if len(src_ps) == 0:
                continue
            Tcw = m.kf_Tcw[k_dst]
            pts = m.mp_pos[src_ps]
            pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
            z = pc[:, 2]
            zs = np.where(np.abs(z) > 1e-9, z, 1e-9)
            u = self.K[0, 0] * pc[:, 0] / zs + self.K[0, 2]
            v = self.K[1, 1] * pc[:, 1] / zs + self.K[1, 2]
            vis = (
                (z > 0)
                & (u >= 0)
                & (u < self.cfg.camera.width)
                & (v >= 0)
                & (v < self.cfg.camera.height)
            )
            src_ps = src_ps[vis]
            if len(src_ps) == 0:
                continue
            jobs.append((k_src, k_dst, src_ps, np.stack([u[vis], v[vis]], -1)))
        if jobs:
            P = len(jobs)
            PP = 1
            while PP < P:
                PP *= 2
            nb = bucket(max(len(j[2]) for j in jobs))
            F = m.kf_feat_desc.shape[1]
            desc_src = np.zeros((PP, nb, 8), np.uint32)
            valid_src = np.zeros((PP, nb), bool)
            proj = np.zeros((PP, nb, 2), np.float32)
            desc_dst = np.zeros((PP, F, 8), np.uint32)
            valid_dst = np.zeros((PP, F), bool)
            xy_dst = np.zeros((PP, F, 2), np.float32)
            for i, (k_src, k_dst, src_ps, pj) in enumerate(jobs):
                n = len(src_ps)
                desc_src[i, :n] = m.mp_desc[src_ps]
                valid_src[i, :n] = True
                proj[i, :n] = pj
                desc_dst[i] = m.kf_feat_desc[k_dst]
                valid_dst[i] = m.kf_feat_valid[k_dst]
                xy_dst[i] = m.kf_feat_xy[k_dst]
            idx_b = np.asarray(
                matching.fuse_match_batch(
                    jnp.asarray(desc_src), jnp.asarray(valid_src),
                    jnp.asarray(proj), jnp.asarray(desc_dst),
                    jnp.asarray(valid_dst), jnp.asarray(xy_dst),
                )
            )
            for i, (k_src, k_dst, src_ps, _) in enumerate(jobs):
                idx = idx_b[i, : len(src_ps)]
                for j in np.nonzero(idx >= 0)[0]:
                    p = int(src_ps[j])
                    f = int(idx[j])
                    if not m.mp_valid[p]:
                        continue  # replaced by an earlier direction's merge
                    existing = int(m.kf_mp_idx[k_dst, f])
                    if existing < 0:
                        m.add_observation(k_dst, f, p)
                    elif existing != p and m.mp_valid[existing]:
                        # keep the better-observed point (MapPoint::Replace)
                        if m.mp_obs_n[existing] >= m.mp_obs_n[p]:
                            m.replace_map_point(p, existing)
                        else:
                            m.replace_map_point(existing, p)
        self._refresh_point_stats(k)

    def _fuse_into(self, k_src: int, k_dst: int, radius: float = 3.0):
        m = self.map
        src_ps = np.unique(m.kf_mp_idx[k_src])
        src_ps = src_ps[src_ps >= 0]
        src_ps = src_ps[m.mp_valid[src_ps]]
        if len(src_ps) == 0:
            return
        Tcw = m.kf_Tcw[k_dst]
        pts = m.mp_pos[src_ps]
        pc = (Tcw[:3, :3] @ pts.T).T + Tcw[:3, 3]
        z = pc[:, 2]
        u = self.K[0, 0] * pc[:, 0] / np.where(np.abs(z) > 1e-9, z, 1e-9) + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / np.where(np.abs(z) > 1e-9, z, 1e-9) + self.K[1, 2]
        vis = (
            (z > 0)
            & (u >= 0)
            & (u < self.cfg.camera.width)
            & (v >= 0)
            & (v < self.cfg.camera.height)
        )
        src_ps = src_ps[vis]
        if len(src_ps) == 0:
            return
        proj = np.stack([u[vis], v[vis]], axis=-1)
        nb = bucket(len(src_ps))
        sm = matching.window_mask(
            jnp.asarray(pad_rows(proj.astype(np.float32), nb)),
            jnp.asarray(m.kf_feat_xy[k_dst]),
            radius,
        )
        idx, _ = matching.match_descriptors(
            jnp.asarray(pad_rows(m.mp_desc[src_ps], nb)),
            jnp.asarray(row_mask(len(src_ps), nb)),
            jnp.asarray(m.kf_feat_desc[k_dst]),
            jnp.asarray(m.kf_feat_valid[k_dst]),
            spatial_mask=sm,
            max_dist=matching.TH_LOW,
            apply_ratio=False,
        )
        idx = np.asarray(idx)[: len(src_ps)]
        for i in np.nonzero(idx >= 0)[0]:
            p = int(src_ps[i])
            f = int(idx[i])
            existing = int(m.kf_mp_idx[k_dst, f])
            if existing < 0:
                m.add_observation(k_dst, f, p)
            elif existing != p and m.mp_valid[existing]:
                # keep the better-observed point (MapPoint::Replace semantics)
                if m.mp_obs_n[existing] >= m.mp_obs_n[p]:
                    m.replace_map_point(p, existing)
                else:
                    m.replace_map_point(existing, p)

    # ------------------------------------------------------------------- BA

    def local_bundle_adjust(self, k: int, epoch: int | None = None):
        """Optimizer::LocalBundleAdjustment (Optimizer.cc:472): covisible KFs
        free (NMI-anchored + KF 0 fixed), observer-only KFs fixed.

        Snapshot and write-back hold the map lock; the device solve runs
        unlocked so an async tracking thread is never blocked on BA. A result
        computed against a map that was Reset mid-solve (epoch changed) is
        discarded at write-back."""
        with self.map.lock:
            if epoch is not None and self.map.epoch != epoch:
                return
            snap = self._ba_snapshot(k)
        if snap is None:
            return
        prob, cams, pts, fixed, oc, op, O, n_local = snap
        self._last_prob = prob  # kept for the divergence-dump diagnostics
        res = local_ba.bundle_adjust(
            prob,
            iters1=self.cfg.tracking.local_ba_iters1,
            iters2=self.cfg.tracking.local_ba_iters2,
        )
        with self.map.lock:
            if epoch is not None and self.map.epoch != epoch:
                return
            self._ba_apply(res, cams, pts, fixed, oc, op, O, n_local)
            self.map.bump_version()

    def _ba_snapshot(self, k: int):
        m = self.map
        local = [k] + [int(x) for x in self.map.covisible_keyframes(k)]
        local = local[:24]
        pts = np.unique(m.kf_mp_idx[local])
        pts = pts[pts >= 0]
        pts = pts[m.mp_valid[pts]]
        if len(pts) < 10:
            return None
        # vectorized observation-table walk (was per-point Python loops —
        # the dominant host cost while the device idled)
        obs_kk = m.mp_obs_kf[pts]  # [P, M]
        obs_ff = m.mp_obs_feat[pts]
        n_obs = m.mp_obs_n[pts]
        slot = np.arange(obs_kk.shape[1])[None, :]
        omask = (slot < n_obs[:, None]) & (obs_kk >= 0)
        omask &= m.kf_valid[np.maximum(obs_kk, 0)]

        observers = np.unique(obs_kk[omask])
        fixed_kfs = sorted(set(int(x) for x in observers) - set(local))
        cams = local + fixed_kfs
        cam_pos_arr = np.full(m.kf_valid.shape[0], -1, np.int64)
        for i, kf in enumerate(cams):
            cam_pos_arr[kf] = i

        kk_flat = obs_kk[omask]
        ff_flat = obs_ff[omask]
        obs_cam = cam_pos_arr[kk_flat]
        obs_pt = np.broadcast_to(np.arange(len(pts))[:, None], obs_kk.shape)[omask]
        keep = obs_cam >= 0
        obs_cam = obs_cam[keep]
        obs_pt = obs_pt[keep]
        kk_flat = kk_flat[keep]
        ff_flat = ff_flat[keep]
        obs_uv = m.kf_feat_xy[kk_flat, ff_flat]
        obs_w = self.inv_sigma2[m.kf_feat_octave[kk_flat, ff_flat]]
        O = len(obs_cam)
        if O < 20:
            return None

        C = _next_pow2(len(cams), 8)
        P = _next_pow2(len(pts), 256)
        Ob = _next_pow2(O, 1024)
        fixed = np.zeros(C, bool)
        fixed[len(cams):] = True
        for i, kf in enumerate(cams):
            if kf in fixed_kfs or kf == 0 or m.kf_nmi_reloc[kf]:
                fixed[i] = True
        cam_valid = np.zeros(C, bool)
        cam_valid[: len(cams)] = True
        pts_valid = np.zeros(P, bool)
        pts_valid[: len(pts)] = True

        cam_Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cam_Tcw[: len(cams)] = m.kf_Tcw[cams]
        pts_w = np.zeros((P, 3), np.float32)
        pts_w[: len(pts)] = m.mp_pos[pts]
        oc = np.zeros(Ob, np.int32)
        op = np.zeros(Ob, np.int32)
        ouv = np.zeros((Ob, 2), np.float32)
        ow = np.ones(Ob, np.float32)
        ovalid = np.zeros(Ob, bool)
        oc[:O] = obs_cam
        op[:O] = obs_pt
        ouv[:O] = obs_uv
        ow[:O] = obs_w
        ovalid[:O] = True

        prob = local_ba.BAProblem(
            K=jnp.asarray(self.K),
            cam_Tcw=jnp.asarray(cam_Tcw),
            cam_fixed=jnp.asarray(fixed),
            cam_valid=jnp.asarray(cam_valid),
            pts_w=jnp.asarray(pts_w),
            pts_valid=jnp.asarray(pts_valid),
            obs_cam=jnp.asarray(oc),
            obs_pt=jnp.asarray(op),
            obs_uv=jnp.asarray(ouv),
            obs_inv_sigma2=jnp.asarray(ow),
            obs_valid=jnp.asarray(ovalid),
        )
        return prob, cams, pts, fixed, oc, op, O, len(local)

    def _ba_apply(self, res, cams, pts, fixed, oc, op, O, n_local):
        m = self.map
        new_cams = np.asarray(res.cam_Tcw)
        new_pts = np.asarray(res.pts_w)
        inlier = np.asarray(res.obs_inlier)
        # divergence guard: a solve that rejects (nearly) every observation is
        # a failed solve (e.g. mutually inconsistent fixed anchors), not a
        # legitimate outlier recollection — applying it would strip the map.
        # g2o's LM would similarly refuse a step that explodes chi2.
        n_bad = int((~inlier[:O]).sum())
        if O >= 50 and n_bad > 0.8 * O:
            self.log(
                f"local BA REJECTED: {n_bad}/{O} observations marked outlier "
                "(divergent solve, fixed-anchor conflict?) — result discarded"
            )
            import os

            dump = os.environ.get("ORBSLAM2_NMI_TPU_DUMP_BAD_BA")
            prob = getattr(self, "_last_prob", None)
            if dump and prob is not None:
                np.savez(
                    os.path.join(dump, f"bad_ba_{O}.npz"),
                    O=O, new_cams=new_cams, chi2=np.asarray(res.chi2),
                    **{f: np.asarray(getattr(prob, f)) for f in prob._fields},
                )
            return
        for i, kf in enumerate(cams):
            if not fixed[i] and m.kf_valid[kf]:
                m.kf_Tcw[kf] = new_cams[i]
        # skip points culled/replaced while the (unlocked) solve ran
        still = m.mp_valid[pts]
        m.mp_pos[pts[still]] = new_pts[: len(pts)][still]
        # drop outlier observations (Optimizer.cc:725 recollection)
        inv_cam = {i: kf for i, kf in enumerate(cams)}
        dropped = 0
        for j in np.nonzero(~inlier[:O])[0]:
            kf = inv_cam[int(oc[j])]
            p = int(pts[op[j]])
            n = m.mp_obs_n[p]
            for kk, ff in zip(m.mp_obs_kf[p, :n], m.mp_obs_feat[p, :n]):
                if int(kk) == kf:
                    m.remove_observation(int(kk), int(ff))
                    dropped += 1
                    break
        self.log(
            f"local BA: {n_local} KFs ({int(fixed[:len(cams)].sum())} fixed), "
            f"{len(pts)} pts, {O} obs, dropped {dropped}"
        )

    def global_ba(self, iters: int = 20):
        """GlobalBundleAdjustemnt (Optimizer.cc:43) with NMI-fixed anchors
        (Optimizer.cc:82 FORK). Used at NMI initialization and after loops.
        Synchronous path: snapshot + solve + apply inline."""
        with self.map.lock:
            snap = self.global_ba_snapshot()
        if snap is None:
            return
        res = local_ba.bundle_adjust(
            snap[0], iters1=iters // 2, iters2=iters - iters // 2
        )
        self.global_ba_apply(res, *snap[1:])

    def global_ba_snapshot(self):
        """Build the full-map BA problem. Caller holds the map lock.

        Returns (problem, kfs, pts, fixed) or None — the async pipeline runs
        the solve off-thread (the reference's GBA thread, LoopClosing.cc:587)
        and global_ba_apply propagates to state created meanwhile."""
        m = self.map
        kfs = [int(x) for x in m.valid_keyframe_indices()]
        pts = m.valid_point_indices()
        if len(kfs) < 1 or len(pts) < 10:
            return None
        cam_pos_arr = np.full(m.kf_valid.shape[0], -1, np.int64)
        for i, kf in enumerate(kfs):
            cam_pos_arr[kf] = i
        obs_kk = m.mp_obs_kf[pts]  # [P, M]
        obs_ff = m.mp_obs_feat[pts]
        slot = np.arange(obs_kk.shape[1])[None, :]
        omask = (slot < m.mp_obs_n[pts][:, None]) & (obs_kk >= 0)
        omask &= m.kf_valid[np.maximum(obs_kk, 0)]
        kk_flat = obs_kk[omask]
        ff_flat = obs_ff[omask]
        obs_cam = cam_pos_arr[kk_flat]
        obs_pt = np.broadcast_to(np.arange(len(pts))[:, None], obs_kk.shape)[omask]
        keep = obs_cam >= 0
        obs_cam, obs_pt = obs_cam[keep], obs_pt[keep]
        kk_flat, ff_flat = kk_flat[keep], ff_flat[keep]
        obs_uv = m.kf_feat_xy[kk_flat, ff_flat]
        obs_w = self.inv_sigma2[m.kf_feat_octave[kk_flat, ff_flat]]
        O = len(obs_cam)
        if O < 20:
            return None
        C = _next_pow2(len(kfs), 8)
        P = _next_pow2(len(pts), 256)
        Ob = _next_pow2(O, 1024)
        fixed = np.zeros(C, bool)
        for i, kf in enumerate(kfs):
            if kf == 0 or m.kf_nmi_reloc[kf]:
                fixed[i] = True
        cam_valid = np.zeros(C, bool)
        cam_valid[: len(kfs)] = True
        pts_valid = np.zeros(P, bool)
        pts_valid[: len(pts)] = True
        cam_Tcw = np.tile(np.eye(4, dtype=np.float32), (C, 1, 1))
        cam_Tcw[: len(kfs)] = m.kf_Tcw[kfs]
        pts_w = np.zeros((P, 3), np.float32)
        pts_w[: len(pts)] = m.mp_pos[pts]
        oc = np.zeros(Ob, np.int32)
        op = np.zeros(Ob, np.int32)
        ouv = np.zeros((Ob, 2), np.float32)
        ow = np.ones(Ob, np.float32)
        ovalid = np.zeros(Ob, bool)
        oc[:O] = obs_cam
        op[:O] = obs_pt
        ouv[:O] = obs_uv
        ow[:O] = obs_w
        ovalid[:O] = True
        prob = local_ba.BAProblem(
            K=jnp.asarray(self.K),
            cam_Tcw=jnp.asarray(cam_Tcw),
            cam_fixed=jnp.asarray(fixed),
            cam_valid=jnp.asarray(cam_valid),
            pts_w=jnp.asarray(pts_w),
            pts_valid=jnp.asarray(pts_valid),
            obs_cam=jnp.asarray(oc),
            obs_pt=jnp.asarray(op),
            obs_uv=jnp.asarray(ouv),
            obs_inv_sigma2=jnp.asarray(ow),
            obs_valid=jnp.asarray(ovalid),
        )
        return prob, kfs, pts, fixed

    def global_ba_apply(self, res, kfs: list, pts: np.ndarray, fixed: np.ndarray):
        """Write a (possibly stale) global-BA result back and propagate the
        corrections to keyframes/points created while the solve ran, through
        the spanning tree (RunGlobalBundleAdjustment tail,
        LoopClosing.cc:690-756)."""
        m = self.map
        with m.lock:
            Tbef = m.kf_Tcw.copy()  # mTcwBefGBA per keyframe
            in_ba_kf = np.zeros(m.kf_valid.shape[0], bool)
            in_ba_kf[kfs] = True
            new_cams = np.asarray(res.cam_Tcw)
            for i, kf in enumerate(kfs):
                if not fixed[i] and m.kf_valid[kf]:
                    m.kf_Tcw[kf] = new_cams[i]
            # KFs created during the solve: Tcw = (Tcw_old @ inv(Tparent_old))
            # @ Tparent_new — parents always precede children in index order
            n_prop = 0
            for kf in m.valid_keyframe_indices():
                if in_ba_kf[kf]:
                    continue
                par = int(m.kf_parent[kf])
                while par >= 0 and not m.kf_valid[par]:
                    par = int(m.kf_parent[par])
                if par < 0:
                    continue
                rel = Tbef[kf] @ np.linalg.inv(Tbef[par])
                m.kf_Tcw[kf] = (rel @ m.kf_Tcw[par]).astype(np.float32)
                n_prop += 1
            # points solved by the BA (skip ones culled/replaced meanwhile)
            new_pts = np.asarray(res.pts_w)
            still = m.mp_valid[pts]
            m.mp_pos[pts[still]] = new_pts[: len(pts)][still]
            # points created during the solve: move with their reference KF
            # (LoopClosing.cc:744-755: Rwc_new * (Rcw_bef * X + tcw_bef))
            in_ba_pt = np.zeros(m.mp_valid.shape[0], bool)
            in_ba_pt[pts] = True
            others = m.valid_point_indices()
            others = others[~in_ba_pt[others]]
            if len(others):
                ref = m.mp_first_kf[others].astype(np.int64)
                ok = (ref >= 0) & m.kf_valid[np.maximum(ref, 0)]
                others, ref = others[ok], ref[ok]
                if len(others):
                    ph = np.concatenate(
                        [m.mp_pos[others], np.ones((len(others), 1), np.float32)], 1
                    )
                    corr = np.einsum(
                        "nij,njk->nik",
                        np.linalg.inv(m.kf_Tcw[ref]),
                        Tbef[ref],
                    )
                    m.mp_pos[others] = np.einsum("nij,nj->ni", corr, ph)[:, :3]
            self.log(
                f"global BA: {len(kfs)} KFs, {len(pts)} pts "
                f"(+{n_prop} KFs, {len(others)} pts propagated)"
            )
            m.bump_version()

    # ----------------------------------------------------------------- utils

    def _center(self, k: int) -> np.ndarray:
        T = self.map.kf_Tcw[k]
        return -T[:3, :3].T @ T[:3, 3]

    def _median_depth(self, k: int) -> float:
        """KeyFrame::ComputeSceneMedianDepth (KeyFrame.cc:641)."""
        m = self.map
        ps = m.kf_mp_idx[k]
        ps = ps[ps >= 0]
        ps = ps[m.mp_valid[ps]]
        if len(ps) == 0:
            return -1.0
        T = m.kf_Tcw[k]
        z = (m.mp_pos[ps] @ T[2, :3]) + T[2, 3]
        return float(np.median(z))

    def _fundamental(self, k1: int, k2: int) -> np.ndarray:
        """F12 = K^-T [t]x R K^-1 from relative pose (ORBmatcher epipolar)."""
        T1 = self.map.kf_Tcw[k1]
        T2 = self.map.kf_Tcw[k2]
        R1, t1 = T1[:3, :3], T1[:3, 3]
        R2, t2 = T2[:3, :3], T2[:3, 3]
        R12 = R1 @ R2.T
        t12 = -R12 @ t2 + t1
        tx = np.array(
            [[0, -t12[2], t12[1]], [t12[2], 0, -t12[0]], [-t12[1], t12[0], 0]],
            np.float32,
        )
        Kinv = np.linalg.inv(self.K)
        return Kinv.T @ tx @ R12 @ Kinv
