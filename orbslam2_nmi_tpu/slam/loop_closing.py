"""Loop closing: detection, Sim3 verification, loop correction.

Step-interleaved equivalent of the reference's LoopClosing thread
(src/LoopClosing.cc:59 Run): per keyframe —

  * DetectLoop (:111-237): BoW candidates gated by the minimum covisible-
    neighbor score, then covisibility-consistency over 3 consecutive KFs.
  * ComputeSim3 (:239-408): descriptor matching against each candidate's
    map points, batched Horn Sim3 RANSAC (solvers/sim3.py), accept >= 20
    inliers.
  * CorrectLoop (:410-593): Sim3-propagate the current KF's covisible
    neighborhood, re-map their points, fuse duplicates against the loop
    side, optimize the essential graph (solvers/pose_graph.py) and run a
    global BA with NMI-fixed anchors — the reference launches that BA on a
    separate thread (:587); here it runs inline between frames.
"""

from __future__ import annotations

import numpy as np

from orbslam2_nmi_tpu.utils.bucketing import bucket, pad_rows, row_mask
import jax
import jax.numpy as jnp

from orbslam2_nmi_tpu.config import SystemConfig
from orbslam2_nmi_tpu.ops import matching
from orbslam2_nmi_tpu.slam.keyframe_database import KeyFrameDatabase
from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.solvers import pose_graph, sim3 as sim3_solver


class LoopCloser:
    def __init__(
        self,
        cfg: SystemConfig,
        map_store: MapStore,
        database: KeyFrameDatabase,
        local_mapper,
        log_fn=None,
    ):
        self.cfg = cfg
        self.map = map_store
        self.db = database
        self.local_mapper = local_mapper
        self.log = log_fn or (lambda s: None)
        self.consistent_groups: list[tuple[set, int]] = []
        self.last_loop_kf = -1
        self.covisibility_consistency_th = 3  # LoopClosing.h mnCovisibilityConsistencyTh
        self.loop_edges: list[tuple[int, int, np.ndarray]] = []  # (i, j, S_ji)
        self._rng_key = jax.random.PRNGKey(7)

    # ------------------------------------------------------------- pipeline

    def process_keyframe(self, k: int) -> bool:
        """Returns True if a loop was closed at this keyframe."""
        closed = False
        if self.map.n_keyframes >= 10 and k - self.last_loop_kf > 10:
            cands = self._detect_loop(k)
            for cand in cands:
                ok, Scw_corr, S_rel = self._compute_sim3(k, cand)
                if ok:
                    self._correct_loop(k, cand, Scw_corr, S_rel)
                    closed = True
                    break
        self.db.add(k, self.map.kf_feat_desc[k], self.map.kf_feat_valid[k])
        return closed

    # ------------------------------------------------------------ detection

    def _detect_loop(self, k: int) -> list[int]:
        """DetectLoop (LoopClosing.cc:111): candidate gen + 3-consecutive
        covisibility-consistency."""
        neighbors = self.map.covisible_keyframes(k)
        if len(neighbors) == 0:
            self.consistent_groups = []
            return []
        scores = self.db.score_all(self.db.bows[k]) if self.db.active[k] else None
        if scores is None:
            # current KF not yet in db; score directly
            bow = self.db.vocab.bow_vector(
                self.map.kf_feat_desc[k], self.map.kf_feat_valid[k]
            )
            self.db.bows[k] = bow
            scores = self.db.score_all(bow)
        min_score = min(float(scores[int(n)]) for n in neighbors if self.db.active[int(n)]) if any(
            self.db.active[int(n)] for n in neighbors
        ) else 0.0

        self.db.words[k] = set(
            int(x)
            for x in np.unique(
                self.db.vocab.quantize(self.map.kf_feat_desc[k], self.map.kf_feat_valid[k])
            )
            if x >= 0
        )
        cands = self.db.detect_loop_candidates(self.map, k, min_score)
        if not cands:
            self.consistent_groups = []
            return []

        # covisibility consistency over consecutive keyframes
        enough: list[int] = []
        new_groups: list[tuple[set, int]] = []
        for cand in cands:
            group = {cand} | {int(x) for x in self.map.covisible_keyframes(cand)}
            matched_any = False
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    new_count = count + 1
                    new_groups.append((group, new_count))
                    if new_count >= self.covisibility_consistency_th:
                        enough.append(cand)
                    matched_any = True
                    break
            if not matched_any:
                new_groups.append((group, 0))
                if 0 >= self.covisibility_consistency_th:
                    enough.append(cand)
        self.consistent_groups = new_groups
        if enough:
            self.log(f"KF {k}: loop candidates {enough}")
        return enough

    # ------------------------------------------------------------- sim3

    def _compute_sim3(self, k: int, cand: int):
        """ComputeSim3 (LoopClosing.cc:239): match map-point features of both
        KFs, Horn RANSAC on the paired 3-D points (camera frames)."""
        m = self.map
        has1 = m.kf_mp_idx[k] >= 0
        has2 = m.kf_mp_idx[cand] >= 0
        if has1.sum() < 20 or has2.sum() < 20:
            return False, None, None
        idx, _ = matching.match_descriptors(
            jnp.asarray(m.kf_feat_desc[k]),
            jnp.asarray(has1),
            jnp.asarray(m.kf_feat_desc[cand]),
            jnp.asarray(has2),
            max_dist=matching.TH_LOW,
            nn_ratio=0.75,
            angle_a=jnp.asarray(m.kf_feat_angle[k]),
            angle_b=jnp.asarray(m.kf_feat_angle[cand]),
            check_rotation=True,
        )
        idx = np.asarray(idx)
        f1 = np.nonzero(idx >= 0)[0]
        if len(f1) < 20:
            return False, None, None
        f2 = idx[f1]
        p_w1 = m.mp_pos[m.kf_mp_idx[k, f1]]
        p_w2 = m.mp_pos[m.kf_mp_idx[cand, f2]]
        T1 = m.kf_Tcw[k]
        T2 = m.kf_Tcw[cand]
        p1_cam = p_w1 @ T1[:3, :3].T + T1[:3, 3]
        p2_cam = p_w2 @ T2[:3, :3].T + T2[:3, 3]
        n_lv = self.cfg.orb.n_levels
        inv_s2 = (1.0 / (self.cfg.orb.scale_factor ** np.arange(n_lv)) ** 2).astype(np.float32)
        self._rng_key, sub = jax.random.split(self._rng_key)
        nb = bucket(len(f1))
        res = sim3_solver.sim3_ransac(
            sub,
            jnp.asarray(self.cfg.camera.K),
            jnp.asarray(pad_rows(p1_cam, nb)),
            jnp.asarray(pad_rows(p2_cam, nb)),
            jnp.asarray(pad_rows(m.kf_feat_xy[k, f1], nb)),
            jnp.asarray(pad_rows(m.kf_feat_xy[cand, f2], nb)),
            jnp.asarray(pad_rows(inv_s2[m.kf_feat_octave[k, f1]], nb, 1.0)),
            jnp.asarray(pad_rows(inv_s2[m.kf_feat_octave[cand, f2]], nb, 1.0)),
            jnp.asarray(row_mask(len(f1), nb)),
            min_inliers=20,
        )
        if not bool(res.ok):
            return False, None, None
        S12 = np.asarray(res.S12)  # maps cand-camera coords -> k-camera coords
        # corrected pose of k: Scw = S12 . T_cand (world -> cand cam -> k cam)
        Scw_corr = S12 @ T2
        self.log(
            f"KF {k}: Sim3 to {cand} accepted ({int(res.n_inliers)} inliers, "
            f"scale {float(res.scale):.3f})"
        )
        return True, Scw_corr.astype(np.float32), S12.astype(np.float32)

    # ---------------------------------------------------------- correction

    def _correct_loop(self, k: int, cand: int, Scw_corr: np.ndarray, S_rel: np.ndarray):
        """CorrectLoop (LoopClosing.cc:410)."""
        m = self.map
        self.log(f"KF {k}: closing loop with {cand}")
        neighbors = [k] + [int(x) for x in m.covisible_keyframes(k)]
        T_k_old = m.kf_Tcw[k].copy()
        T_k_old_inv = np.linalg.inv(T_k_old)

        corrected: dict[int, np.ndarray] = {}
        moved_points: set[int] = set()
        for kn in neighbors:
            T_n_old = m.kf_Tcw[kn].copy()
            rel = T_n_old @ T_k_old_inv  # n <- k (SE3)
            S_n_corr = rel @ Scw_corr  # sim3 corrected pose of neighbor
            corrected[kn] = S_n_corr.astype(np.float32)
        # re-map the neighborhood's points through the correction (vectorized:
        # one camera transform + one Sim3 inverse per keyframe, not per point)
        for kn in neighbors:
            S_n_corr = corrected[kn]
            T_n_old = m.kf_Tcw[kn]
            ps = np.unique(m.kf_mp_idx[kn])
            ps = ps[(ps >= 0) & m.mp_valid[np.maximum(ps, 0)]]
            ps = np.array([p for p in ps if p not in moved_points], np.int64)
            if len(ps) == 0:
                continue
            moved_points.update(int(p) for p in ps)
            pc = m.mp_pos[ps] @ T_n_old[:3, :3].T + T_n_old[:3, 3]  # [n, 3]
            sR = S_n_corr[:3, :3]
            s2 = float(sR[:, 0] @ sR[:, 0])  # scale^2; S_inv = (R^T/s^2 | -R^T t / s^2)
            m.mp_pos[ps] = (pc - S_n_corr[:3, 3]) @ sR / s2
            # write the corrected pose back as SE3 (normalize scale into
            # translation, like the reference's eigt /= s conversion :517)
            s = float(np.linalg.norm(S_n_corr[:3, 0]))
            T_new = S_n_corr.copy()
            T_new[:3, :3] /= s
            T_new[:3, 3] /= s
            m.kf_Tcw[kn] = T_new

        # fuse duplicated points between the loop sides
        if self.local_mapper is not None:
            self.local_mapper._fuse_into(cand, k)
            self.local_mapper._fuse_into(k, cand)

        # essential-graph optimization
        self.loop_edges.append((cand, k, (m.kf_Tcw[k] @ np.linalg.inv(m.kf_Tcw[cand])).astype(np.float32)))
        self._optimize_essential_graph(fixed_kf=cand)

        # global BA with NMI anchors (reference spawns a thread; inline here)
        if self.local_mapper is not None:
            self.local_mapper.global_ba(iters=10)
        self.last_loop_kf = k

    def _optimize_essential_graph(self, fixed_kf: int):
        """OptimizeEssentialGraph (Optimizer.cc:798): spanning tree + loop
        edges + strong covisibility (>=100) edges over Sim3 poses."""
        m = self.map
        kfs = [int(x) for x in m.valid_keyframe_indices()]
        if len(kfs) < 3:
            return
        pos = {kf: i for i, kf in enumerate(kfs)}
        V = len(kfs)
        edges_i, edges_j, meas = [], [], []

        def add_edge(i, j, S_ji=None):
            if i not in pos or j not in pos:
                return
            if S_ji is None:
                S_ji = (m.kf_Tcw[j] @ np.linalg.inv(m.kf_Tcw[i])).astype(np.float32)
            edges_i.append(pos[i])
            edges_j.append(pos[j])
            meas.append(S_ji)

        for kf in kfs:
            parent = int(m.kf_parent[kf])
            if parent >= 0 and m.kf_valid[parent]:
                add_edge(parent, kf)
            for kc in m.covisible_keyframes(kf, min_weight=100):
                if int(kc) > kf:
                    add_edge(kf, int(kc))
        for i, j, S in self.loop_edges:
            if m.kf_valid[i] and m.kf_valid[j]:
                add_edge(i, j, S)
        if not edges_i:
            return

        fixed = np.zeros(V, bool)
        fixed[pos[fixed_kf]] = True
        # NMI-anchored keyframes stay fixed in the pose graph too: they are
        # the georeference (FORK semantics carried into graph optimization)
        for kf in kfs:
            if m.kf_nmi_reloc[kf]:
                fixed[pos[kf]] = True

        prob = pose_graph.PoseGraphProblem(
            Scw=jnp.asarray(m.kf_Tcw[kfs]),
            fixed=jnp.asarray(fixed),
            valid=jnp.ones(V, bool),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_Sji=jnp.asarray(np.stack(meas)),
            edge_valid=jnp.ones(len(meas), bool),
        )
        out = np.asarray(pose_graph.optimize_pose_graph(prob, iters=20))
        # write back as SE3 (scale folded out) + correct map points through
        # the per-KF sim3 correction of their reference keyframe
        for kf in kfs:
            i = pos[kf]
            if fixed[i]:
                continue
            S_new = out[i]
            s = float(np.linalg.norm(S_new[:3, 0]))
            T_old = m.kf_Tcw[kf].copy()
            T_new = S_new.copy()
            T_new[:3, :3] /= s
            T_new[:3, 3] /= s
            # move this KF's first-observed points along with it
            corr = np.linalg.inv(T_new) @ T_old  # world-map correction
            for p in np.unique(m.kf_mp_idx[kf]):
                if p < 0 or not m.mp_valid[p] or m.mp_first_kf[p] != kf:
                    continue
                ph = np.append(m.mp_pos[p], 1.0)
                m.mp_pos[p] = (corr @ ph)[:3]
            m.kf_Tcw[kf] = T_new.astype(np.float32)
        self.log(f"essential graph optimized over {V} KFs, {len(meas)} edges")
