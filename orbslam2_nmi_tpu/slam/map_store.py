"""Fixed-capacity SoA map: keyframes, map points, observations, covisibility.

Replaces the reference's pointer web of Map / KeyFrame / MapPoint
(src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc) with flat numpy arrays +
validity masks (SURVEY.md §7 stance: "arrays, not object graphs"). All mutation
happens host-side between device steps (the reference guards the same state
with mMutexMapUpdate held across Track(), Tracking.cc:377 — our step-interleaved
scheduler makes that serialization structural instead of lock-based). Device
solvers consume padded snapshots with static shapes.

Covisibility (KeyFrame::UpdateConnections, src/KeyFrame.cc:294) is maintained
incrementally as a dense [K, K] shared-observation count matrix; the spanning
tree parent is the strongest covisible at insertion (KeyFrame.cc spanning-tree
semantics), used by loop closing's correction propagation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from orbslam2_nmi_tpu.config import SystemConfig

COVIS_MIN_WEIGHT = 15  # covisibility graph edge threshold (KeyFrame.cc:294)
MAX_OBS_PER_POINT = 48


@dataclass
class MapStore:
    cfg: SystemConfig
    # --- keyframes
    kf_Tcw: np.ndarray = field(init=False)  # [K, 4, 4]
    kf_valid: np.ndarray = field(init=False)  # [K]
    kf_frame_id: np.ndarray = field(init=False)  # [K]
    kf_timestamp: np.ndarray = field(init=False)  # [K]
    kf_nmi_reloc: np.ndarray = field(init=False)  # [K] — anchored in BA
    kf_nmi_failed: np.ndarray = field(init=False)  # [K]
    kf_parent: np.ndarray = field(init=False)  # [K] spanning tree (-1 root)
    kf_Tcp: np.ndarray = field(init=False)  # [K, 4, 4] child->parent rel at cull (KeyFrame::mTcp)
    # --- keyframe features
    kf_feat_xy: np.ndarray = field(init=False)  # [K, F, 2] undistorted px
    kf_feat_octave: np.ndarray = field(init=False)  # [K, F]
    kf_feat_angle: np.ndarray = field(init=False)  # [K, F]
    kf_feat_desc: np.ndarray = field(init=False)  # [K, F, 8] uint32
    kf_feat_valid: np.ndarray = field(init=False)  # [K, F]
    kf_mp_idx: np.ndarray = field(init=False)  # [K, F] -> mp or -1
    # --- map points
    mp_pos: np.ndarray = field(init=False)  # [P, 3]
    mp_valid: np.ndarray = field(init=False)  # [P]
    mp_desc: np.ndarray = field(init=False)  # [P, 8] distinctive descriptor
    mp_normal: np.ndarray = field(init=False)  # [P, 3] mean viewing dir
    mp_min_dist: np.ndarray = field(init=False)  # [P] scale-invariance range
    mp_max_dist: np.ndarray = field(init=False)
    mp_first_kf: np.ndarray = field(init=False)  # [P]
    mp_visible: np.ndarray = field(init=False)  # [P] frustum-visible count
    mp_found: np.ndarray = field(init=False)  # [P] actually-matched count
    # --- observation lists per point (for BA + distinctive descriptor)
    mp_obs_kf: np.ndarray = field(init=False)  # [P, M]
    mp_obs_feat: np.ndarray = field(init=False)  # [P, M]
    mp_obs_n: np.ndarray = field(init=False)  # [P]
    # --- covisibility
    covis: np.ndarray = field(init=False)  # [K, K] int32 shared-point counts

    n_keyframes: int = 0
    n_points: int = 0
    # correction counter, bumped whenever an ASYNC worker lands a map
    # correction (local/global BA write-back, keyframe processing, loop
    # correction, NMI anchor). The pipelined front-end compares it per frame
    # and re-anchors its device carry on change — the analogue of the classic
    # path's per-frame Tracking::UpdateLastFrame (Tracking.cc:1020). Without
    # it, corrections landing mid-chain leave the carry's poses/landmarks
    # stale against the corrected candidate set until the next keyframe, and
    # the two populations fight in pose GN (the r4 far-arc pose jumps).
    version: int = 0
    # generation counter, bumped by clear(): async workers snapshot it when
    # they dequeue a keyframe and abandon their work if a System::Reset wiped
    # the map underneath them (the reference serializes this by draining the
    # mapping/loop threads in Tracking::Reset, Tracking.cc:1764-1779)
    epoch: int = 0

    def __post_init__(self):
        import threading

        # map-update mutex (the reference's Map::mMutexMapUpdate, held across
        # Track() — Tracking.cc:377 — and by the mapping thread around map
        # mutations). Reentrant so the synchronous single-thread pipeline is
        # unchanged.
        self.lock = threading.RLock()
        # observers notified on KF removal (the reference erases culled KFs
        # from KeyFrameDatabase inside SetBadFlag, KeyFrame.cc:504)
        self.on_keyframe_removed: list = []
        # delayed-reuse queue of culled map-point slots: (slot, freed_at_kf).
        # Long sequences churn points (culling + fuse); without reuse the
        # bump allocator exhausts max_map_points on runs the reference
        # (pointer-based, GC'd by delete) handles fine.
        from collections import deque

        self._mp_free: "deque[tuple[int, int]]" = deque()
        # slots currently sitting in _mp_free — guards against double-queueing
        # the same slot (remove_map_point after remove_observation already
        # declared the point dead) which would hand one slot to two points
        self._mp_free_queued: set = set()
        self._alloc()

    def clear(self):
        """Map::clear for System::Reset: wipe all state but KEEP the lock and
        the keyframe-removal observers (callers must hold the lock). Bumps
        `epoch` so in-flight async mapping work is discarded at its next
        lock-acquiring phase instead of mutating the fresh map."""
        self._alloc()
        self.n_keyframes = 0
        self.n_points = 0
        self._mp_free.clear()
        self._mp_free_queued.clear()
        self.epoch += 1

    def _alloc(self):
        t = self.cfg.tracking
        K, P, F = t.max_keyframes, t.max_map_points, t.max_features
        M = MAX_OBS_PER_POINT
        self.kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        self.kf_valid = np.zeros(K, bool)
        self.kf_frame_id = np.full(K, -1, np.int64)
        self.kf_timestamp = np.zeros(K, np.float64)
        self.kf_nmi_reloc = np.zeros(K, bool)
        self.kf_nmi_failed = np.zeros(K, bool)
        self.kf_parent = np.full(K, -1, np.int32)
        self.kf_Tcp = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        self.kf_feat_xy = np.zeros((K, F, 2), np.float32)
        self.kf_feat_octave = np.zeros((K, F), np.int32)
        self.kf_feat_angle = np.zeros((K, F), np.float32)
        self.kf_feat_desc = np.zeros((K, F, 8), np.uint32)
        self.kf_feat_valid = np.zeros((K, F), bool)
        self.kf_mp_idx = np.full((K, F), -1, np.int32)
        self.mp_pos = np.zeros((P, 3), np.float32)
        self.mp_valid = np.zeros(P, bool)
        self.mp_desc = np.zeros((P, 8), np.uint32)
        self.mp_normal = np.zeros((P, 3), np.float32)
        self.mp_min_dist = np.zeros(P, np.float32)
        self.mp_max_dist = np.full(P, np.inf, np.float32)
        self.mp_first_kf = np.full(P, -1, np.int32)
        self.mp_visible = np.ones(P, np.int32)
        self.mp_found = np.ones(P, np.int32)
        self.mp_obs_kf = np.full((P, M), -1, np.int32)
        self.mp_obs_feat = np.full((P, M), -1, np.int32)
        self.mp_obs_n = np.zeros(P, np.int32)
        self.covis = np.zeros((K, K), np.int32)

    # ----------------------------------------------------------- keyframes

    def add_keyframe(
        self,
        Tcw: np.ndarray,
        frame_id: int,
        timestamp: float,
        feat_xy: np.ndarray,
        feat_octave: np.ndarray,
        feat_angle: np.ndarray,
        feat_desc: np.ndarray,
        feat_valid: np.ndarray,
        mp_idx: np.ndarray | None = None,
        nmi_relocalized: bool = False,
        nmi_failed: bool = False,
    ) -> int:
        k = self.n_keyframes
        if k >= self.kf_valid.shape[0]:
            raise RuntimeError("keyframe capacity exhausted")
        self.n_keyframes += 1
        self.kf_Tcw[k] = Tcw
        self.kf_valid[k] = True
        self.kf_frame_id[k] = frame_id
        self.kf_timestamp[k] = timestamp
        self.kf_nmi_reloc[k] = nmi_relocalized
        self.kf_nmi_failed[k] = nmi_failed
        n = len(feat_xy)
        self.kf_feat_xy[k, :n] = feat_xy
        self.kf_feat_octave[k, :n] = feat_octave
        self.kf_feat_angle[k, :n] = feat_angle
        self.kf_feat_desc[k, :n] = feat_desc
        self.kf_feat_valid[k, :n] = feat_valid
        if mp_idx is not None:
            for f in np.nonzero(mp_idx >= 0)[0]:
                self.add_observation(k, int(f), int(mp_idx[f]))
        self._update_connections(k)
        return k

    def _update_connections(self, k: int):
        """Recompute covisibility row for k and pick its spanning-tree parent."""
        row = self.covis[k, : self.n_keyframes]
        if self.n_keyframes > 1 and self.kf_parent[k] < 0:
            prev = row[:k]
            if prev.size and prev.max() > 0:
                self.kf_parent[k] = int(prev.argmax())
            elif k > 0:
                self.kf_parent[k] = k - 1  # fall back to temporal predecessor

    def remove_keyframe(self, k: int):
        """SetBadFlag (KeyFrame.cc:461): drop observations, re-parent children.

        Stores the cull-time child->parent relative pose (KeyFrame::mTcp,
        KeyFrame.cc SetBadFlag tail) so trajectory recomposition can walk the
        spanning tree past culled reference keyframes (System.cc:551-556)."""
        if not self.kf_valid[k]:
            return
        for f in np.nonzero(self.kf_mp_idx[k] >= 0)[0]:
            self.remove_observation(k, int(f))
        if self.kf_parent[k] >= 0:
            self.kf_Tcp[k] = self.kf_Tcw[k] @ np.linalg.inv(self.kf_Tcw[self.kf_parent[k]])
        self.kf_valid[k] = False
        self.covis[k, :] = 0
        self.covis[:, k] = 0
        parent = self.kf_parent[k]
        children = np.nonzero(self.kf_parent[: self.n_keyframes] == k)[0]
        for c in children:
            if not self.kf_valid[c]:
                # A child culled EARLIER stored Tcp[c] relative to k; its
                # parent pointer now skips k, so the spanning-tree walk
                # (System.cc:551-556 `Trw *= mTcp`) would compose c->k with
                # k's NEW parent and land frames meters off. Fold k's own
                # hop in so Tcp[c] stays exact: (c->k) @ (k->parent).
                self.kf_Tcp[c] = (self.kf_Tcp[c] @ self.kf_Tcp[k]).astype(np.float32)
            self.kf_parent[c] = parent
        for cb in self.on_keyframe_removed:
            cb(k)

    def covisible_keyframes(self, k: int, min_weight: int = COVIS_MIN_WEIGHT) -> np.ndarray:
        """KF indices sharing >= min_weight points with k, strongest first."""
        if k >= self.n_keyframes or not self.kf_valid[k]:
            return np.zeros(0, np.int64)
        row = self.covis[k, : self.n_keyframes].copy()
        row[k] = 0
        row = np.where(self.kf_valid[: self.n_keyframes], row, 0)
        idx = np.nonzero(row >= min_weight)[0]
        return idx[np.argsort(-row[idx])]

    def best_covisible(self, k: int, n: int) -> np.ndarray:
        """GetBestCovisibilityKeyFrames(n) (KeyFrame.cc:143)."""
        if k >= self.n_keyframes or not self.kf_valid[k]:
            return np.zeros(0, np.int64)
        row = self.covis[k, : self.n_keyframes].copy()
        row[k] = 0
        row = np.where(self.kf_valid[: self.n_keyframes], row, 0)
        idx = np.nonzero(row > 0)[0]
        idx = idx[np.argsort(-row[idx])]
        return idx[:n]

    # ----------------------------------------------------------- map points

    def add_map_point(
        self, pos: np.ndarray, desc: np.ndarray, first_kf: int, normal: np.ndarray,
        min_dist: float = 0.0, max_dist: float = np.inf,
    ) -> int:
        p = self.n_points
        if p < self.mp_valid.shape[0]:
            self.n_points += 1
        else:
            # bump space exhausted: recycle the oldest culled slot, but only
            # after a quarantine of 4 keyframes since it was freed — live
            # frame bindings to a removed point are validity-checked
            # everywhere, and the quarantine keeps a recycled id from
            # re-validating while any such stale binding can still exist
            # (the front-end prunes its binding history well within 4 KFs)
            if not self._mp_free or self._mp_free[0][1] + 4 > self.n_keyframes:
                raise RuntimeError("map point capacity exhausted")
            p = self._mp_free.popleft()[0]
            self._mp_free_queued.discard(p)
        self.mp_pos[p] = pos
        self.mp_valid[p] = True
        self.mp_desc[p] = desc
        self.mp_normal[p] = normal
        self.mp_min_dist[p] = min_dist
        self.mp_max_dist[p] = max_dist
        self.mp_first_kf[p] = first_kf
        self.mp_visible[p] = 1
        self.mp_found[p] = 1
        self.mp_obs_n[p] = 0
        return p

    def add_observation(self, k: int, f: int, p: int):
        if self.kf_mp_idx[k, f] == p:
            return
        if self.kf_mp_idx[k, f] >= 0:
            self.remove_observation(k, int(f))
        if self.mp_obs_n[p] >= MAX_OBS_PER_POINT:
            # Observation list full: evict the OLDEST observation through
            # remove_observation so unbinding and covisibility stay exactly
            # accounted. The reference's observations map is unbounded
            # (MapPoint.h mObservations); silently dropping the new entry
            # (pre-r5 behavior) left kf_mp_idx bound but the observation
            # invisible to BA, and made covisibility increments asymmetric
            # with later decrements — phantom covis weights corrupted
            # local-map selection on long runs with dense keyframe cadence.
            k_old = int(self.mp_obs_kf[p, 0])
            f_old = int(self.mp_obs_feat[p, 0])
            if k_old >= 0 and self.kf_mp_idx[k_old, f_old] == p:
                self.remove_observation(k_old, f_old)
            else:  # stale entry (should not happen): drop it without accounting
                self.mp_obs_kf[p, :-1] = self.mp_obs_kf[p, 1:]
                self.mp_obs_feat[p, :-1] = self.mp_obs_feat[p, 1:]
                self.mp_obs_n[p] -= 1
        self.kf_mp_idx[k, f] = p
        n = self.mp_obs_n[p]
        self.mp_obs_kf[p, n] = k
        self.mp_obs_feat[p, n] = f
        self.mp_obs_n[p] = n + 1
        # incremental covisibility: k now shares p with every other observer
        for kk in self.mp_obs_kf[p, : self.mp_obs_n[p]]:
            if kk >= 0 and kk != k:
                self.covis[k, kk] += 1
                self.covis[kk, k] += 1

    def remove_observation(self, k: int, f: int):
        p = self.kf_mp_idx[k, f]
        if p < 0:
            return
        self.kf_mp_idx[k, f] = -1
        n = self.mp_obs_n[p]
        obs_k = self.mp_obs_kf[p, :n]
        obs_f = self.mp_obs_feat[p, :n]
        keep = ~((obs_k == k) & (obs_f == f))
        m = int(keep.sum())
        self.mp_obs_kf[p, :m] = obs_k[keep]
        self.mp_obs_feat[p, :m] = obs_f[keep]
        self.mp_obs_kf[p, m:n] = -1
        self.mp_obs_feat[p, m:n] = -1
        self.mp_obs_n[p] = m
        for kk in self.mp_obs_kf[p, :m]:
            if kk >= 0 and kk != k:
                self.covis[k, kk] -= 1
                self.covis[kk, k] -= 1
        if m == 0:
            self.mp_valid[p] = False
            self._queue_free_slot(int(p))

    def bump_version(self):
        """Mark a landed map correction (caller holds the lock)."""
        self.version += 1

    def _queue_free_slot(self, p: int):
        if p not in self._mp_free_queued:
            self._mp_free_queued.add(p)
            self._mp_free.append((p, int(self.n_keyframes)))

    def remove_map_point(self, p: int):
        """MapPoint::SetBadFlag — erase from all observers. The slot enters
        the delayed-reuse queue (see add_map_point). Liveness is captured
        BEFORE dropping observations: removing the last observation marks
        mp_valid False itself, so testing validity afterwards would leak
        every slot whose point had >=1 observation (r4 ADVICE, medium)."""
        was_live = bool(self.mp_valid[p]) or int(self.mp_obs_n[p]) > 0
        n = self.mp_obs_n[p]
        for k, f in zip(self.mp_obs_kf[p, :n].copy(), self.mp_obs_feat[p, :n].copy()):
            if k >= 0:
                self.remove_observation(int(k), int(f))
        self.mp_valid[p] = False
        if was_live:
            self._queue_free_slot(int(p))

    def replace_map_point(self, old: int, new: int):
        """MapPoint::Replace (MapPoint.cc:180): rebind observations to `new`."""
        n = self.mp_obs_n[old]
        obs = list(zip(self.mp_obs_kf[old, :n].copy(), self.mp_obs_feat[old, :n].copy()))
        self.mp_found[new] += self.mp_found[old]
        self.mp_visible[new] += self.mp_visible[old]
        self.remove_map_point(old)
        for k, f in obs:
            if k >= 0 and self.kf_mp_idx[k, f] < 0:
                self.add_observation(int(k), int(f), new)

    # ------------------------------------------------------------ derived

    def update_point_stats(self, p: int, K_mat: np.ndarray, scale_factor: float, n_levels: int):
        """ComputeDistinctiveDescriptors + UpdateNormalAndDepth
        (MapPoint.cc:246, :335)."""
        n = self.mp_obs_n[p]
        if n == 0:
            return
        ks = self.mp_obs_kf[p, :n]
        fs = self.mp_obs_feat[p, :n]
        descs = self.kf_feat_desc[ks, fs]  # [n, 8]
        # median-Hamming distinctive descriptor (native kernel, numpy fallback)
        from orbslam2_nmi_tpu import native

        self.mp_desc[p] = descs[native.median_hamming_best(descs)]
        # normal: mean unit vector from observing camera centers
        Rcw = self.kf_Tcw[ks, :3, :3]
        tcw = self.kf_Tcw[ks, :3, 3]
        centers = -np.einsum("nij,ni->nj", Rcw, tcw)
        vecs = self.mp_pos[p][None] - centers
        norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
        self.mp_normal[p] = (vecs / np.maximum(norms, 1e-9)).mean(0)
        # scale-invariance distances from the reference observation
        ref_k, ref_f = int(ks[-1]), int(fs[-1])
        dist = float(np.linalg.norm(self.mp_pos[p] - centers[-1]))
        level = int(self.kf_feat_octave[ref_k, ref_f])
        self.mp_max_dist[p] = dist * (scale_factor**level)
        self.mp_min_dist[p] = self.mp_max_dist[p] / (scale_factor ** (n_levels - 1))

    def valid_point_indices(self) -> np.ndarray:
        return np.nonzero(self.mp_valid[: self.n_points])[0]

    def valid_keyframe_indices(self) -> np.ndarray:
        return np.nonzero(self.kf_valid[: self.n_keyframes])[0]
