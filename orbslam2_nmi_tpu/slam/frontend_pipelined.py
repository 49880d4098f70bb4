"""Lag-1 pipelined front-end around the fused device tracking step.

Drives slam/fused_track.make_fused_step: frame i's device step is dispatched
BEFORE frame i-1's results are fetched, so the device computes while the host
does map bookkeeping — one packed fetch per frame instead of the classic
path's per-stage synchronizations. Initialization, relocalization, keyframe
creation, NMI, local mapping and loop closing all stay on the classic Tracker
(they are rare, per-keyframe events); the fused step only replaces the
per-frame hot path (motion-model + local-map tracking).

Failure handling: when a processed frame misses the reference's gates
(20 motion matches / 10 local-map inliers, Tracking.cc:1110, :1201), all
in-flight fused frames are discarded and those frames are re-tracked through
the classic path (full fallback chain: wider window, ref-KF track, BoW+PnP
relocalization) — then the fused chain reseeds.

Staleness contract (all one-dispatch bounded, in the spirit of the
reference's own asynchronous mapping): the local-map candidate set and
keyframe decision for frame i derive from frame i-1's processed results, and
map corrections (BA, NMI, loop) reach the device chain at the next reseed.
"""

from __future__ import annotations

import time
from collections import deque

import jax.numpy as jnp
import numpy as np

from orbslam2_nmi_tpu.slam import fused_track
from orbslam2_nmi_tpu.slam.frame import FrameData
from orbslam2_nmi_tpu.slam.tracking import TrackingState, TrackResult


class PipelinedFrontend:
    def __init__(self, system, n_cand: int = 2048, lag: int = 1):
        self.sys = system
        self.tracker = system.tracker
        self.cfg = system.cfg
        self.n_cand = n_cand
        self.n_feat = None  # learned from the first classic frame
        self.lag = lag
        self.step = fused_track.make_fused_step(system.cfg, n_cand)
        self._carry = None
        self._carry_src = -1  # global frame id whose features the carry holds
        self._mp_hist: dict = {}  # frame id -> post-processing mp_idx array
        self._reseed = False
        self._seen_version = -1  # map.version the carry was last anchored to
        # optional diagnostic callback: hook(frame_id, FrameData, UnpackedStep)
        # invoked after host processing of every fused frame (map lock NOT
        # held) — used by tools/fused_probe.py to audit bindings against
        # ground truth without touching the hot path
        self.debug_hook = None
        # frame id -> wall-clock completion time (time.perf_counter). A
        # re-tracked frame overwrites its entry; deltas between consecutive
        # completions are the REAL per-frame latencies — the frames where an
        # NMI anchor lands or a keyframe/BA stalls show up in the tail
        # (the reference times every frame, mono_ETH.cc:107-151)
        self.completion_walls: dict = {}

    # ------------------------------------------------------------ main drive

    def run(self, frames, timestamps, start_id: int = 0) -> list:
        """Track a sequence chunk (frame ids start_id..start_id+len-1);
        returns a TrackResult per frame. Chunks may be fed incrementally —
        tracker and device-carry state persist across calls."""
        self._start = start_id
        tr = self.tracker
        n = len(frames)
        results: list = [None] * n
        inflight: deque = deque()  # (idx, packed_handle, ctx)
        i = 0
        while i < n or inflight:
            # NMI backpressure, same rule as Tracker.process_frame: after >=2
            # NMI-due keyframes skipped because the async worker was busy,
            # wait the in-flight sweep out before tracking on — without this
            # the fused loop outruns the sweep and anchors land too sparsely
            # (the exact cadence failure the counter exists to bound). MUST
            # run outside the map lock: the worker's apply phase takes it.
            worker = getattr(self.sys, "nmi_worker", None)
            if worker is not None and tr.nmi_due_skips >= 2 and worker.busy():
                worker.flush(timeout=600.0)
                tr.nmi_due_skips = 0
            fused_ok = (
                tr.state == TrackingState.OK
                and self._carry is not None
                and i < n
            )
            if fused_ok:
                ctx = self._dispatch(frames[i], i)
                inflight.append(ctx)
                i += 1
                if len(inflight) > self.lag:
                    status = self._process(inflight.popleft(), frames, timestamps, results)
                    if status is not True:
                        # rewind to the first unprocessed frame: on gate
                        # failure ("fail") the carry is dropped so those
                        # frames go through the classic fallback chain; on a
                        # map mutation ("reseed", keyframe/BA/NMI) the
                        # re-anchored carry is kept and the in-flight frames
                        # are simply re-dispatched against the fresh map —
                        # tracking a frame against a pre-keyframe carry and
                        # then promoting it to a keyframe is how stale poses
                        # get baked into the map.
                        first_bad = results.index(None) if None in results else n
                        inflight.clear()
                        if status == "fail":
                            self._carry = None
                        i = first_bad
                continue

            # drain any leftover fused results first
            if inflight:
                status = self._process(inflight.popleft(), frames, timestamps, results)
                if status is not True:
                    # every frame may already be processed when the LAST
                    # drained frame reseeds — nothing left to re-dispatch
                    first_bad = results.index(None) if None in results else n
                    inflight.clear()
                    if status == "fail":
                        self._carry = None
                    i = first_bad
                continue

            if i >= n:
                break
            # classic path (init / lost / recovery / first frame after reseed)
            res = tr.process_frame(start_id + i, float(timestamps[i]), np.asarray(frames[i]))
            results[i] = res
            self.completion_walls[start_id + i] = time.perf_counter()
            i += 1
            if (
                res.state == TrackingState.OK
                and tr.last_frame is not None
                and tr.last_frame.Tcw is not None
            ):
                if self.n_feat is None:
                    self.n_feat = len(tr.last_frame.xy)
                with self.sys.map.lock:
                    self._carry = fused_track.carry_from_frame(
                        tr.last_frame, self.sys.map, tr.velocity
                    )
                    self._seen_version = self.sys.map.version
                self._carry_src = start_id + i - 1
                self._mp_hist[start_id + i - 1] = tr.last_frame.mp_idx.copy()
        return results

    # ------------------------------------------------------------- internals

    def _dispatch(self, gray: np.ndarray, idx: int):
        with self.sys.map.lock:
            cand_ids, cand = self._local_candidates()
        # the carry's feature rows belong to frame `self._carry_src`; its
        # landmark-id table is resolved at PROCESSING time (that frame has
        # been processed by then — lag-1 ordering guarantee)
        src = self._carry_src
        out = self.step(jnp.asarray(gray), self._carry, *cand)
        self._carry = out.carry
        self._carry_src = self._start + idx
        return (idx, out.packed, src, cand_ids)

    def _local_candidates(self):
        """Local-map candidate arrays from the most recently PROCESSED frame
        (UpdateLocalKeyFrames/Points, Tracking.cc:1461-1486, one frame stale).

        When the local set exceeds the device capacity C, candidates are kept
        in LOCAL-KEYFRAME order (reference keyframe + best covisibles first)
        — a plain id truncation keeps the OLDEST map points, which on large
        maps are behind the camera, and the fused step starves of in-view
        candidates exactly when the map is biggest."""
        tr = self.tracker
        m = self.sys.map
        kfs = tr._local_keyframes(tr.last_frame)
        C = self.n_cand
        if len(kfs) == 0:
            ids = np.zeros(0, np.int64)
        else:
            order = [tr.ref_kf] + [int(k) for k in kfs if int(k) != tr.ref_kf]
            picked = np.full(m.mp_valid.shape[0], False)
            out = []
            for k in order:
                ps = m.kf_mp_idx[k]
                ps = ps[ps >= 0]
                ps = ps[m.mp_valid[ps] & ~picked[ps]]
                if len(ps):
                    picked[ps] = True
                    out.append(ps)
            ids = (
                np.concatenate(out).astype(np.int64)
                if out else np.zeros(0, np.int64)
            )
            if len(ids) > C and tr.last_frame.Tcw is not None:
                # Frustum pre-filter BEFORE truncating to device capacity:
                # on large local maps a pure covisibility-order truncation
                # keeps whole keyframes' point sets regardless of visibility,
                # and the fused step starves of in-view candidates exactly
                # when the map is biggest (r4 far-arc inlier collapse, cand
                # pegged at capacity). Project at the last processed pose
                # (one frame stale, same contract as the candidate set
                # itself) with a 64 px margin.
                T = tr.last_frame.Tcw
                cam = self.cfg.camera
                pc = m.mp_pos[ids] @ T[:3, :3].T + T[:3, 3]
                z = np.maximum(pc[:, 2], 1e-9)
                u = cam.K[0, 0] * pc[:, 0] / z + cam.K[0, 2]
                v = cam.K[1, 1] * pc[:, 1] / z + cam.K[1, 2]
                mgn = 64.0
                vis = (
                    (pc[:, 2] > 0)
                    & (u >= -mgn) & (u < cam.width + mgn)
                    & (v >= -mgn) & (v < cam.height + mgn)
                )
                ids = ids[vis]
            ids = ids[:C]
        k = len(ids)
        pts = np.zeros((C, 3), np.float32)
        desc = np.zeros((C, 8), np.uint32)
        min_d = np.ones(C, np.float32)
        max_d = np.ones(C, np.float32)
        normal = np.zeros((C, 3), np.float32)
        valid = np.zeros(C, bool)
        if k:
            pts[:k] = m.mp_pos[ids]
            desc[:k] = m.mp_desc[ids]
            min_d[:k] = m.mp_min_dist[ids]
            max_d[:k] = m.mp_max_dist[ids]
            normal[:k] = m.mp_normal[ids]
            valid[:k] = True
        return ids, (
            jnp.asarray(pts), jnp.asarray(desc), jnp.asarray(min_d),
            jnp.asarray(max_d), jnp.asarray(normal), jnp.asarray(valid),
        )

    def _process(self, item, frames, timestamps, results):
        """Fetch + host-process one fused frame. Returns True on success,
        "fail" when the frame misses the tracking gates (caller rewinds to
        the classic path), or "reseed" when this frame mutated the map
        (caller re-dispatches in-flight frames against the fresh carry)."""
        idx, packed, prev_src, cand_ids = item
        tr = self.tracker
        u = fused_track.unpack_step(np.asarray(packed), self.n_feat, self.n_cand)

        if u.n_matches1 < 20 or u.n_inliers < 10:
            return "fail"
        prev_mp_idx = self._mp_hist[prev_src]

        n = self.n_feat
        mp_idx = np.full(n, -1, np.int32)
        has_prev = u.src_prev >= 0
        mp_idx[has_prev] = prev_mp_idx[u.src_prev[has_prev]]
        has_cand = (u.src_cand >= 0) & (mp_idx < 0)
        if len(cand_ids):
            mp_idx[has_cand] = cand_ids[u.src_cand[has_cand]]
        else:
            has_cand[:] = False
        # a landmark bound twice (motion + candidate duplicate): keep first
        bound_rows = np.nonzero(mp_idx >= 0)[0]
        seen: set = set()
        for r in bound_rows:
            p = int(mp_idx[r])
            if p in seen:
                mp_idx[r] = -1
            else:
                seen.add(p)
        has_cand &= mp_idx >= 0  # dedup above may have dropped a binding
        bound = mp_idx >= 0
        outlier = bound & ~u.inlier

        frame = FrameData(
            frame_id=self._start + idx, timestamp=float(timestamps[idx]), Tcw=u.Tcw,
            xy=u.xy, xy_raw=u.xy, octave=u.octave, angle=u.angle,
            desc=u.desc, valid=u.valid, mp_idx=mp_idx, outlier=outlier,
        )

        with self.sys.map.lock:
            m = self.sys.map
            if m.version != self._seen_version:
                # An async map correction (BA write-back, NMI anchor, loop,
                # culling) landed since this frame was dispatched: the device
                # chain's pose and landmark positions predate it. Rebase the
                # chain pose through the PREVIOUS processed frame — its Tcr
                # was recorded before the landing, so UpdateLastFrame
                # semantics (Tracking.cc:1020) recover its corrected pose and
                # the delta transplants this frame onto the corrected map —
                # then reseed the carry below. Without this, the stale chain
                # fights the corrected candidate set in pose GN until the
                # next keyframe (the r4 far-arc pose jumps: corrections land
                # ~20 frames late through the tunnel-latency mapper, and
                # every landing kicked the chain 0.3 m sideways).
                prev = tr.last_frame
                if prev is not None and prev.Tcw is not None and prev.Tcr is not None:
                    T_old = prev.Tcw.copy()
                    tr._update_last_frame(prev)
                    delta = prev.Tcw @ np.linalg.inv(T_old)
                    frame.Tcw = (delta @ frame.Tcw).astype(np.float32)
                self._seen_version = m.version
                self._reseed = True
            # visibility / found statistics (Tracking.cc:1412, :1438)
            if len(cand_ids):
                vis = cand_ids[u.cand_in_view[: len(cand_ids)]]
                m.mp_visible[vis] += 1
                m.mp_found[mp_idx[has_cand & u.inlier]] += 1
            still = m.mp_valid[np.maximum(mp_idx, 0)] & bound
            frame.mp_idx = np.where(still, mp_idx, -1)

            tr.velocity = u.velocity
            # refresh ref_kf from the new bindings (UpdateLocalKeyFrames)
            tr._local_keyframes(frame)

            is_kf = False
            nmi_reloc = False
            if tr._need_new_keyframe(frame, u.n_inliers):
                tr._gray = np.asarray(frames[idx])
                nmi_due = (
                    tr.nmi is not None
                    and tr.kfs_since_last_nmi + 1 == self.cfg.nmi.reloc_frequency
                )
                worker = getattr(self.sys, "nmi_worker", None)
                if nmi_due and worker is None:
                    nmi_reloc = tr._run_nmi(frame, initializing=False)
                tr._create_keyframe(frame)
                is_kf = True
                attempted = True
                if nmi_due and worker is not None:
                    attempted = tr._submit_async_nmi(frame)
                if nmi_due and not attempted:
                    # busy: counter stays due so the next keyframe retries, and
                    # the skip feeds the >=2-skip backpressure in run()
                    tr.nmi_due_skips += 1
                else:
                    if nmi_due:
                        tr.nmi_due_skips = 0
                    tr.kfs_since_last_nmi += 1
                    if tr.kfs_since_last_nmi >= self.cfg.nmi.reloc_frequency:
                        tr.kfs_since_last_nmi = 0
                self._reseed = True  # map mutated: re-anchor the device chain

            frame.mp_idx[frame.outlier] = -1
            frame.outlier[:] = False
            tr.record_frame(self._start + idx, float(timestamps[idx]), frame)
            self._mp_hist[self._start + idx] = frame.mp_idx.copy()
            # only ids >= the carry source are ever looked up again — prune
            # so memory stays bounded on streaming sequences
            for old in [k for k in self._mp_hist if k < self._start + idx - 8]:
                del self._mp_hist[old]

            reseed = self._reseed
            if reseed:
                tr._update_last_frame(frame)  # adopt BA/NMI-corrected anchor
                self._carry = fused_track.carry_from_frame(frame, m, tr.velocity)
                self._carry_src = self._start + idx
                self._seen_version = m.version
                self._reseed = False

        if (self._start + idx) % 10 == 0:
            self.sys.log(
                f"frame {self._start + idx}: fused n1={u.n_matches1} "
                f"inl={u.n_inliers} cand={int(len(cand_ids))}"
            )
        if self.debug_hook is not None:
            self.debug_hook(self._start + idx, frame, u)
        results[idx] = TrackResult(
            TrackingState.OK, frame.Tcw, u.n_inliers, is_kf, nmi_reloc
        )
        self.completion_walls[self._start + idx] = time.perf_counter()
        return "reseed" if reseed else True
