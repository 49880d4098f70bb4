"""Asynchronous mapping pipeline — the reference's background threads.

TPU-native equivalent of the LocalMapping + LoopClosing threads the reference
spawns at startup (System.cc:116-120) with their queue + mutex + flag protocol
(LocalMapping::InsertKeyFrame producer/consumer, LocalMapping.h:58-71;
LoopClosing::InsertKeyFrame LoopClosing.cc:98). One worker thread drains the
keyframe queue and runs local mapping then loop closing per keyframe — the
effect the reference gets from two threads (mapping hands each processed KF to
loop closing) with a single lock-ordering-safe consumer.

Concurrency contract (mirrors Map::mMutexMapUpdate, held across the whole
Track() in the reference, Tracking.cc:377):
  * the tracker holds `map.lock` for each frame's processing;
  * the worker holds it around map mutations, but NOT during the local-BA
    device solve — so tracking never blocks on BA (the reference's core
    scheduling property);
  * a newer queued keyframe aborts the pending BA (mbAbortBA semantics,
    LocalMapping.cc): the BA simply reruns at the newest keyframe.

Global BA after a loop closure runs on its OWN transient thread (the
reference's `new thread(&LoopClosing::RunGlobalBundleAdjustment, ...)`,
LoopClosing.cc:587) with the mbStopGBA/mnFullBAIdx abort protocol: a newer
loop bumps the generation counter and the stale solve's result is discarded;
an accepted result propagates to keyframes/points created during the solve
through the spanning tree (local_mapping.global_ba_apply). The keyframe
worker and the tracker never stall on the solve.

Synchronous mode (no pipeline) keeps byte-identical behavior to before —
the lock is reentrant and uncontended.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Optional

from orbslam2_nmi_tpu.solvers import local_ba


class MappingPipeline:
    def __init__(self, system):
        self.system = system
        self.q: queue.Queue = queue.Queue()
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._drained = threading.Event()
        self._drained.set()
        self._errors: list = []
        self._interrupt = False
        self._gba_lock = threading.Lock()
        self._gba_idx = 0  # mnFullBAIdx
        self._gba_thread: Optional[threading.Thread] = None
        if system.loop_closer is not None:
            system.loop_closer.gba_launcher = self.launch_global_ba
        self.thread = threading.Thread(
            target=self._run, daemon=True, name="local-mapping"
        )
        self.thread.start()

    # ------------------------------------------------------------- producer

    def insert_keyframe(self, k: int):
        """LocalMapping::InsertKeyFrame (LocalMapping.cc:117) + InterruptBA."""
        with self._pending_lock:
            self._pending += 1
            self._drained.clear()
        self.q.put(int(k))

    def insert_ba(self, k: int, epoch: int):
        """Queue a standalone local BA around keyframe k (the async NMI
        worker's post-anchor pull-in). All local-BA device solves run on THIS
        worker — two concurrent solvers whose write-backs interleave would
        lose the later map state to results from a stale snapshot."""
        with self._pending_lock:
            self._pending += 1
            self._drained.clear()
        self.q.put(("ba", int(k), int(epoch)))

    def abort_requested(self) -> bool:
        """True when a newer keyframe is waiting or the tracker asked for an
        interrupt (mbAbortBA)."""
        return not self.q.empty() or self._interrupt

    def idle(self) -> bool:
        """LocalMapping::AcceptKeyFrames equivalent: no keyframe queued or
        being processed (the tracker's c1b / insert-gate reads this,
        Tracking.cc:1259-1302)."""
        return self._pending == 0

    def queue_empty(self) -> bool:
        """No keyframe WAITING (one may be mid-processing) — the tracker's
        relaxed insert gate (KeyframesInQueue()==0 analogue)."""
        return self.q.empty()

    def interrupt_ba(self):
        """LocalMapping::InterruptBA (Tracking.cc:1293): ask the in-flight
        local BA to stop early so the mapper can accept keyframes sooner.
        Cleared when the worker picks up its next keyframe."""
        self._interrupt = True

    # ------------------------------------------------------------- consumer

    def _run(self):
        while True:
            k = self.q.get()
            if k is None:
                break
            try:
                self._interrupt = False
                sysm = self.system
                if isinstance(k, tuple):  # ("ba", k, epoch) — post-anchor BA
                    _, kk, epoch = k
                    sysm.local_mapper.local_bundle_adjust(kk, epoch=epoch)
                    continue
                sysm.local_mapper.process_keyframe(k, abort_fn=self.abort_requested)
                with sysm.map.lock:
                    if sysm.loop_closer is None:
                        sysm.ensure_vocabulary(
                            sysm.map.kf_feat_desc[k], sysm.map.kf_feat_valid[k]
                        )
                if sysm.loop_closer is not None:
                    # loop detection + Sim3 + correction (LoopClosing::Run)
                    with sysm.map.lock:
                        sysm.loop_closer.process_keyframe(k)
            except Exception:  # pragma: no cover - surfaced via errors()
                self._errors.append(traceback.format_exc())
            finally:
                with self._pending_lock:
                    self._pending -= 1
                    if self._pending == 0:
                        self._drained.set()

    # ----------------------------------------------------------- global BA

    def launch_global_ba(self, iters: int = 10):
        """RunGlobalBundleAdjustment on its own thread (LoopClosing.cc:587).
        A newer launch aborts the in-flight one (mbStopGBA/mnFullBAIdx:
        the stale result is discarded at apply time)."""
        with self._gba_lock:
            self._gba_idx += 1
            idx = self._gba_idx

        def run():
            try:
                lm = self.system.local_mapper
                with self.system.map.lock:
                    epoch = self.system.map.epoch
                    snap = lm.global_ba_snapshot()
                if snap is None:
                    return
                prob, kfs, pts, fixed = snap
                res = local_ba.bundle_adjust(
                    prob, iters1=iters // 2, iters2=iters - iters // 2
                )
                with self._gba_lock:
                    if idx != self._gba_idx:
                        return  # aborted by a newer loop closure
                with self.system.map.lock:
                    if self.system.map.epoch != epoch:
                        return  # System::Reset wiped the map mid-solve
                    lm.global_ba_apply(res, kfs, pts, fixed)
            except Exception:  # pragma: no cover - surfaced via errors()
                self._errors.append(traceback.format_exc())

        t = threading.Thread(target=run, daemon=True, name="global-ba")
        self._gba_thread = t
        t.start()

    # ------------------------------------------------------------- control

    def flush(self, timeout: Optional[float] = None) -> bool:
        """Block until every queued keyframe has been processed (the
        reference's Shutdown waits for LocalMapping::isFinished) and any
        in-flight global BA has landed."""
        ok = self._drained.wait(timeout)
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout)
        return ok

    def errors(self) -> list:
        return list(self._errors)

    def shutdown(self, timeout: float = 60.0):
        self.flush(timeout)
        self.q.put(None)
        self.thread.join(timeout)
