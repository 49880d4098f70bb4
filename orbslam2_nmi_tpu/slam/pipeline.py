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

Synchronous mode (no pipeline) keeps byte-identical behavior to before —
the lock is reentrant and uncontended.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Optional


class MappingPipeline:
    def __init__(self, system):
        self.system = system
        self.q: queue.Queue = queue.Queue()
        self._pending = 0
        self._pending_lock = threading.Lock()
        self._drained = threading.Event()
        self._drained.set()
        self._errors: list = []
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

    def abort_requested(self) -> bool:
        """True when a newer keyframe is waiting (mbAbortBA)."""
        return not self.q.empty()

    # ------------------------------------------------------------- consumer

    def _run(self):
        while True:
            k = self.q.get()
            if k is None:
                break
            try:
                sysm = self.system
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

    # ------------------------------------------------------------- control

    def flush(self, timeout: Optional[float] = None) -> bool:
        """Block until every queued keyframe has been processed (the
        reference's Shutdown waits for LocalMapping::isFinished)."""
        return self._drained.wait(timeout)

    def errors(self) -> list:
        return list(self._errors)

    def shutdown(self, timeout: float = 60.0):
        self.flush(timeout)
        self.q.put(None)
        self.thread.join(timeout)
