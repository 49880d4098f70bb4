"""Keyframe database for loop detection and relocalization candidates.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc) — there an
inverted file (word -> keyframe list) feeds share-word counting; here BoW
vectors are dense rows of a [K, V] matrix and every query is one batched
scoring pass on device. Selection logic preserved:

  * DetectLoopCandidates (KeyFrameDatabase.cc:79-200): exclude covisible
    neighbors, gate by 0.8 * max-common-words (:123), require score >= the
    min covisible-neighbor score, accumulate scores over each candidate's
    top-10 covisibility group (:151-176), retain >= 0.75 * best accumulated
    score (:179).
  * DetectRelocalizationCandidates (:202): same flow, no covisibility
    exclusion, no minScore gate.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from orbslam2_nmi_tpu.slam.map_store import MapStore
from orbslam2_nmi_tpu.slam.vocabulary import Vocabulary, bow_l1_score


class KeyFrameDatabase:
    def __init__(self, vocab: Vocabulary, max_keyframes: int):
        self.vocab = vocab
        self.bows = np.zeros((max_keyframes, vocab.n_words), np.float32)
        self.words = {}  # kf -> set of word ids (for common-word counts)
        self.active = np.zeros(max_keyframes, bool)

    def add(self, kf: int, desc: np.ndarray, valid: np.ndarray):
        w = self.vocab.quantize(desc, valid)
        self.words[kf] = set(int(x) for x in np.unique(w[w >= 0]))
        self.bows[kf] = self.vocab.bow_vector(desc, valid)
        self.active[kf] = True

    def erase(self, kf: int):
        self.active[kf] = False
        self.words.pop(kf, None)

    def score_all(self, bow: np.ndarray) -> np.ndarray:
        """L1 similarity of `bow` against every active KF (batched matmul-ish)."""
        scores = np.asarray(bow_l1_score(jnp.asarray(bow), jnp.asarray(self.bows)))
        return np.where(self.active, scores, -1.0)

    def _common_words(self, query_words: set, kfs: np.ndarray) -> np.ndarray:
        return np.array([len(query_words & self.words.get(int(k), set())) for k in kfs])

    def detect_loop_candidates(
        self, map_store: MapStore, kf: int, min_score: float
    ) -> list[int]:
        query_words = self.words.get(kf)
        if not query_words:
            return []
        connected = set(int(x) for x in map_store.covisible_keyframes(kf, min_weight=1))
        cand = [
            k
            for k in self.words
            if k != kf and self.active[k] and k not in connected and (query_words & self.words[k])
        ]
        if not cand:
            return []
        cand = np.array(cand)
        common = self._common_words(query_words, cand)
        max_common = common.max()
        th = 0.8 * max_common  # KeyFrameDatabase.cc:123
        scores = self.score_all(self.bows[kf])
        keep = cand[(common > th)]
        keep = [int(k) for k in keep if scores[k] >= min_score]
        if not keep:
            return []
        # accumulate over covisibility groups (KeyFrameDatabase.cc:151-176)
        acc_scores = {}
        best_child = {}
        for k in keep:
            group = [k] + [int(x) for x in map_store.best_covisible(k, 10)]
            in_keep = [g for g in group if g in keep or g == k]
            acc = sum(scores[g] for g in in_keep)
            best = max(in_keep, key=lambda g: scores[g])
            acc_scores[k] = acc
            best_child[k] = best
        best_acc = max(acc_scores.values())
        retain = 0.75 * best_acc  # KeyFrameDatabase.cc:179
        out = sorted({best_child[k] for k, a in acc_scores.items() if a > retain})
        return out

    def detect_relocalization_candidates(
        self, map_store: MapStore, desc: np.ndarray, valid: np.ndarray
    ) -> list[int]:
        w = self.vocab.quantize(desc, valid)
        query_words = set(int(x) for x in np.unique(w[w >= 0]))
        if not query_words:
            return []
        cand = [k for k in self.words if self.active[k] and (query_words & self.words[k])]
        if not cand:
            return []
        cand = np.array(cand)
        common = self._common_words(query_words, cand)
        th = 0.8 * common.max()
        bow = self.vocab.bow_vector(desc, valid)
        scores = self.score_all(bow)
        keep = [int(k) for k in cand[common > th]]
        if not keep:
            return []
        acc_scores = {}
        best_child = {}
        for k in keep:
            group = [k] + [int(x) for x in map_store.best_covisible(k, 10)]
            in_keep = [g for g in group if g in keep or g == k]
            acc = sum(scores[g] for g in in_keep)
            best = max(in_keep, key=lambda g: scores[g])
            acc_scores[k] = acc
            best_child[k] = best
        best_acc = max(acc_scores.values())
        retain = 0.75 * best_acc
        return sorted({best_child[k] for k, a in acc_scores.items() if a > retain})
