"""Map checkpoint / resume.

The reference leaves SaveMap/LoadMap as an unimplemented TODO
(include/System.h:128-130); its pt2/pt3/pt4 configs "resume" by
re-initializing from hand-given NMI poses (SURVEY.md §5). With an SoA map
this is a single compressed npz of the array state + a small tracker header —
true checkpoint/resume for long sequences.
"""

from __future__ import annotations

import numpy as np

from orbslam2_nmi_tpu.slam.map_store import MapStore

_MAP_FIELDS = [
    "kf_Tcw", "kf_valid", "kf_frame_id", "kf_timestamp", "kf_nmi_reloc",
    "kf_nmi_failed", "kf_parent", "kf_Tcp", "kf_feat_xy", "kf_feat_octave",
    "kf_feat_angle", "kf_feat_desc", "kf_feat_valid", "kf_mp_idx",
    "mp_pos", "mp_valid", "mp_desc", "mp_normal", "mp_min_dist", "mp_max_dist",
    "mp_first_kf", "mp_visible", "mp_found", "mp_obs_kf", "mp_obs_feat",
    "mp_obs_n", "covis",
]


def save_map(path: str, map_store: MapStore, tracker_state: dict | None = None):
    """Write the whole map (+ optional tracker header) to one .npz."""
    payload = {f: getattr(map_store, f) for f in _MAP_FIELDS}
    payload["n_keyframes"] = np.int64(map_store.n_keyframes)
    payload["n_points"] = np.int64(map_store.n_points)
    if tracker_state:
        for k, v in tracker_state.items():
            payload[f"tracker__{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_map(path: str, map_store: MapStore) -> dict:
    """Restore a checkpoint into an (appropriately sized) MapStore.

    Returns the tracker header dict (possibly empty)."""
    z = np.load(path, allow_pickle=False)
    for f in _MAP_FIELDS:
        arr = z[f]
        target = getattr(map_store, f)
        if target.shape != arr.shape:
            raise ValueError(
                f"checkpoint field {f} shape {arr.shape} does not match "
                f"configured capacity {target.shape}"
            )
        target[...] = arr
    map_store.n_keyframes = int(z["n_keyframes"])
    map_store.n_points = int(z["n_points"])
    tracker = {}
    for k in z.files:
        if k.startswith("tracker__"):
            tracker[k[len("tracker__"):]] = z[k]
    return tracker
