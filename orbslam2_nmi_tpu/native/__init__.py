"""Native host-side kernels, compiled on first import with a numpy fallback.

g++ builds mapcore.cpp into a cached shared object next to the source; if the
toolchain is unavailable the pure-numpy fallbacks keep everything working
(slower). See mapcore.cpp for why these loops are native.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "mapcore.cpp")
_SO = os.path.join(_DIR, f"mapcore{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")

_mapcore = None


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _mapcore
    if _mapcore is not None:
        return _mapcore
    needs_build = not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    if needs_build and not _build():
        return None
    try:
        spec = importlib.util.spec_from_file_location("mapcore", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mapcore = mod
        return mod
    except Exception:
        return None


def median_hamming_best(descs: np.ndarray) -> int:
    """Index of the descriptor with minimal median Hamming distance to the
    rest (MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc:246)."""
    descs = np.ascontiguousarray(descs, dtype=np.uint32)
    if len(descs) == 1:
        return 0
    mod = _load()
    if mod is not None:
        return int(mod.median_hamming_best(descs))
    # numpy fallback
    x = descs[:, None, :] ^ descs[None, :, :]
    dists = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
    return int(np.argmin(np.median(dists, axis=1)))


def hamming_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint32)
    b = np.ascontiguousarray(b, dtype=np.uint32)
    mod = _load()
    if mod is not None:
        raw = mod.hamming_matrix(a, b)
        return np.frombuffer(raw, dtype=np.int32).reshape(len(a), len(b))
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1).astype(np.int32)
