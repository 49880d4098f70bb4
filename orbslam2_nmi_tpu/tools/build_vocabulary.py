"""Offline ORB vocabulary builder (the reference ships a pre-trained
~1M-word ORBvoc.txt instead — System.cc:87, Vocabulary/ORBvoc.txt.tar.gz).

Harvests ORB descriptors from an image directory (ZU-MAV / Newer College
layout) or from rendered synthetic frames, trains a hierarchical k-medians
tree, and writes either our .npz serialization or the DBoW2-interchange text
format. k=10 depth=6 reproduces the reference's vocabulary shape (10^6
words); defaults are sized for quick runs.

    python -m orbslam2_nmi_tpu.tools.build_vocabulary \
        --synthetic-frames 200 --k 10 --depth 4 --out voc.npz
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def harvest_synthetic(n_frames: int, width: int, height: int, n_features: int, seed: int):
    import jax.numpy as jnp

    from orbslam2_nmi_tpu.config import ORBConfig
    from orbslam2_nmi_tpu.io.synthetic import SyntheticWorld
    from orbslam2_nmi_tpu.ops.orb import extract_orb

    cfg = ORBConfig(n_features=n_features, n_levels=8)
    out = []
    # several worlds for descriptor diversity
    n_worlds = max(1, n_frames // 50)
    per_world = n_frames // n_worlds
    for w in range(n_worlds):
        world = SyntheticWorld.generate(seed=seed + w)
        for i in range(per_world):
            img = world.render_frame(i, per_world, width, height)
            feats = extract_orb(jnp.asarray(img), cfg)
            desc = np.asarray(feats.desc)[np.asarray(feats.valid)]
            out.append(desc)
            print(f"\rworld {w + 1}/{n_worlds} frame {i + 1}/{per_world}", end="", file=sys.stderr)
    print(file=sys.stderr)
    return np.concatenate(out)


def harvest_sequence(seq_dir: str, max_frames: int, n_features: int):
    import jax.numpy as jnp

    from orbslam2_nmi_tpu.config import ORBConfig
    from orbslam2_nmi_tpu.io import datasets
    from orbslam2_nmi_tpu.ops.orb import extract_orb

    cfg = ORBConfig(n_features=n_features, n_levels=8)
    try:
        seq = datasets.load_eth_sequence(seq_dir)
    except (FileNotFoundError, ValueError):
        seq = datasets.load_newer_college_sequence(seq_dir)
    step = max(1, len(seq) // max_frames)
    out = []
    idxs = list(range(0, len(seq), step))[:max_frames]
    for i, fi in enumerate(idxs):
        img = seq.load_gray(fi)
        feats = extract_orb(jnp.asarray(img), cfg)
        out.append(np.asarray(feats.desc)[np.asarray(feats.valid)])
        print(f"\rframe {i + 1}/{len(idxs)}", end="", file=sys.stderr)
    print(file=sys.stderr)
    return np.concatenate(out)


def ensure_circuit_vocabulary(k: int = 10, depth: int = 5, seed: int = 1,
                              n_frames: int = 260, path: str = None,
                              circuit: str = "standard") -> str:
    """Train (once, cached) a reference-scale vocabulary from the synthetic
    circuit's OWN imagery and return its path — the System.cc:87 flow: a big
    pre-trained vocabulary loaded before tracking starts, instead of the
    lazy few-thousand-word tree ensure_vocabulary falls back to. k=10/depth=5
    gives up to 100k words (the reference's ORBvoc is k=10/depth=6, 1M; its
    released blob is absent from this environment, .MISSING_LARGE_BLOBS)."""
    import os

    from orbslam2_nmi_tpu.tools import replay_bench

    d = os.environ.get("ORBSLAM2_NMI_TPU_SEQ_CACHE", "/tmp/orbslam2_nmi_tpu_seq")
    os.makedirs(d, exist_ok=True)
    tag = "w" if circuit == "wide" else ""
    path = path or os.path.join(
        d, f"voc_v{replay_bench.SEQ_VERSION}_{tag}k{k}d{depth}s{seed}_{n_frames}f.npz"
    )
    if os.path.exists(path):
        return path

    import jax.numpy as jnp

    from orbslam2_nmi_tpu.config import ORBConfig
    from orbslam2_nmi_tpu.ops.orb import extract_orb
    from orbslam2_nmi_tpu.slam.vocabulary import Vocabulary

    # harvest from every other frame of the cached 520-frame circuit
    world, frames = replay_bench.generate_sequence(
        520, 960, 540, seed=seed, circuit=circuit
    )
    cfg = ORBConfig(n_features=2000, n_levels=8)
    out = []
    for i in range(0, len(frames), max(1, len(frames) // n_frames)):
        feats = extract_orb(jnp.asarray(frames[i]), cfg)
        out.append(np.asarray(feats.desc)[np.asarray(feats.valid)])
    descs = np.concatenate(out)
    voc = Vocabulary.train(descs, k=k, depth=depth, seed=seed)
    tmp = path[: -len(".npz")] + f".tmp{os.getpid()}.npz"
    voc.save(tmp)
    os.replace(tmp, path)
    return path


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="train an ORB vocabulary")
    ap.add_argument("--sequence", help="image sequence dir")
    ap.add_argument("--synthetic-frames", type=int, default=0)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=540)
    ap.add_argument("--n-features", type=int, default=2000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True, help=".npz or .txt (DBoW2 format)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    t0 = time.time()
    if args.sequence:
        descs = harvest_sequence(args.sequence, 500, args.n_features)
    elif args.synthetic_frames:
        descs = harvest_synthetic(
            args.synthetic_frames, args.width, args.height, args.n_features, args.seed
        )
    else:
        ap.error("one of --sequence / --synthetic-frames is required")
    print(f"harvested {len(descs)} descriptors in {time.time() - t0:.1f}s", file=sys.stderr)

    from orbslam2_nmi_tpu.slam.vocabulary import Vocabulary

    t0 = time.time()
    voc = Vocabulary.train(descs, k=args.k, depth=args.depth, seed=args.seed)
    print(
        f"trained {voc.n_words}-word vocabulary (k={args.k}, depth={args.depth}) "
        f"in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    if args.out.endswith(".txt"):
        voc.save_dbow2_text(args.out)
    else:
        voc.save(args.out)
    print(f"saved {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
