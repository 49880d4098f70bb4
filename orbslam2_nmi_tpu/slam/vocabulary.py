"""Binary ORB vocabulary: hierarchical k-medians tree as dense arrays.

TPU-native replacement for DBoW2's TemplatedVocabulary<FORB>
(reference: include/ORBVocabulary.h:31, prebuilt DBoW2.lib + the 145 MB
ORBvoc.txt the reference ships as a release blob). Differences by design:

  * The tree lives in flat arrays (node descriptors [n_nodes, 8] uint32,
    children table [n_nodes, k]); descriptor->word lookup is a vectorized
    L-step descent over all N descriptors at once (XOR + popcount argmin per
    level) — no pointer chasing.
  * BoW vectors are DENSE [n_words] float32 (tf-idf, L1-normalized). The
    classic inverted file exists to make sparse CPU lookups fast; on TPU the
    fast path is a dense [K, V] @ [V] matmul against every keyframe at once
    (see keyframe_database.py), so density IS the index.
  * The vocabulary is trained on the fly from harvested descriptors
    (hierarchical k-medians under Hamming distance, majority-bit centers)
    and serialized as .npz — the reference's pretrained vocabulary is not
    redistributable here, and scoring only needs a consistent partition of
    descriptor space.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def popcount_rows(x: np.ndarray) -> np.ndarray:
    """Bit count per row of a uint32 array [..., 8]."""
    return _POPCNT8[x.view(np.uint8)].sum(-1, dtype=np.int32)


def hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[A, 8] x [B, 8] uint32 -> [A, B] int Hamming distances (numpy).

    Byte-LUT popcount (8x less transient memory than unpackbits), chunked
    over A so vocabulary training on 10^5+ descriptors stays in cache."""
    A = len(a)
    out = np.empty((A, len(b)), np.int32)
    a8 = a.view(np.uint8)
    b8 = b.view(np.uint8)
    step = max(1, (1 << 24) // max(len(b), 1))
    for i in range(0, A, step):
        x = a8[i : i + step, None, :] ^ b8[None, :, :]
        out[i : i + step] = _POPCNT8[x].sum(-1, dtype=np.int32)
    return out


def majority_center(descs: np.ndarray) -> np.ndarray:
    """Bitwise-majority centroid of binary descriptors [N, 8] uint32."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)  # [N, 256]
    maj = (bits.mean(0) >= 0.5).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


@dataclass
class Vocabulary:
    k: int  # branching factor
    depth: int  # levels below root
    node_desc: np.ndarray  # [n_nodes, 8] uint32
    children: np.ndarray  # [n_nodes, k] int32 (-1 = none)
    leaf_id: np.ndarray  # [n_nodes] int32 word id for leaves, -1 internal
    word_weight: np.ndarray  # [n_words] float32 idf weights

    @property
    def n_words(self) -> int:
        return len(self.word_weight)

    # ------------------------------------------------------------- training

    @staticmethod
    def train(descriptors: np.ndarray, k: int = 8, depth: int = 4, seed: int = 0,
              kmeans_iters: int = 6) -> "Vocabulary":
        """Hierarchical k-medians (Hamming) like DBoW2's create()."""
        rng = np.random.default_rng(seed)
        descriptors = np.unique(descriptors, axis=0)
        node_desc = [np.zeros(8, np.uint32)]
        children: list[list[int]] = [[]]
        leaf_of_node: list[int] = [-1]
        word_counts: list[int] = []

        def split(node: int, descs: np.ndarray, level: int):
            if level == depth or len(descs) <= k:
                leaf_of_node[node] = len(word_counts)
                word_counts.append(len(descs))
                return
            # k-medians init: random distinct seeds
            sel = rng.choice(len(descs), size=min(k, len(descs)), replace=False)
            centers = descs[sel]
            for _ in range(kmeans_iters):
                d = hamming_np(descs, centers)
                assign = d.argmin(1)
                new_centers = []
                for c in range(len(centers)):
                    member = descs[assign == c]
                    new_centers.append(majority_center(member) if len(member) else centers[c])
                centers = np.stack(new_centers)
            d = hamming_np(descs, centers)
            assign = d.argmin(1)
            for c in range(len(centers)):
                member = descs[assign == c]
                if len(member) == 0:
                    continue
                child = len(node_desc)
                node_desc.append(centers[c])
                children.append([])
                leaf_of_node.append(-1)
                children[node].append(child)
                split(child, member, level + 1)

        split(0, descriptors, 0)
        n_nodes = len(node_desc)
        child_arr = np.full((n_nodes, k), -1, np.int32)
        for n, ch in enumerate(children):
            child_arr[n, : len(ch)] = ch
        n_words = len(word_counts)
        total = max(sum(word_counts), 1)
        # idf weights (DBoW2 TF_IDF): log(N / n_i)
        wc = np.maximum(np.array(word_counts, np.float64), 1)
        idf = np.log(total / wc).astype(np.float32)
        return Vocabulary(
            k=k,
            depth=depth,
            node_desc=np.stack(node_desc).astype(np.uint32),
            children=child_arr,
            leaf_id=np.array(leaf_of_node, np.int32),
            word_weight=idf,
        )

    @staticmethod
    def synthetic(k: int, depth: int, seed: int = 0) -> "Vocabulary":
        """Structurally complete random vocabulary of k^depth words.

        For validating the lookup/database/serialization paths at the
        reference's ORBvoc scale (k=10, depth=6 => 1M words, System.cc:87)
        without hours of k-medians training — every code path treats it
        identically to a trained tree."""
        rng = np.random.default_rng(seed)
        level_sizes = [k**i for i in range(depth + 1)]
        n_nodes = sum(level_sizes)
        node_desc = rng.integers(0, 2**32, (n_nodes, 8), dtype=np.uint32)
        node_desc[0] = 0
        children = np.full((n_nodes, k), -1, np.int32)
        # level L occupies [offset_L, offset_L + k^L); children are contiguous
        off = np.cumsum([0] + level_sizes)
        for lvl in range(depth):
            parents = np.arange(off[lvl], off[lvl + 1])
            first_child = off[lvl + 1] + (parents - off[lvl]) * k
            children[parents] = first_child[:, None] + np.arange(k)[None, :]
        leaf_id = np.full(n_nodes, -1, np.int32)
        n_words = level_sizes[-1]
        leaf_id[off[depth] :] = np.arange(n_words, dtype=np.int32)
        word_weight = rng.uniform(0.5, 2.0, n_words).astype(np.float32)
        return Vocabulary(
            k=k, depth=depth, node_desc=node_desc, children=children,
            leaf_id=leaf_id, word_weight=word_weight,
        )

    # ---------------------------------------------------------------- io

    def save(self, path: str):
        np.savez_compressed(
            path, k=self.k, depth=self.depth, node_desc=self.node_desc,
            children=self.children, leaf_id=self.leaf_id, word_weight=self.word_weight,
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        """Load either our .npz serialization or a DBoW2 text vocabulary
        (ORBvoc.txt, optionally .tar.gz/.gz-compressed as released by the
        reference — System.cc:87 loads the extracted .txt)."""
        if path.endswith((".txt", ".txt.tar.gz", ".txt.gz", ".tar.gz")):
            return Vocabulary.load_dbow2_text(path)
        z = np.load(path)
        return Vocabulary(
            k=int(z["k"]), depth=int(z["depth"]), node_desc=z["node_desc"],
            children=z["children"], leaf_id=z["leaf_id"], word_weight=z["word_weight"],
        )

    @staticmethod
    def load_dbow2_text(path: str) -> "Vocabulary":
        """Parse DBoW2's TemplatedVocabulary text format (the reference's
        ORBvoc.txt, loaded by ORBVocabulary::loadFromTextFile via System.cc:87).

        Format: header line `k L scoring weighting`, then one line per non-root
        node in file order: `parent is_leaf b0 .. b31 weight` (32 descriptor
        bytes, OpenCV bit order). Node ids are implicit (root = 0, first data
        line = 1, ...); word ids are assigned to leaves in file order, exactly
        like DBoW2's loadFromTextFile.
        """
        import gzip
        import tarfile

        if path.endswith(".tar.gz"):
            with tarfile.open(path, "r:gz") as tf:
                member = next(m for m in tf.getmembers() if m.name.endswith(".txt"))
                raw = tf.extractfile(member).read().decode()
        elif path.endswith(".gz"):
            with gzip.open(path, "rt") as f:
                raw = f.read()
        else:
            with open(path) as f:
                raw = f.read()
        head_end = raw.index("\n")
        k, depth, _scoring, _weighting = (int(x) for x in raw[:head_end].split()[:4])

        # vectorized parse: every data line is `parent is_leaf b0..b31 weight`
        # (35 numeric columns) — at reference scale (~1.1M lines for the
        # 145 MB ORBvoc.txt) a Python per-line loop takes minutes; fromstring
        # over the whole payload takes seconds
        import io

        body = raw[head_end + 1 :]
        data = np.loadtxt(io.StringIO(body), dtype=np.float64, ndmin=2)
        assert data.shape[1] == 35, f"malformed vocabulary file ({data.shape[1]} cols)"
        n_data = len(data)
        n_nodes = 1 + n_data

        node_desc = np.zeros((n_nodes, 8), np.uint32)
        node_desc[1:] = (
            data[:, 2:34].astype(np.uint8).reshape(n_data, 32).view(np.uint32)
        )  # little-endian byte packing, OpenCV bit order
        parent = data[:, 0].astype(np.int64)
        is_leaf = data[:, 1] != 0
        w_col = data[:, 34]

        # children table: stable-sort nodes by parent; slot = rank within group
        node_ids = np.arange(1, n_nodes, dtype=np.int64)
        order = np.argsort(parent, kind="stable")
        sorted_parent = parent[order]
        sorted_child = node_ids[order]
        uniq, first = np.unique(sorted_parent, return_index=True)
        slot = np.arange(n_data) - np.repeat(first, np.diff(np.append(first, n_data)))
        children = np.full((n_nodes, k), -1, np.int32)
        children[sorted_parent, slot] = sorted_child

        # word ids assigned to leaves in file order (DBoW2 loadFromTextFile)
        leaf_id = np.full(n_nodes, -1, np.int32)
        leaf_nodes = node_ids[is_leaf]
        leaf_id[leaf_nodes] = np.arange(is_leaf.sum(), dtype=np.int32)
        weights = w_col[is_leaf].astype(np.float32)

        return Vocabulary(
            k=k,
            depth=depth,
            node_desc=node_desc,
            children=children,
            leaf_id=leaf_id,
            word_weight=weights,
        )

    def save_dbow2_text(self, path: str):
        """Write the DBoW2 text format (interchange with the reference).
        Inverse of load_dbow2_text; nodes are emitted in index order, which in
        our construction always places parents before children."""
        n_nodes = len(self.node_desc)
        parent = np.zeros(n_nodes, np.int64)
        src = np.repeat(np.arange(n_nodes), self.children.shape[1])
        dst = self.children.reshape(-1)
        ok = dst >= 0
        parent[dst[ok]] = src[ok]
        is_leaf = (self.leaf_id >= 0).astype(np.int64)
        w = np.zeros(n_nodes, np.float32)
        w[is_leaf.astype(bool)] = self.word_weight[self.leaf_id[is_leaf.astype(bool)]]
        desc_bytes = self.node_desc.view(np.uint8).reshape(n_nodes, 32)
        cols = np.concatenate(
            [
                parent[1:, None].astype(np.float64),
                is_leaf[1:, None].astype(np.float64),
                desc_bytes[1:].astype(np.float64),
                w[1:, None].astype(np.float64),
            ],
            axis=1,
        )
        with open(path, "w") as f:
            f.write(f"{self.k} {self.depth} 0 0\n")
            np.savetxt(f, cols, fmt=["%d", "%d"] + ["%d"] * 32 + ["%.9g"])

    # ------------------------------------------------------------- lookup

    def quantize(self, desc: np.ndarray, valid: np.ndarray | None = None) -> np.ndarray:
        """[N, 8] uint32 -> [N] word ids (-1 for invalid)."""
        words = np.asarray(
            _quantize_jit(
                jnp.asarray(desc),
                jnp.asarray(self.node_desc),
                jnp.asarray(self.children),
                jnp.asarray(self.leaf_id),
                self.depth,
            )
        )
        if valid is not None:
            words = np.where(valid, words, -1)
        return words

    def bow_vector(self, desc: np.ndarray, valid: np.ndarray | None = None) -> np.ndarray:
        """Dense L1-normalized tf-idf BoW vector [n_words] float32."""
        words = self.quantize(desc, valid)
        v = np.zeros(self.n_words, np.float32)
        ok = words >= 0
        np.add.at(v, words[ok], self.word_weight[words[ok]])
        s = v.sum()
        return v / s if s > 0 else v


@jax.jit
def _hamming_to_nodes(desc: jnp.ndarray, nodes: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] x [M, 8] -> [N, M] int32."""
    acc = jnp.zeros((desc.shape[0], nodes.shape[0]), jnp.int32)
    for w in range(8):
        acc = acc + jax.lax.population_count(
            jnp.bitwise_xor(desc[:, None, w], nodes[None, :, w])
        ).astype(jnp.int32)
    return acc


def _quantize_impl(desc, node_desc, children, leaf_id, depth: int):
    n = desc.shape[0]
    k = children.shape[1]
    node = jnp.zeros(n, jnp.int32)

    def level(_, node):
        ch = children[node]  # [N, k]
        ch_safe = jnp.maximum(ch, 0)
        cd = node_desc[ch_safe]  # [N, k, 8]
        d = jnp.zeros((n, k), jnp.int32)
        for w in range(8):
            d = d + jax.lax.population_count(
                jnp.bitwise_xor(desc[:, None, w], cd[:, :, w])
            ).astype(jnp.int32)
        d = jnp.where(ch >= 0, d, 10_000)
        best = jnp.argmin(d, axis=1)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        # stay put at leaves (no children)
        return jnp.where(nxt >= 0, nxt, node)

    node = jax.lax.fori_loop(0, depth, level, node)
    return leaf_id[node]


_quantize_jit = jax.jit(_quantize_impl, static_argnums=(4,))


def bow_l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score: 1 - 0.5 * |v1 - v2|_1 for L1-normalized vectors.

    Broadcasts: v1 [V] vs v2 [B, V] -> [B]; [A,V] vs [B,V] -> [A,B] when
    v1 has an explicit middle axis.
    """
    if v1.ndim == 1:
        return 1.0 - 0.5 * jnp.abs(v1[None, :] - v2).sum(-1)
    return 1.0 - 0.5 * jnp.abs(v1[:, None, :] - v2[None, :, :]).sum(-1)
