"""Batched Merkle engines over the Pedersen hash.

Replaces the reference's `merkle_multi_update` / `patricia_update` Cairo
primitives (used at state/state.cairo:155-173 and dex/main.cairo:281-308)
and `build_update_tree` host logic with device-batched level-by-level
hashing:

  - `dense_tree`: full power-of-two commitment tree; every level is one
    batched Pedersen call over the chip (the FRI/trace-commitment workhorse).
  - `SparseMerkleTree`: height-H (e.g. 64) state tree where almost all leaves
    hold a default value; only non-default nodes are materialized. Multi-leaf
    updates gather the frontier per level and hash all touched nodes in one
    batched device call per level -- the TPU analog of merkle_multi_update's
    update-tree recursion.
"""

import functools
from typing import Dict, List, Sequence, Tuple

import numpy as np

from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints


def dense_commit_device(leaf_limbs) -> Tuple[int, list]:
    """Merkle-commit a large power-of-two leaf array of (N, 21) limb rows.

    Levels >= 128 leaves hash as full device batches; the small top of the
    tree finishes on the host path. Returns (root, levels) where levels[k]
    is the (N/2^k, 21) numpy limb array of that level (for auth paths).
    """
    import jax
    import jax.numpy as jnp

    from stark_perpetual_tpu.ops.field import stark_prime_field, unpack_ints

    f = stark_prime_field()
    levels = [np.asarray(leaf_limbs)]
    cur = np.asarray(leaf_limbs)
    if jax.default_backend() != "cpu":
        from stark_perpetual_tpu.ops.pedersen import pedersen_hash_limbs_chunked

        while cur.shape[0] > 128:
            pairs = cur.reshape(cur.shape[0] // 2, 2, cur.shape[-1])
            # Fixed-shape chunked calls: one compiled executable serves every
            # level size (per-shape Pallas compiles dominated prover wall).
            h, _bad = pedersen_hash_limbs_chunked(pairs[:, 0], pairs[:, 1])
            cur = h
            levels.append(h)
    # Finish on host ints (on a CPU backend the whole tree hashes here:
    # every level is a new shape, and one XLA compile per level dwarfs the
    # native-library hashing time).
    vals = [int(v) for v in unpack_ints(np.asarray(cur))]
    while len(vals) > 1:
        vals = pedersen_hash_ints(
            [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]
        )
        levels.append(np.asarray(f.pack(vals)))
    return vals[0], levels


def auth_path_from_levels(levels: list, index: int) -> List[int]:
    """Sibling path for dense_commit_device levels."""
    from stark_perpetual_tpu.ops.field import unpack_ints

    path = []
    for level in levels[:-1]:
        sibling = level[index ^ 1]
        path.append(int(unpack_ints(sibling[None, :])[0]))
        index //= 2
    return path


@functools.lru_cache(maxsize=None)
def empty_subtree_hashes(height: int, empty_leaf: int = 0) -> Tuple[int, ...]:
    """h[k] = root of an empty subtree of height k (h[0] = empty leaf)."""
    out = [empty_leaf]
    for _ in range(height):
        out.append(_hash_level_host([(out[-1], out[-1])])[0])
    return tuple(out)


def _hash_level_host(pairs: Sequence[Tuple[int, int]]) -> List[int]:
    return pedersen_hash_ints(pairs)


def dense_tree(leaves: Sequence[int]) -> List[List[int]]:
    """All levels of the dense tree: levels[0] = leaves, levels[-1] = [root].

    len(leaves) must be a power of two. Each level is one batched device call.
    """
    n = len(leaves)
    assert n & (n - 1) == 0 and n >= 1
    levels = [list(leaves)]
    cur = list(leaves)
    while len(cur) > 1:
        pairs = [(cur[i], cur[i + 1]) for i in range(0, len(cur), 2)]
        cur = pedersen_hash_ints(pairs)
        levels.append(cur)
    return levels


def dense_root(leaves: Sequence[int]) -> int:
    return dense_tree(leaves)[-1][0]


def auth_path(levels: List[List[int]], index: int) -> List[int]:
    """Sibling path for `index` from a dense_tree() result."""
    path = []
    for level in levels[:-1]:
        path.append(level[index ^ 1])
        index //= 2
    return path


def verify_path(leaf: int, index: int, path: Sequence[int], root: int) -> bool:
    cur = leaf
    for sibling in path:
        pair = (cur, sibling) if index % 2 == 0 else (sibling, cur)
        cur = pedersen_hash_ints([pair])[0]
        index //= 2
    return cur == root


class SparseMerkleTree:
    """Height-H Merkle tree with a default empty leaf; sparse node storage.

    Semantics match the Cairo state trees: leaf index in [0, 2^height);
    `update(modifications)` applies a batch of (index, leaf_hash) writes and
    recomputes the root, hashing each level's touched nodes in one batched
    call (cf. merkle_multi_update + build_update_tree).
    """

    def __init__(self, height: int, empty_leaf: int = 0):
        self.height = height
        self.empty = empty_subtree_hashes(height, empty_leaf)
        # nodes[level] maps node index -> hash; level 0 = leaves.
        self.nodes: List[Dict[int, int]] = [dict() for _ in range(height + 1)]

    @property
    def root(self) -> int:
        return self.nodes[self.height].get(0, self.empty[self.height])

    def get_leaf(self, index: int) -> int:
        return self.nodes[0].get(index, self.empty[0])

    def get_node(self, level: int, index: int) -> int:
        return self.nodes[level].get(index, self.empty[level])

    def auth_path(self, index: int) -> List[int]:
        path = []
        for level in range(self.height):
            path.append(self.get_node(level, index ^ 1))
            index //= 2
        return path

    def update(self, modifications: Sequence[Tuple[int, int]]) -> int:
        """Apply (index, leaf_hash) writes; returns the new root.

        Later modifications to the same index win (build_update_tree parity).
        """
        if not modifications:
            return self.root
        writes = dict(modifications)
        for index, value in writes.items():
            assert 0 <= index < (1 << self.height)
            self.nodes[0][index] = value
        frontier = set(writes.keys())
        for level in range(self.height):
            parents = sorted({i // 2 for i in frontier})
            pairs = [
                (self.get_node(level, 2 * p), self.get_node(level, 2 * p + 1))
                for p in parents
            ]
            hashes = _hash_level_host(pairs)
            for p, h in zip(parents, hashes):
                self.nodes[level + 1][p] = h
            frontier = set(parents)
        return self.root
