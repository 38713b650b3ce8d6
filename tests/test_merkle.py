"""Merkle engines vs host-oracle hashing and cross-structure consistency."""

import random

from stark_perpetual_tpu.crypto.signature import pedersen_hash
from stark_perpetual_tpu.ops import merkle as M
from stark_perpetual_tpu.utils.merkle_tree import build_update_tree, decode_node


def test_dense_root_matches_host():
    leaves = [1, 2, 3, 4]
    root = M.dense_root(leaves)
    h01 = pedersen_hash(1, 2)
    h23 = pedersen_hash(3, 4)
    assert root == pedersen_hash(h01, h23)


def test_auth_paths():
    rng = random.Random(3)
    leaves = [rng.randrange(1 << 200) for _ in range(16)]
    levels = M.dense_tree(leaves)
    root = levels[-1][0]
    for idx in (0, 5, 15):
        path = M.auth_path(levels, idx)
        assert M.verify_path(leaves[idx], idx, path, root)
        assert not M.verify_path(leaves[idx] ^ 1, idx, path, root)


def test_sparse_tree_empty_and_updates():
    t = M.SparseMerkleTree(height=8)
    # Empty tree root equals the dense tree of 256 empty leaves.
    assert t.root == M.empty_subtree_hashes(8)[8]
    new_root = t.update([(3, 111), (7, 222), (200, 333)])
    assert new_root == t.root
    # Cross-check against a dense tree with the same contents.
    dense_leaves = [0] * 256
    dense_leaves[3], dense_leaves[7], dense_leaves[200] = 111, 222, 333
    assert new_root == M.dense_root(dense_leaves)
    # Incremental second batch, overlapping paths + same-index overwrite.
    t.update([(3, 444), (4, 555)])
    dense_leaves[3], dense_leaves[4] = 444, 555
    assert t.root == M.dense_root(dense_leaves)


def test_sparse_tree_last_write_wins():
    t = M.SparseMerkleTree(height=4)
    t.update([(2, 10), (2, 20)])
    d = [0] * 16
    d[2] = 20
    assert t.root == M.dense_root(d)


def test_sparse_auth_path():
    t = M.SparseMerkleTree(height=6)
    t.update([(11, 77), (50, 88)])
    path = t.auth_path(11)
    assert M.verify_path(77, 11, path, t.root)


def test_update_tree_utils():
    tree = build_update_tree(3, [(1, "a"), (6, "b")])
    left, right = tree
    l2, r2, case = decode_node(tree)
    assert case == "both"
    assert build_update_tree(3, []) is None
