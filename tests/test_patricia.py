"""Patricia tree node-encoding tests (cairo-lang patricia_update semantics)."""

from stark_perpetual_tpu.crypto.signature import pedersen_hash
from stark_perpetual_tpu.ops.patricia import PatriciaTree
from stark_perpetual_tpu.params import FIELD_PRIME


def test_empty_root_is_zero():
    assert PatriciaTree(251).root == 0


def test_single_leaf_is_full_height_edge():
    h = 16
    t = PatriciaTree(h)
    t.update([(0b1010, 77)])
    # Root = edge(length=h, path=index, bottom=value):
    assert t.root == (pedersen_hash(77, 0b1010) + h) % FIELD_PRIME


def test_two_leaves_binary_under_edges():
    # Height 2, leaves at 0 and 3: root = binary(edge(1,0,v0), edge(1,1,v3)).
    t = PatriciaTree(2)
    t.update([(0, 11), (3, 22)])
    left = (pedersen_hash(11, 0) + 1) % FIELD_PRIME
    right = (pedersen_hash(22, 1) + 1) % FIELD_PRIME
    assert t.root == pedersen_hash(left, right)


def test_adjacent_leaves_no_edge():
    # Height 1, both leaves present: root = binary(leaf, leaf).
    t = PatriciaTree(1)
    t.update([(0, 5), (1, 6)])
    assert t.root == pedersen_hash(5, 6)


def test_update_delete_and_fresh_equivalence():
    t = PatriciaTree(32)
    t.update([(100, 1), (200, 2), (300, 3)])
    t.update([(200, 0)])  # delete
    t.update([(100, 9)])  # overwrite
    fresh = PatriciaTree(32)
    fresh.update([(100, 9), (300, 3)])
    assert t.root == fresh.root
    assert t.get(200) == 0 and t.get(100) == 9


def test_deep_tree_roots_differ_by_position():
    a = PatriciaTree(251)
    b = PatriciaTree(251)
    a.update([(1 << 200, 5)])
    b.update([(1 << 100, 5)])
    assert a.root != b.root
