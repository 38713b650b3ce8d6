"""Sparse update-tree utilities (parity: /root/reference/src/starkware/python/merkle_tree.py:4-44)."""

from typing import Any, Collection, Tuple


def build_update_tree(height: int, modifications: Collection[Tuple[int, Any]]):
    """Subtree induced by modification leaves.

    A tree is None, a (left, right) pair, or a leaf (leaf_index, modification).
    The last modification to an index wins.
    """
    if len(modifications) == 0:
        return None
    layer = dict(modifications)
    for _ in range(height):
        parents = set(index // 2 for index in layer.keys())
        layer = {index: (layer.get(index * 2), layer.get(index * 2 + 1)) for index in parents}
    assert len(layer) == 1
    return layer[0]


def decode_node(node):
    """Which update case an inner node is: 'left', 'right', or 'both'."""
    left_child, right_child = node
    if left_child is None:
        assert right_child is not None, "No updates in tree"
        case = "right"
    elif right_child is None:
        case = "left"
    else:
        case = "both"
    return left_child, right_child, case
