"""Sparse Merkle update-subtree oracle.

Capability parity with the reference's update-tree helper
(/root/reference/src/starkware/python/merkle_tree.py:4-44): given the
modified leaves of a height-``h`` binary tree, produce the minimal subtree
spanning them, for walking update paths. The framework's device engine
(ops/merkle.py) batches whole levels instead; this module is the host-side
oracle the merkle tests cross-check against, written as a fresh top-down
recursion over index ranges.
"""

from bisect import bisect_left
from typing import Any, Collection, Optional, Tuple


def build_update_tree(height: int, modifications: Collection[Tuple[int, Any]]):
    """Minimal subtree spanning the modified leaves.

    Node encoding: ``None`` for a subtree with no updates, a
    ``(left, right)`` pair for an inner node (either side may be ``None``),
    and the ``(leaf_index, value)`` pair at a leaf. When the same index is
    modified twice, the later entry wins.
    """
    final = {}
    for index, value in modifications:
        assert 0 <= index < (1 << height), f"leaf index {index} out of range"
        final[index] = value
    if not final:
        return None
    ordered = sorted(final)

    def subtree(level: int, prefix: int) -> Optional[object]:
        lo = prefix << (height - level)
        hi = (prefix + 1) << (height - level)
        pos = bisect_left(ordered, lo)
        if pos == len(ordered) or ordered[pos] >= hi:
            return None
        if level == height:
            return (lo, final[lo])
        return (subtree(level + 1, 2 * prefix), subtree(level + 1, 2 * prefix + 1))

    return subtree(0, 0)


def decode_node(node):
    """Classify an inner update-tree node by which side carries updates.

    Returns ``(left_child, right_child, case)`` with case in
    ``{"left", "right", "both"}``.
    """
    left, right = node
    assert left is not None or right is not None, "empty update node"
    if right is None:
        case = "left"
    elif left is None:
        case = "right"
    else:
        case = "both"
    return left, right, case
