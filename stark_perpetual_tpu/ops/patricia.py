"""Patricia (Merkle-Patricia) tree commitment over Pedersen.

Parity target: the `patricia_update` primitive from the Cairo common library
used for the DEX orders tree (dex/main.cairo:304-308). Node encoding (the
canonical cairo-lang/starkware scheme):

  - empty subtree:            hash = 0
  - leaf:                     hash = value
  - binary node:              hash = pedersen(left_hash, right_hash)
  - edge node (l, p, bottom): hash = pedersen(bottom_hash, p) + l  (mod P)
    where the edge skips `l` levels whose path bits (MSB-first) form the
    integer p, ending at a non-edge `bottom` node.

Maximal edges are canonical: a chain of single-child levels collapses into
one edge; values of 0 delete leaves.
"""

from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.params import FIELD_PRIME

EMPTY = ("empty",)


def _node(height: int, items: List[Tuple[int, int]]):
    """items: sorted (index, value) with nonzero values, indices < 2^height.

    Returns one of ('empty',) | ('leaf', v) | ('binary', h) |
    ('edge', length, path, bottom_hash).
    """
    if not items:
        return EMPTY
    if height == 0:
        assert len(items) == 1
        return ("leaf", items[0][1])
    half = 1 << (height - 1)
    split = 0
    while split < len(items) and items[split][0] < half:
        split += 1
    left_items = items[:split]
    right_items = [(i - half, v) for i, v in items[split:]]
    left = _node(height - 1, left_items)
    right = _node(height - 1, right_items)

    if right == EMPTY:
        return _extend_edge(left, bit=0)
    if left == EMPTY:
        return _extend_edge(right, bit=1)
    return ("binary", _resolve_binary(left, right))


def _extend_edge(child, bit: int):
    kind = child[0]
    if kind == "edge":
        _k, length, path, bottom = child
        return ("edge", length + 1, path + (bit << length), bottom)
    bottom = _hash_of(child)
    return ("edge", 1, bit, bottom)


def _resolve_binary(left, right) -> int:
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    return pedersen_hash_ints([(_hash_of(left), _hash_of(right))])[0]


def _hash_of(node) -> int:
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    kind = node[0]
    if kind == "empty":
        return 0
    if kind == "leaf":
        return node[1]
    if kind == "binary":
        return node[1]
    _k, length, path, bottom = node
    return (pedersen_hash_ints([(bottom, path)])[0] + length) % FIELD_PRIME


class PatriciaTree:
    """Sparse height-H Patricia tree over a leaf dict.

    The root recomputes over the populated subtrees only (O(K) nodes for K
    leaves; the per-node Pedersen goes through the native/batched hasher).
    """

    def __init__(self, height: int):
        self.height = height
        self.leaves: Dict[int, int] = {}

    @property
    def root(self) -> int:
        items = sorted((i, v) for i, v in self.leaves.items() if v != 0)
        return _hash_of(_node(self.height, items))

    def update(self, modifications: Sequence[Tuple[int, int]]) -> int:
        """Apply (index, value) writes (last write per index wins)."""
        for index, value in modifications:
            assert 0 <= index < (1 << self.height)
            if value == 0:
                self.leaves.pop(index, None)
            else:
                self.leaves[index] = value
        return self.root

    def get(self, index: int) -> int:
        return self.leaves.get(index, 0)
