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

Batching: the structure pass (host, no hashing) assigns each node a
topological round = 1 + max(round of hash dependencies); the hash pass then
issues ONE batched device Pedersen call per round. A balanced K-leaf tree
resolves in ~log2(K)+1 rounds instead of ~2K serial single-pair calls.
"""

from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.params import FIELD_PRIME


class _Node:
    """A structure node with a deferred hash.

    kind 'value': hash known immediately (empty subtrees and leaves).
    kind 'binary': hash = h(left.hash, right.hash).
    kind 'edge':   hash = h(bottom.hash, path) + length  (mod P).
    """

    __slots__ = ("kind", "hash", "left", "right", "length", "path", "bottom", "round")

    def __init__(self, kind, **kw):
        self.kind = kind
        self.hash = kw.get("hash")
        self.left = kw.get("left")
        self.right = kw.get("right")
        self.length = kw.get("length", 0)
        self.path = kw.get("path", 0)
        self.bottom = kw.get("bottom")
        if kind == "value":
            self.round = 0
        elif kind == "binary":
            self.round = 1 + max(self.left.round, self.right.round)
        else:
            self.round = 1 + self.bottom.round


_EMPTY = _Node("value", hash=0)


def _build(height: int, items: List[Tuple[int, int]]) -> _Node:
    """items: sorted (index, value) with nonzero values, indices < 2^height."""
    if not items:
        return _EMPTY
    if height == 0:
        assert len(items) == 1
        return _Node("value", hash=items[0][1])
    half = 1 << (height - 1)
    split = 0
    while split < len(items) and items[split][0] < half:
        split += 1
    left = _build(height - 1, items[:split])
    right = _build(height - 1, [(i - half, v) for i, v in items[split:]])

    if right is _EMPTY:
        return _extend_edge(left, bit=0)
    if left is _EMPTY:
        return _extend_edge(right, bit=1)
    return _Node("binary", left=left, right=right)


def _extend_edge(child: _Node, bit: int) -> _Node:
    if child.kind == "edge":
        return _Node(
            "edge",
            length=child.length + 1,
            path=child.path + (bit << child.length),
            bottom=child.bottom,
        )
    return _Node("edge", length=1, path=bit, bottom=child)


def _resolve(root: _Node) -> int:
    """Hash the structure with one batched Pedersen call per round."""
    from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints

    buckets: Dict[int, List[_Node]] = {}
    stack = [root]
    while stack:
        node = stack.pop()
        if node.kind == "value":
            continue
        buckets.setdefault(node.round, []).append(node)
        if node.kind == "binary":
            stack.append(node.left)
            stack.append(node.right)
        else:
            stack.append(node.bottom)

    for r in sorted(buckets):
        nodes = buckets[r]
        pairs = [
            (n.left.hash, n.right.hash)
            if n.kind == "binary"
            else (n.bottom.hash, n.path)
            for n in nodes
        ]
        hashes = pedersen_hash_ints(pairs)
        for n, h in zip(nodes, hashes):
            n.hash = h if n.kind == "binary" else (h + n.length) % FIELD_PRIME
    return root.hash


class PatriciaTree:
    """Sparse height-H Patricia tree over a leaf dict.

    The root recomputes over the populated subtrees only (O(K) nodes for K
    leaves); hashing is issued in per-round device batches (see module doc).
    """

    def __init__(self, height: int):
        self.height = height
        self.leaves: Dict[int, int] = {}

    @property
    def root(self) -> int:
        items = sorted((i, v) for i, v in self.leaves.items() if v != 0)
        return _resolve(_build(self.height, items))

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
