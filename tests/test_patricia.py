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


def test_batched_rounds_device_call_count(monkeypatch):
    """A 2^10-leaf height-251 update must hash in per-round batches (one
    device dispatch per topological round), not per node."""
    import random
    import time

    import stark_perpetual_tpu.ops.patricia as P
    from stark_perpetual_tpu.ops import pedersen as ped

    rng = random.Random(42)
    k = 1 << 10
    leaves = [(rng.getrandbits(251), rng.getrandbits(200) + 1) for _ in range(k)]

    calls = {"n": 0, "pairs": 0}
    real = ped.pedersen_hash_ints

    def counting(pairs):
        calls["n"] += 1
        calls["pairs"] += len(pairs)
        return real(pairs)

    monkeypatch.setattr(ped, "pedersen_hash_ints", counting)
    t = P.PatriciaTree(251)
    t0 = time.time()
    root = t.update(leaves)
    elapsed = time.time() - t0
    assert root != 0
    # ~2K hash obligations (K-1 binaries + ~K edges) in ~log2(K)+2 rounds.
    assert calls["pairs"] >= 2 * k - 64
    assert calls["n"] <= 40, f"{calls['n']} device dispatches for {k} leaves"
    print(f"patricia 2^10 leaves: {calls['n']} dispatches, "
          f"{calls['pairs']} hashes, {elapsed:.2f}s")


def test_batched_root_matches_per_node_reference():
    """Cross-check the round-batched hasher against a direct per-node walk."""
    import random

    from stark_perpetual_tpu.ops.patricia import _build

    rng = random.Random(7)
    leaves = [(rng.getrandbits(16), rng.getrandbits(100) + 1) for _ in range(50)]
    height = 16

    def slow_hash(node):
        if node.kind == "value":
            return node.hash
        if node.kind == "binary":
            return pedersen_hash(slow_hash(node.left), slow_hash(node.right))
        return (pedersen_hash(slow_hash(node.bottom), node.path) + node.length) % FIELD_PRIME

    dedup = {}
    for i, v in leaves:
        dedup[i] = v
    items = sorted(dedup.items())
    want = slow_hash(_build(height, items))
    t = PatriciaTree(height)
    assert t.update(leaves) == want
