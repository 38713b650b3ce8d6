"""GPS fact-topology tests (output-builtin page/tree semantics)."""

from stark_perpetual_tpu.models.gps_output import (
    build_fact_topology,
    fact_tree_root,
    page_hash,
    split_pages,
)
from stark_perpetual_tpu.utils.keccak import keccak_256


def test_validium_single_leaf():
    out = [1, 2, 3]
    topo = build_fact_topology(out, None)
    assert topo.tree_structure == [1, 0]
    assert topo.page_sizes == [3]
    assert topo.fact_tree_root == topo.page_hashes[0] == page_hash(out)


def test_rollup_two_level_tree():
    main = list(range(5))
    da = [[10, 11], [12]]
    topo = build_fact_topology(main, da)
    assert topo.tree_structure == [3, 2, 0, 2]
    assert topo.page_sizes == [5, 2, 1]
    # Recompute the root by hand: inner node over the two DA pages, then
    # root over (main leaf, inner node).
    h1, h2 = topo.page_hashes[1], topo.page_hashes[2]
    inner = int.from_bytes(
        keccak_256(
            h1.to_bytes(32, "big") + (2).to_bytes(32, "big")
            + h2.to_bytes(32, "big") + (1).to_bytes(32, "big")
        ),
        "big",
    )
    root = int.from_bytes(
        keccak_256(
            topo.page_hashes[0].to_bytes(32, "big") + (5).to_bytes(32, "big")
            + inner.to_bytes(32, "big") + (3).to_bytes(32, "big")
        ),
        "big",
    )
    assert topo.fact_tree_root == root
    # The stack machine agrees with itself on a re-run.
    assert (
        fact_tree_root(list(zip(topo.page_hashes, topo.page_sizes)), [3, 2, 0, 2])
        == root
    )


def test_split_pages():
    assert split_pages(list(range(7)), 3) == [[0, 1, 2], [3, 4, 5], [6]]
    assert split_pages([], 3) == []
