"""GPS fact topology: the page/tree structure the GPS verifier consumes.

Parity: the output-builtin page splitting + ``gps_fact_topology`` attribute
emitted by both batch programs (perpetual main.cairo:146-187; the DEX main
splits its onchain data the same way). tree_structure is the stack-machine
encoding used by the reference's output builtin: alternating
(pages_to_push, children_to_combine) pairs. Rollup batches use
[1 + n_pages, n_pages, 0, 2]: push all pages, make one inner node from the
n_pages onchain-data pages, then combine it with the main-output page into
the root. Validium batches are a single leaf ([1, 0]).
"""

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple


@dataclass
class FactTopology:
    tree_structure: List[int]
    page_sizes: List[int]  # page 0 = the main program output
    page_hashes: List[int]  # keccak over 32-byte big-endian words per page
    fact_tree_root: int  # root of the (hash, size) fact tree


def page_hash(words: Sequence[int]) -> int:
    from stark_perpetual_tpu.utils.keccak import keccak_256

    data = b"".join(w.to_bytes(32, "big") for w in words)
    return int.from_bytes(keccak_256(data), "big")


def fact_tree_root(
    pages: Sequence[Tuple[int, int]], tree_structure: Sequence[int]
) -> int:
    """Run the output-builtin stack machine over (page_hash, page_size) pairs.

    Inner node hash = keccak over the children's concatenated 32-byte
    (hash, size) pairs; node size = sum of child sizes.
    """
    from stark_perpetual_tpu.utils.keccak import keccak_256

    assert len(tree_structure) % 2 == 0 and len(tree_structure) >= 2
    stack: List[Tuple[int, int]] = []
    remaining = list(pages)
    it = iter(tree_structure)
    for push, combine in zip(it, it):
        for _ in range(push):
            stack.append(remaining.pop(0))
        if combine:
            children = stack[-combine:]
            del stack[-combine:]
            data = b"".join(
                h.to_bytes(32, "big") + size.to_bytes(32, "big")
                for h, size in children
            )
            stack.append(
                (int.from_bytes(keccak_256(data), "big"), sum(s for _h, s in children))
            )
    assert len(stack) == 1 and not remaining, "malformed fact-tree structure"
    return stack[0][0]


def build_fact_topology(
    program_output: Sequence[int], da_pages: Optional[Sequence[Sequence[int]]]
) -> FactTopology:
    """Page 0 is the main output; rollup DA pages become one inner node;
    validium is a single-leaf tree."""
    all_pages = [list(program_output)] + [list(p) for p in (da_pages or [])]
    n_da = len(all_pages) - 1
    if n_da:
        tree_structure = [1 + n_da, n_da, 0, 2]
    else:
        tree_structure = [1, 0]
    hashes = [page_hash(p) for p in all_pages]
    sizes = [len(p) for p in all_pages]
    root = fact_tree_root(list(zip(hashes, sizes)), tree_structure)
    return FactTopology(
        tree_structure=tree_structure,
        page_sizes=sizes,
        page_hashes=hashes,
        fact_tree_root=root,
    )


def split_pages(words: Sequence[int], max_words_per_page: int) -> List[List[int]]:
    return [
        list(words[i : i + max_words_per_page])
        for i in range(0, len(words), max_words_per_page)
    ]
