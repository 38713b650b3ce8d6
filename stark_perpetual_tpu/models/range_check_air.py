"""Range-check-builtin AIR: pooled [0, 2^128) membership proofs.

The third builtin both Cairo programs declare
(``%builtins output pedersen range_check ecdsa`` —
src/services/perpetual/cairo/main.cairo:1, src/starkware/cairo/dex/main.cairo:1)
checks that each builtin cell holds a value in [0, 2^128). Every bound
assertion in the business logic (balance windows, amount ranges, packing
proofs — definitions/constants.cairo:9-58) reduces to instances of it.

This AIR proves a pool of ``m`` such claims by bit decomposition, the
same suffix-halving ladder the Pedersen/ECDSA AIRs use:

Block layout (256 rows per value, ``n = 256 * m``):
  rows   0..127   bit steps: suffix_{i+1} = (suffix_i - b_i) / 2 with
                  b_i in {0, 1}; after 128 halvings the suffix is
                  pinned to zero by a boundary assertion, so the
                  decomposed value is the unique integer < 2^128
  rows 128..254   padding (bit forced to 0: suffix stays 0)
  row       255   reset row: constraints off; the next block's suffix
                  is re-pinned by its own boundary assertion

Trace columns: ``suffix``. Public columns: ``pad``, ``rst`` selectors.
"""

from typing import List, Sequence

from stark_perpetual_tpu.models.air import Air, StarkProof, StarkProver, verify_stark
from stark_perpetual_tpu.params import FIELD_PRIME

_BLOCK = 256
_NBITS = 128  # the range_check builtin's bound: [0, 2^128)

RC_BOUND = 1 << _NBITS


class RangeCheckBuiltinAir(Air):
    """AIR for ``m`` pooled claims v_j in [0, 2^128)."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 1  # suffix
    transition_degree = 3

    def __init__(self, values: Sequence[int]):
        m = len(values)
        assert m > 0 and m & (m - 1) == 0, "number of pooled checks must be 2^k"
        self.values = [int(v) for v in values]
        self.m = m
        self.n = _BLOCK * m

    # --- witness ----------------------------------------------------------

    def trace(self) -> List[List[int]]:
        suffix: List[int] = []
        for v in self.values:
            if not 0 <= v < RC_BOUND:
                raise ValueError("range_check builtin input outside [0, 2^128)")
            x = v
            for i in range(_BLOCK):
                suffix.append(x)
                if i < _NBITS:
                    x >>= 1
        return [suffix]

    # --- public columns ---------------------------------------------------

    def public_columns(self) -> List[List[int]]:
        pad: List[int] = []
        rst: List[int] = []
        for _ in range(self.m):
            for i in range(_BLOCK):
                pad.append(1 if (_NBITS <= i < _BLOCK - 1) else 0)
                rst.append(1 if i == _BLOCK - 1 else 0)
        return [pad, rst]

    # --- constraints (device, Montgomery domain) --------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        import jax.numpy as jnp

        suf = cur[0]
        suf_n = nxt[0]
        pad, rst = pub
        one = jnp.broadcast_to(
            jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), suf.shape
        )
        b = f.sub(suf, f.add(suf_n, suf_n))
        ns = f.sub(one, rst)
        c1 = f.mont_mul(ns, f.mont_mul(b, f.sub(b, one)))  # bits are bits
        c2 = f.mont_mul(pad, b)  # padding keeps the suffix constant (0)
        return [c1, c2]

    # --- constraints (host ints, verifier) --------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        suf = cur_vals[0]
        suf_n = nxt_vals[0]
        if pub_vals:
            pad, rst = pub_vals
        else:  # constraint-count probe
            pad = rst = 0
        b = (suf - 2 * suf_n) % p
        ns = (1 - rst) % p
        return [ns * (b * (b - 1)) % p, pad * b % p]

    # --- boundary ---------------------------------------------------------

    def boundary(self):
        out = []
        for j, v in enumerate(self.values):
            base = j * _BLOCK
            out.append((0, base, v))
            out.append((0, base + _NBITS, 0))
        return out


def prove_range_checks(
    values: Sequence[int], blowup: int = 8, n_queries: int = 16
) -> StarkProof:
    """Pool a list of range-check obligations into one STARK proof."""
    vals = [int(v) for v in values]
    while len(vals) & (len(vals) - 1):
        vals.append(0)
    air = RangeCheckBuiltinAir(vals)
    return StarkProver(air, blowup=blowup, n_queries=n_queries).prove(air.trace())


def verify_range_checks(values: Sequence[int], proof: StarkProof) -> bool:
    vals = [int(v) for v in values]
    while len(vals) & (len(vals) - 1):
        vals.append(0)
    return verify_stark(RangeCheckBuiltinAir(vals), proof)
