"""Transition-rule AIR: the solvency comparisons over proven TV/TR claims.

Companion of ``PositionStatusAir`` (status_air.py): that AIR proves
(leaf_hash, epoch) -> (tv, tr) totals; this one proves the transition
RULE of validate_state_transition.cairo:20-94 on those totals, one
256-row block per recorded check:

  - **well-leveraged path** (w=1): tr1 <= tv1 * 2^32, proven by a 128-bit
    ladder on the difference (validate_state_transition.cairo:28-37);
  - **ratio path** (w=0): tv0 * tr1 <= tv1 * tr0, proven by a 224-bit
    ladder on the cross-multiplied difference (the assert_250_bit trick
    of validate_state_transition.cairo:70-71 with the exact system
    bounds |tv| < 2^95, tr < 2^128); and when tr0 = 0 (inverse-witnessed
    zero flag) additionally tv0 <= tv1 via a 96-bit ladder
    (ILLEGAL_POSITION_TRANSITION_NO_RISK_REDUCED_VALUE);
  - taking the strict path when the lenient one would do is sound, so
    w=0 needs no "not well-leveraged" proof;
  - both statuses are CONSUMED from the status-claims table by logUp, so
    the totals compared here are exactly the ones PositionStatusAir
    proved — a check consuming a fabricated total dies on the grand sum.

``check_smaller_in_synthetic_holdings`` (check_smaller_holdings.cairo:
8-102) is proven by the companion ``HoldingsMergeAir``
(holdings_merge_air.py) over the same checks table; what stays
host-checked is only the binding of (initial leaf, updated leaf) pairs
to the batch's update flow — an engine cross-check on the public checks
table, like the journals of the bus AIRs.

Public surface: the checks table [(leaf0, leaf1, epoch, w, mult)] and
the consumed status-claims table (shared verbatim with the status AIR's
public inputs; multiplicities must MATCH its production counts — the
combined verifier enforces table equality).
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.models.constraint_dsl import DslAir, chal, const, cur, nxt, pub
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 256
B32 = 1 << 32
B95 = 1 << 95
B96 = 1 << 96
B127 = 1 << 127

BETA_STATUS = 8  # shared with status_air's claims tag
BETA_CHECK = 9


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


@dataclass(frozen=True)
class TransitionCheck:
    """One recorded transition check (engine witness + public row)."""

    leaf0: int  # initial snapshot leaf hash (0 when well-leveraged)
    leaf1: int  # updated snapshot leaf hash
    epoch: int
    tvb0: int  # tv0 + 2^95 (0 when well-leveraged)
    tr0: int
    tvb1: int
    tr1: int
    well: int  # 1: updated is well-leveraged; 0: ratio path


def checks_public_surface(checks: Sequence[TransitionCheck]):
    """(checks table, consumed status-claims multiset) from the log."""
    tab: Dict[Tuple[int, int, int, int], int] = {}
    consumed: Dict[Tuple[int, int, int, int], int] = {}
    for c in checks:
        key = (c.leaf0, c.leaf1, c.epoch, c.well)
        tab[key] = tab.get(key, 0) + 1
        consumed[(c.leaf1, c.epoch, c.tvb1, c.tr1)] = (
            consumed.get((c.leaf1, c.epoch, c.tvb1, c.tr1), 0) + 1
        )
        if not c.well:
            consumed[(c.leaf0, c.epoch, c.tvb0, c.tr0)] = (
                consumed.get((c.leaf0, c.epoch, c.tvb0, c.tr0), 0) + 1
            )
    return (
        [k + (mu,) for k, mu in sorted(tab.items())],
        [k + (mu,) for k, mu in sorted(consumed.items())],
    )


# Main columns.
(C_L0, C_L1, C_EPOCH, C_TVB0, C_TR0, C_TVB1, C_TR1, C_W, C_Z0, C_TR0INV,
 C_SWELL, C_SRATIO, C_STV) = range(13)
# Interaction columns.
(C_IS1, C_IS0, C_ICK, C_ACC) = range(13, 17)
# Public columns.
(P_START, P_BREAL, P_HOLD, P_LAD128, P_ZERO128, P_LAD224, P_ZERO224,
 P_LAD96, P_ZERO96, P_ROW0, P_LASTROW) = range(11)

_HOLD_COLS = (C_L0, C_L1, C_EPOCH, C_TVB0, C_TR0, C_TVB1, C_TR1, C_W,
              C_Z0, C_TR0INV)


class TransitionRuleAir(DslAir, Air):
    """Witnessed transition checks against the proven status claims."""

    n_columns = 13
    n_interaction_columns = 4
    n_interaction_challenges = 3
    n_derived_challenges = 1
    n_public_columns = 11
    transition_degree = 4

    def __init__(
        self,
        checks_table: Sequence[Tuple[int, int, int, int, int]],
        status_claims: Sequence[Tuple[int, int, int, int, int]],
        n_checks: int,
    ):
        assert n_checks >= 1
        self.checks_table = [tuple(c) for c in checks_table]
        self.status_claims = [tuple(c) for c in status_claims]
        for _l0, _l1, _ep, w, mu in self.checks_table:
            assert w in (0, 1) and mu >= 0
        # The ratio-path 224-bit ladder is sound only under the system
        # bounds |tv| < 2^95, tr < 2^128 (status.cairo:104-136). The status
        # AIR proves them for its claims; assert them here too so this AIR
        # is safe even against a malformed claims table (ADVICE r4).
        for _leaf, _ep, tvb, tr, mu in self.status_claims:
            assert 0 <= tvb < B96 and 0 <= tr < (1 << 128) and mu >= 0
        self.n_checks = n_checks
        m = 1
        while m < max(2, n_checks):
            m *= 2
        self.m = m
        self.n = BLOCK * m
        self._exprs = self._build_exprs()

    # --- witness ----------------------------------------------------------

    def trace(self, checks: Sequence[TransitionCheck]) -> List[List[int]]:
        assert len(checks) == self.n_checks
        p = FIELD_PRIME
        n = self.n
        cols = [[0] * n for _ in range(self.n_columns)]
        for k, c in enumerate(checks):
            base = k * BLOCK
            tv1 = c.tvb1 - B95
            if c.well:
                d_well = tv1 * B32 - c.tr1
                if d_well < 0:
                    raise ValueError(f"not well-leveraged: {c}")
                d_ratio = 0
                d_tv = 0
                z0 = 0
            else:
                tv0 = c.tvb0 - B95
                d_ratio = tv1 * c.tr0 - tv0 * c.tr1
                if d_ratio < 0:
                    raise ValueError(f"ratio rule violated: {c}")
                z0 = 1 if c.tr0 == 0 else 0
                d_tv = (c.tvb1 - c.tvb0) if z0 else 0
                if d_tv < 0:
                    raise ValueError(f"zero-risk value reduced: {c}")
                d_well = 0
            vals = {
                C_L0: c.leaf0, C_L1: c.leaf1, C_EPOCH: c.epoch,
                C_TVB0: c.tvb0, C_TR0: c.tr0, C_TVB1: c.tvb1, C_TR1: c.tr1,
                C_W: c.well, C_Z0: z0,
                C_TR0INV: _inv(c.tr0) if c.tr0 else 0,
            }
            lad = {C_SWELL: d_well, C_SRATIO: d_ratio, C_STV: d_tv}
            for i in range(BLOCK):
                for ci, v in vals.items():
                    cols[ci][base + i] = v % p
                for ci in lad:
                    cols[ci][base + i] = lad[ci] % p
                    lad[ci] >>= 1
        return cols

    # --- interaction ------------------------------------------------------

    def _tuples(self, al, be, v):
        p = FIELD_PRIME
        al2 = al * al % p
        al3 = al2 * al % p
        return {
            "s1": (v[C_L1] + al * v[C_EPOCH] + al2 * v[C_TVB1]
                   + al3 * v[C_TR1] + BETA_STATUS * be) % p,
            "s0": (v[C_L0] + al * v[C_EPOCH] + al2 * v[C_TVB0]
                   + al3 * v[C_TR0] + BETA_STATUS * be) % p,
            "ck": (v[C_L0] + al * v[C_L1] + al2 * v[C_EPOCH]
                   + al3 * v[C_W] + BETA_CHECK * be) % p,
        }

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        n = self.n
        invs = {k: [0] * n for k in ("s1", "s0", "ck")}
        acc = [0] * n
        for b in range(self.n_checks):
            base = b * BLOCK
            v = {i: main_columns[i][base] for i in range(10)}
            t = self._tuples(al, be, v)
            invs["s1"][base] = _inv(z - t["s1"])
            invs["ck"][base] = _inv(z - t["ck"])
            if not v[C_W]:
                invs["s0"][base] = _inv(z - t["s0"])
        total = 0
        for r in range(n - 1):
            total = (total + invs["s1"][r] + invs["s0"][r] + invs["ck"][r]) % p
            acc[r + 1] = total
        return [invs["s1"], invs["s0"], invs["ck"], acc]

    def derived_challenges(self, challenges):
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        al3 = al2 * al % p
        S = 0
        for leaf, ep, tvb, tr, mu in self.status_claims:
            S = (S + mu * _inv(
                z - (leaf + al * ep + al2 * tvb + al3 * tr + BETA_STATUS * be)
            )) % p
        for l0, l1, ep, w, mu in self.checks_table:
            S = (S + mu * _inv(
                z - (l0 + al * l1 + al2 * ep + al3 * w + BETA_CHECK * be)
            )) % p
        return [S]

    # --- public columns ---------------------------------------------------

    def _selectors(self):
        n, m = self.n, self.m
        c = {i: [0] * n for i in range(self.n_public_columns)}
        for k in range(m):
            base = k * BLOCK
            c[P_START][base] = 1
            if k < self.n_checks:
                c[P_BREAL][base] = 1
            for i in range(BLOCK - 1):
                c[P_HOLD][base + i] = 1
            for i in range(128):
                c[P_LAD128][base + i] = 1
            for i in range(128, BLOCK):
                c[P_ZERO128][base + i] = 1
            for i in range(224):
                c[P_LAD224][base + i] = 1
            for i in range(224, BLOCK):
                c[P_ZERO224][base + i] = 1
            for i in range(96):
                c[P_LAD96][base + i] = 1
            for i in range(96, BLOCK):
                c[P_ZERO96][base + i] = 1
        c[P_ROW0][0] = 1
        c[P_LASTROW][n - 1] = 1
        return c

    def public_columns(self):
        c = self._selectors()
        return [c[i] for i in range(self.n_public_columns)]

    def public_inputs(self):
        out = [self.n_checks, self.m]
        for row in self.checks_table:
            out += [v % FIELD_PRIME for v in row]
        out.append(FIELD_PRIME - 1)
        for row in self.status_claims:
            out += [v % FIELD_PRIME for v in row]
        return out

    # --- constraints ------------------------------------------------------

    def _build_exprs(self):
        breal = pub(P_BREAL)
        hold = pub(P_HOLD)
        lad128, zero128 = pub(P_LAD128), pub(P_ZERO128)
        lad224, zero224 = pub(P_LAD224), pub(P_ZERO224)
        lad96, zero96 = pub(P_LAD96), pub(P_ZERO96)
        row0, lastrow = pub(P_ROW0), pub(P_LASTROW)
        z, al, be, S = chal(0), chal(1), chal(2), chal(3)
        al2 = al * al
        al3 = al2 * al

        w = cur(C_W)
        nw = const(1) - w
        z0 = cur(C_Z0)
        exprs = []

        def bit(i):
            b = cur(i) - nxt(i) - nxt(i)
            return b * (b - const(1))

        tv1_32 = (cur(C_TVB1) - const(B95)) * const(B32)
        # tv1*tr0 - tv0*tr1 = (tvb1 - 2^95)*tr0 - (tvb0 - 2^95)*tr1
        ratio = (
            (cur(C_TVB1) - const(B95)) * cur(C_TR0)
            - (cur(C_TVB0) - const(B95)) * cur(C_TR1)
        )
        exprs += [
            breal * (w * (w - const(1))),
            breal * (z0 * (z0 - const(1))),
            # z0 = 1 iff tr0 == 0 (inverse witness), on the ratio path.
            breal * (nw * (z0 * cur(C_TR0))),
            breal * (nw * (z0 + cur(C_TR0) * cur(C_TR0INV) - const(1))),
            # Well-leveraged: d_well = tv1*2^32 - tr1 (>= 0 via ladder).
            breal * (w * (cur(C_SWELL) - (tv1_32 - cur(C_TR1)))),
            # Ratio path: d_ratio >= 0 via the 224-bit ladder.
            breal * (nw * (cur(C_SRATIO) - ratio)),
            # Zero-risk sub-case: tv0 <= tv1.
            breal * (z0 * (cur(C_STV) - (cur(C_TVB1) - cur(C_TVB0)))),
            # Well path consumes no initial status: leaf0/tvb0/tr0 pinned 0.
            breal * (w * cur(C_L0)),
            breal * (w * cur(C_TVB0)),
            breal * (w * cur(C_TR0)),
        ]
        exprs += [hold * (nxt(i) - cur(i)) for i in _HOLD_COLS]
        exprs += [
            lad128 * bit(C_SWELL), zero128 * cur(C_SWELL),
            lad224 * bit(C_SRATIO), zero224 * cur(C_SRATIO),
            lad96 * bit(C_STV), zero96 * cur(C_STV),
        ]
        t = {
            "s1": cur(C_L1) + al * cur(C_EPOCH) + al2 * cur(C_TVB1)
            + al3 * cur(C_TR1) + const(BETA_STATUS) * be,
            "s0": cur(C_L0) + al * cur(C_EPOCH) + al2 * cur(C_TVB0)
            + al3 * cur(C_TR0) + const(BETA_STATUS) * be,
            "ck": cur(C_L0) + al * cur(C_L1) + al2 * cur(C_EPOCH)
            + al3 * cur(C_W) + const(BETA_CHECK) * be,
        }
        exprs += [
            cur(C_IS1) * (z - t["s1"]) - breal,
            cur(C_IS0) * (z - t["s0"]) - breal * nw,
            cur(C_ICK) * (z - t["ck"]) - breal,
            (nxt(C_ACC) - cur(C_ACC) - cur(C_IS1) - cur(C_IS0) - cur(C_ICK)
             + lastrow * S),
            row0 * cur(C_ACC),
        ]
        return exprs

    def transition_divisors(self):
        return ["trans"] * (len(self._exprs) - 5) + ["all"] * 5
