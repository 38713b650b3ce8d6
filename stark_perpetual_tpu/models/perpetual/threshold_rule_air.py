"""Threshold-rule AIR: liquidate/deleverage solvency preconditions in-proof.

Companion of ``PositionStatusAir`` / ``TransitionRuleAir``: those prove
TV/TR totals and the state-transition rule; this AIR proves the three
remaining solvency *threshold* checks the engine guards with asserts:

  - **liquidatable** (kind 0, transactions/liquidate.cairo:99-124, the
    assert_250_bit trick on TR > TV*2^32): the liquidated position's
    funded snapshot must NOT be well-leveraged — proven by a 224-bit
    ladder on d = tr1 - (tvb1 - 2^95)*2^32 - 1 >= 0;
  - **deleveragable** (kind 1, transactions/deleverage.cairo:17-183,
    UNDELEVERAGABLE_POSITION): the deleveragable position's funded
    snapshot must have TV < 0 — a 96-bit ladder on
    d = 2^95 - 1 - tvb1 >= 0;
  - **fair deleverage** (kind 2, deleverage.cairo UNFAIR_DELEVERAGE
    maximality): initial_tv*updated_tr > (updated_tv - 2^32)*initial_tr,
    a 224-bit ladder on the cross-multiplied difference minus one (the
    exact system bounds |tv| < 2^95, tr < 2^128 keep it inside 224 bits).

Every referenced total is CONSUMED from the status-claims table by logUp
(BETA_STATUS tag shared with the status AIR's production side), so the
numbers compared here are exactly the ones ``PositionStatusAir`` proved
against pool-bound snapshots. The combined verifier splits the produced
status multiset between this AIR and ``TransitionRuleAir``
(prove.py: transition_claims + threshold_claims == status claims).

Public surface: the checks table [(kind, leaf0, leaf1, epoch, mult)] and
the consumed status-claims sub-multiset.
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

BETA_STATUS = 8  # shared with status_air's claims tag
BETA_THRESH = 10


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


@dataclass(frozen=True)
class ThresholdCheck:
    """One recorded threshold check (engine witness + public row).

    kind 0: liquidatable — primary (leaf1) = liquidated funded snapshot.
    kind 1: deleveragable — primary = deleveragable funded snapshot.
    kind 2: fair deleverage — leaf0 = deleveragable funded (initial),
            leaf1 = deleveragable updated.
    """

    kind: int
    leaf0: int  # 0 unless kind 2
    leaf1: int
    epoch: int
    tvb0: int  # tv0 + 2^95 (0 unless kind 2)
    tr0: int
    tvb1: int
    tr1: int


def thresholds_public_surface(checks: Sequence[ThresholdCheck]):
    """(checks table, consumed status-claims multiset) from the log."""
    tab: Dict[Tuple[int, int, int, int], int] = {}
    consumed: Dict[Tuple[int, int, int, int], int] = {}
    for c in checks:
        key = (c.kind, c.leaf0, c.leaf1, c.epoch)
        tab[key] = tab.get(key, 0) + 1
        consumed[(c.leaf1, c.epoch, c.tvb1, c.tr1)] = (
            consumed.get((c.leaf1, c.epoch, c.tvb1, c.tr1), 0) + 1
        )
        if c.kind == 2:
            consumed[(c.leaf0, c.epoch, c.tvb0, c.tr0)] = (
                consumed.get((c.leaf0, c.epoch, c.tvb0, c.tr0), 0) + 1
            )
    return (
        [k + (mu,) for k, mu in sorted(tab.items())],
        [k + (mu,) for k, mu in sorted(consumed.items())],
    )


# Main columns.
(C_L0, C_L1, C_EPOCH, C_TVB0, C_TR0, C_TVB1, C_TR1, C_K1, C_K2, C_D224,
 C_D96) = range(11)
# Interaction columns.
(C_IS1, C_IS0, C_ICK, C_ACC) = range(11, 15)
# Public columns.
(P_START, P_BREAL, P_HOLD, P_LAD224, P_ZERO224, P_LAD96, P_ZERO96, P_ROW0,
 P_LASTROW) = range(9)

_HOLD_COLS = (C_L0, C_L1, C_EPOCH, C_TVB0, C_TR0, C_TVB1, C_TR1, C_K1, C_K2)


class ThresholdRuleAir(DslAir, Air):
    """Witnessed threshold checks against the proven status claims."""

    n_columns = 11
    n_interaction_columns = 4
    n_interaction_challenges = 3
    n_derived_challenges = 1
    n_public_columns = 9
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
        for k, _l0, _l1, _ep, mu in self.checks_table:
            assert k in (0, 1, 2) and mu >= 0
        # Same system bounds as TransitionRuleAir: the 224-bit ladders are
        # sound only under |tv| < 2^95, tr < 2^128 (status.cairo:104-136).
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

    def trace(self, checks: Sequence[ThresholdCheck]) -> List[List[int]]:
        assert len(checks) == self.n_checks
        p = FIELD_PRIME
        n = self.n
        cols = [[0] * n for _ in range(self.n_columns)]
        for k, c in enumerate(checks):
            base = k * BLOCK
            tv1 = c.tvb1 - B95
            d224 = 0
            d96 = 0
            if c.kind == 0:
                d224 = c.tr1 - tv1 * B32 - 1
                if d224 < 0:
                    raise ValueError(f"not liquidatable: {c}")
            elif c.kind == 1:
                d96 = B95 - 1 - c.tvb1
                if d96 < 0:
                    raise ValueError(f"not deleveragable: {c}")
            else:
                tv0 = c.tvb0 - B95
                d224 = tv0 * c.tr1 - (tv1 - B32) * c.tr0 - 1
                if d224 < 0:
                    raise ValueError(f"unfair deleverage: {c}")
            vals = {
                C_L0: c.leaf0, C_L1: c.leaf1, C_EPOCH: c.epoch,
                C_TVB0: c.tvb0, C_TR0: c.tr0, C_TVB1: c.tvb1, C_TR1: c.tr1,
                C_K1: 1 if c.kind == 1 else 0, C_K2: 1 if c.kind == 2 else 0,
            }
            lad = {C_D224: d224, C_D96: d96}
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
        kcode = v[C_K1] + 2 * v[C_K2]
        return {
            "s1": (v[C_L1] + al * v[C_EPOCH] + al2 * v[C_TVB1]
                   + al3 * v[C_TR1] + BETA_STATUS * be) % p,
            "s0": (v[C_L0] + al * v[C_EPOCH] + al2 * v[C_TVB0]
                   + al3 * v[C_TR0] + BETA_STATUS * be) % p,
            "ck": (kcode + al * v[C_L0] + al2 * v[C_L1] + al3 * v[C_EPOCH]
                   + BETA_THRESH * be) % p,
        }

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        n = self.n
        invs = {k: [0] * n for k in ("s1", "s0", "ck")}
        acc = [0] * n
        for b in range(self.n_checks):
            base = b * BLOCK
            v = {i: main_columns[i][base] for i in range(9)}
            t = self._tuples(al, be, v)
            invs["s1"][base] = _inv(z - t["s1"])
            invs["ck"][base] = _inv(z - t["ck"])
            if v[C_K2]:
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
        for k, l0, l1, ep, mu in self.checks_table:
            S = (S + mu * _inv(
                z - (k + al * l0 + al2 * l1 + al3 * ep + BETA_THRESH * be)
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
        lad224, zero224 = pub(P_LAD224), pub(P_ZERO224)
        lad96, zero96 = pub(P_LAD96), pub(P_ZERO96)
        row0, lastrow = pub(P_ROW0), pub(P_LASTROW)
        z, al, be, S = chal(0), chal(1), chal(2), chal(3)
        al2 = al * al
        al3 = al2 * al

        k1 = cur(C_K1)
        k2 = cur(C_K2)
        kliq = const(1) - k1 - k2
        exprs = []

        def bit(i):
            b = cur(i) - nxt(i) - nxt(i)
            return b * (b - const(1))

        tv1 = cur(C_TVB1) - const(B95)
        tv0 = cur(C_TVB0) - const(B95)
        d_liq = cur(C_TR1) - tv1 * const(B32) - const(1)
        d_del = const(B95 - 1) - cur(C_TVB1)
        d_fair = tv0 * cur(C_TR1) - (tv1 - const(B32)) * cur(C_TR0) - const(1)
        exprs += [
            breal * (k1 * (k1 - const(1))),
            breal * (k2 * (k2 - const(1))),
            breal * (k1 * k2),
            # Ladder seeds per kind (masked; unused ladder stays free but
            # range-checked, which is harmless).
            breal * (kliq * (cur(C_D224) - d_liq)),
            breal * (k1 * (cur(C_D96) - d_del)),
            breal * (k2 * (cur(C_D224) - d_fair)),
            # Non-fair kinds consume no initial status: pinned zero.
            breal * ((const(1) - k2) * cur(C_L0)),
            breal * ((const(1) - k2) * cur(C_TVB0)),
            breal * ((const(1) - k2) * cur(C_TR0)),
        ]
        exprs += [hold * (nxt(i) - cur(i)) for i in _HOLD_COLS]
        exprs += [
            lad224 * bit(C_D224), zero224 * cur(C_D224),
            lad96 * bit(C_D96), zero96 * cur(C_D96),
        ]
        kcode = k1 + const(2) * k2
        t = {
            "s1": cur(C_L1) + al * cur(C_EPOCH) + al2 * cur(C_TVB1)
            + al3 * cur(C_TR1) + const(BETA_STATUS) * be,
            "s0": cur(C_L0) + al * cur(C_EPOCH) + al2 * cur(C_TVB0)
            + al3 * cur(C_TR0) + const(BETA_STATUS) * be,
            "ck": kcode + al * cur(C_L0) + al2 * cur(C_L1)
            + al3 * cur(C_EPOCH) + const(BETA_THRESH) * be,
        }
        exprs += [
            cur(C_IS1) * (z - t["s1"]) - breal,
            cur(C_IS0) * (z - t["s0"]) - breal * k2,
            cur(C_ICK) * (z - t["ck"]) - breal,
            (nxt(C_ACC) - cur(C_ACC) - cur(C_IS1) - cur(C_IS0) - cur(C_ICK)
             + lastrow * S),
            row0 * cur(C_ACC),
        ]
        return exprs

    def transition_divisors(self):
        return ["trans"] * (len(self._exprs) - 5) + ["all"] * 5
