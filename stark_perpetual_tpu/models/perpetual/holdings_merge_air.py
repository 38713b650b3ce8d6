"""Holdings-merge AIR: smaller-in-synthetic-holdings, in-proof.

Completes the transition-rule arithmetization (status_air.py +
transition_rule_air.py): ``check_smaller_in_synthetic_holdings``
(check_smaller_holdings.cairo:8-102) requires, for every ratio-path
transition check, that the updated position's synthetic holdings are a
same-sign, not-larger subset of the initial position's. This AIR proves
it by walking BOTH snapshots' Merkle-leaf hash chains simultaneously
(one pedersen-pool logUp lookup per consumed chain link — the same
proven pool as the status AIR) with a two-pointer merge:

  - a **match** block (op=1) consumes one asset word from each chain,
    proves the asset ids equal, decomposes both balances
    (sign/magnitude via 63-bit ladders) and proves same sign and
    |updated| <= |initial| via a magnitude-difference ladder;
  - a **skip** block (op=0) consumes one initial-chain word only (an
    initial asset the update zeroed out — allowed);
  - the **header** block (hd=1) closes both chains through their
    pubkey/final-word links to the two leaf hashes and consumes one
    ratio-path row of the public checks table (the same table the
    transition-rule AIR consumes), so the pair of sequences walked here
    IS the checked pair.

Soundness of the two-pointer without an order constraint: real position
preimages have unique sorted asset ids (bound by the leaf hashes the
checks table carries), so skipping an initial asset that actually
matches the next updated asset leaves that updated asset unmatchable
and the updated chain cannot complete — the walk only closes on valid
subsets.

Block layout: 128 rows; merge blocks for the interleaved walk, then one
header block, per ratio-path check. Pad blocks are dead (public `breal`).
"""

from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.models.constraint_dsl import DslAir, chal, const, cur, nxt, pub
from stark_perpetual_tpu.models.perpetual.status_air import (
    B16,
    B63,
    B64,
    B128,
    StatusRecord,
    snapshot_chain,
)
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
BETA_POOL = 5  # shared pedersen-pool tag
BETA_CHECK = 9  # shared checks-table tag (transition_rule_air)


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


def merge_blocks_for_check(rec0: StatusRecord, rec1: StatusRecord):
    """The match/skip step sequence for (initial=rec0, updated=rec1).

    Mirrors check_smaller_in_synthetic_holdings' two-pointer exactly;
    raises ValueError when the rule is violated (unbuildable witness).
    """
    upd = list(rec1.assets)
    ini = list(rec0.assets)
    steps = []
    ui = 0
    for aid_i, bal_i, idx_i in ini:
        if ui < len(upd) and upd[ui][0] == aid_i:
            aid_u, bal_u, idx_u = upd[ui]
            if bal_u * bal_i < 0:
                raise ValueError("holdings sign flip")
            if abs(bal_u) > abs(bal_i):
                raise ValueError("holdings enlarged")
            steps.append(("match", (aid_u, bal_u, idx_u), (aid_i, bal_i, idx_i)))
            ui += 1
        else:
            steps.append(("skip", None, (aid_i, bal_i, idx_i)))
    if ui != len(upd):
        raise ValueError("updated asset not present initially")
    return steps


def merge_public_surface(pairs: Sequence[Tuple[StatusRecord, StatusRecord]]):
    """(pool table, ratio-path checks table) for the merge AIR.

    pairs: [(initial_rec, updated_rec)] in check order. The checks table
    rows are (leaf0, leaf1, epoch, 0, mult) — the w=0 subset of
    transition_rule_air's table (host cross-checked for equality).
    """
    pool: Dict[Tuple[int, int, int], int] = {}
    checks: Dict[Tuple[int, int, int, int], int] = {}
    for rec0, rec1 in pairs:
        rows0, leaf0 = snapshot_chain(rec0)
        rows1, leaf1 = snapshot_chain(rec1)
        for row in rows0 + rows1:
            pool[row] = pool.get(row, 0) + 1
        key = (leaf0, leaf1, rec1.epoch, 0)
        checks[key] = checks.get(key, 0) + 1
    return (
        [k + (mu,) for k, mu in sorted(pool.items())],
        [k + (mu,) for k, mu in sorted(checks.items())],
    )


# Main columns.
(C_HD, C_OP, C_AUIN, C_WU, C_AUOUT, C_AIIN, C_WI, C_AIOUT, C_FWU, C_LEAF1,
 C_FWI, C_LEAF0, C_EPOCH, C_SU, C_SI, C_SAIDU, C_SAIDI, C_SIXU, C_SIXI,
 C_SBAU, C_SBAI, C_SABSU, C_SABSI, C_SD) = range(24)
# Interaction columns.
(C_IPU, C_IPI, C_IQU, C_IQI, C_ICK, C_ACC) = range(24, 30)
# Public columns.
(P_START, P_BREAL, P_BINT, P_HOLD, P_LAD64, P_ZERO64, P_LAD63, P_ZERO63,
 P_LAD120, P_ZERO120, P_ROW0, P_LASTROW) = range(12)

_HOLD_COLS = (C_HD, C_OP, C_AUIN, C_WU, C_AUOUT, C_AIIN, C_WI, C_AIOUT,
              C_FWU, C_LEAF1, C_FWI, C_LEAF0, C_EPOCH, C_SU, C_SI)
_LAD64_COLS = (C_SIXU, C_SIXI, C_SBAU, C_SBAI)
_LAD63_COLS = (C_SABSU, C_SABSI, C_SD)
_LAD120_COLS = (C_SAIDU, C_SAIDI)


class HoldingsMergeAir(DslAir, Air):
    """Witnessed two-pointer holdings merge against public tables."""

    n_columns = 24
    n_interaction_columns = 6
    n_interaction_challenges = 3
    n_derived_challenges = 1
    n_public_columns = 12
    transition_degree = 4

    def __init__(
        self,
        pool_claims: Sequence[Tuple[int, int, int, int]],
        checks_table: Sequence[Tuple[int, int, int, int, int]],
        n_blocks: int,
    ):
        assert n_blocks >= 1
        self.pool_claims = [tuple(c) for c in pool_claims]
        self.checks_table = [tuple(c) for c in checks_table]
        for _l0, _l1, _ep, w, mu in self.checks_table:
            assert w == 0 and mu >= 0
        self.n_blocks = n_blocks
        m = 1
        while m < max(2, n_blocks):
            m *= 2
        self.m = m
        self.n = BLOCK * m
        self._exprs = self._build_exprs()

    # --- witness ----------------------------------------------------------

    def trace(self, pairs: Sequence[Tuple[StatusRecord, StatusRecord]]):
        p = FIELD_PRIME
        cols = [[0] * self.n for _ in range(self.n_columns)]
        blocks = []
        for rec0, rec1 in pairs:
            steps = merge_blocks_for_check(rec0, rec1)
            rows0, leaf0 = snapshot_chain(rec0)
            rows1, leaf1 = snapshot_chain(rec1)
            acc_u = 0
            acc_i = 0
            ui = 0
            ii = 0
            for kind, u, i in steps:
                aid_i, bal_i, idx_i = i
                wi = aid_i * B128 + (idx_i + B63) * B64 + (bal_i + B63)
                ai_out = rows0[ii][2]
                v = dict(
                    hd=0, op=0, au_in=acc_u, wu=0, au_out=acc_u,
                    ai_in=acc_i, wi=wi, ai_out=ai_out, fwu=0, leaf1=0,
                    fwi=0, leaf0=0, epoch=rec1.epoch, su=0,
                    si=1 if bal_i < 0 else 0,
                    s_aidu=0, s_aidi=aid_i, s_ixu=0, s_ixi=idx_i + B63,
                    s_bau=0, s_bai=bal_i + B63, s_absu=0, s_absi=abs(bal_i),
                    s_d=abs(bal_i),
                )
                if kind == "match":
                    aid_u, bal_u, idx_u = u
                    wu = aid_u * B128 + (idx_u + B63) * B64 + (bal_u + B63)
                    v.update(
                        op=1, wu=wu, au_out=rows1[ui][2],
                        su=1 if bal_u < 0 else 0,
                        s_aidu=aid_u, s_ixu=idx_u + B63, s_bau=bal_u + B63,
                        s_absu=abs(bal_u), s_d=abs(bal_i) - abs(bal_u),
                    )
                    ui += 1
                ii += 1
                blocks.append(v)
                acc_u = v["au_out"]
                acc_i = ai_out
            # Header: close both chains (pubkey + final word links).
            blocks.append(
                dict(
                    hd=1, op=0, au_in=acc_u, wu=rec1.public_key,
                    au_out=rows1[-2][2], ai_in=acc_i, wi=rec0.public_key,
                    ai_out=rows0[-2][2],
                    fwu=(rec1.collateral_balance + B63) * B16 + len(rec1.assets),
                    leaf1=leaf1,
                    fwi=(rec0.collateral_balance + B63) * B16 + len(rec0.assets),
                    leaf0=leaf0, epoch=rec1.epoch, su=0, si=0,
                    s_aidu=0, s_aidi=0, s_ixu=0, s_ixi=0, s_bau=0, s_bai=0,
                    s_absu=0, s_absi=0, s_d=0,
                )
            )
        assert len(blocks) == self.n_blocks, (len(blocks), self.n_blocks)
        names = ("hd", "op", "au_in", "wu", "au_out", "ai_in", "wi",
                 "ai_out", "fwu", "leaf1", "fwi", "leaf0", "epoch", "su", "si")
        ladders = ("s_aidu", "s_aidi", "s_ixu", "s_ixi", "s_bau", "s_bai",
                   "s_absu", "s_absi", "s_d")
        for b, v in enumerate(blocks):
            base = b * BLOCK
            lv = {nm: v[nm] for nm in ladders}
            for r in range(BLOCK):
                for ci, nm in enumerate(names):
                    cols[ci][base + r] = v[nm] % p
                for off, nm in enumerate(ladders):
                    cols[15 + off][base + r] = lv[nm] % p
                    lv[nm] >>= 1
        return cols

    # --- interaction ------------------------------------------------------

    def _tuples(self, al, be, v):
        p = FIELD_PRIME
        al2 = al * al % p
        al3 = al2 * al % p
        return {
            "pu": (v["au_in"] + al * v["wu"] + al2 * v["au_out"]
                   + BETA_POOL * be) % p,
            "pi": (v["ai_in"] + al * v["wi"] + al2 * v["ai_out"]
                   + BETA_POOL * be) % p,
            "qu": (v["au_out"] + al * v["fwu"] + al2 * v["leaf1"]
                   + BETA_POOL * be) % p,
            "qi": (v["ai_out"] + al * v["fwi"] + al2 * v["leaf0"]
                   + BETA_POOL * be) % p,
            "ck": (v["leaf0"] + al * v["leaf1"] + al2 * v["epoch"]
                   + BETA_CHECK * be) % p,
        }

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        invs = {k: [0] * self.n for k in ("pu", "pi", "qu", "qi", "ck")}
        acc = [0] * self.n
        names = ("hd", "op", "au_in", "wu", "au_out", "ai_in", "wi",
                 "ai_out", "fwu", "leaf1", "fwi", "leaf0", "epoch")
        for b in range(self.n_blocks):
            base = b * BLOCK
            v = {nm: main_columns[ci][base] for ci, nm in enumerate(names)}
            t = self._tuples(al, be, v)
            if v["op"] or v["hd"]:
                invs["pu"][base] = _inv(z - t["pu"])
            invs["pi"][base] = _inv(z - t["pi"])
            if v["hd"]:
                invs["qu"][base] = _inv(z - t["qu"])
                invs["qi"][base] = _inv(z - t["qi"])
                invs["ck"][base] = _inv(z - t["ck"])
        total = 0
        for r in range(self.n - 1):
            total = (total + invs["pu"][r] + invs["pi"][r] + invs["qu"][r]
                     + invs["qi"][r] + invs["ck"][r]) % p
            acc[r + 1] = total
        return [invs["pu"], invs["pi"], invs["qu"], invs["qi"], invs["ck"], acc]

    def derived_challenges(self, challenges):
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        S = 0
        for a, b, h, mu in self.pool_claims:
            S = (S + mu * _inv(z - (a + al * b + al2 * h + BETA_POOL * be))) % p
        for l0, l1, ep, _w, mu in self.checks_table:
            S = (S + mu * _inv(
                z - (l0 + al * l1 + al2 * ep + BETA_CHECK * be)
            )) % p
        return [S]

    # --- public columns ---------------------------------------------------

    def _selectors(self):
        n, m = self.n, self.m
        c = {i: [0] * n for i in range(self.n_public_columns)}
        for k in range(m):
            base = k * BLOCK
            c[P_START][base] = 1
            if k < self.n_blocks:
                c[P_BREAL][base] = 1
            if k < self.n_blocks - 1:
                c[P_BINT][base + BLOCK - 1] = 1
            for r in range(BLOCK - 1):
                c[P_HOLD][base + r] = 1
            for r in range(64):
                c[P_LAD64][base + r] = 1
            for r in range(64, BLOCK):
                c[P_ZERO64][base + r] = 1
            for r in range(63):
                c[P_LAD63][base + r] = 1
            for r in range(63, BLOCK):
                c[P_ZERO63][base + r] = 1
            for r in range(120):
                c[P_LAD120][base + r] = 1
            for r in range(120, BLOCK):
                c[P_ZERO120][base + r] = 1
        c[P_ROW0][0] = 1
        c[P_LASTROW][n - 1] = 1
        return c

    def public_columns(self):
        c = self._selectors()
        return [c[i] for i in range(self.n_public_columns)]

    def public_inputs(self):
        out = [self.n_blocks, self.m]
        for row in self.pool_claims:
            out += [v % FIELD_PRIME for v in row]
        out.append(FIELD_PRIME - 1)
        for row in self.checks_table:
            out += [v % FIELD_PRIME for v in row]
        return out

    # --- constraints ------------------------------------------------------

    def _build_exprs(self):
        breal, bint = pub(P_BREAL), pub(P_BINT)
        hold = pub(P_HOLD)
        lad64, zero64 = pub(P_LAD64), pub(P_ZERO64)
        lad63, zero63 = pub(P_LAD63), pub(P_ZERO63)
        lad120, zero120 = pub(P_LAD120), pub(P_ZERO120)
        row0, lastrow = pub(P_ROW0), pub(P_LASTROW)
        z, al, be, S = chal(0), chal(1), chal(2), chal(3)
        al2 = al * al

        hd = cur(C_HD)
        nh = const(1) - hd
        op = cur(C_OP)

        def bit(i):
            b = cur(i) - nxt(i) - nxt(i)
            return b * (b - const(1))

        exprs = [
            breal * (hd * (hd - const(1))),
            breal * (op * (op - const(1))),
            breal * (hd * op),  # header is not a merge step
            # Updated-chain word decomposition + semantics on match.
            breal * (op * (
                cur(C_WU)
                - (cur(C_SAIDU) * const(B128) + cur(C_SIXU) * const(B64)
                   + cur(C_SBAU))
            )),
            breal * (op * (cur(C_SAIDU) - cur(C_SAIDI))),
            breal * (op * (cur(C_SU) * (cur(C_SU) - const(1)))),
            breal * (op * (
                cur(C_SBAU) - const(B63)
                - (const(1) - const(2) * cur(C_SU)) * cur(C_SABSU)
            )),
            breal * (op * (cur(C_SU) - cur(C_SI))),  # same sign
            breal * (op * (cur(C_SD) - (cur(C_SABSI) - cur(C_SABSU)))),
            # Skip: the updated chain does not advance.
            breal * (nh * ((const(1) - op) * (cur(C_AUOUT) - cur(C_AUIN)))),
            # Initial-chain word decomposition on every merge block.
            breal * (nh * (
                cur(C_WI)
                - (cur(C_SAIDI) * const(B128) + cur(C_SIXI) * const(B64)
                   + cur(C_SBAI))
            )),
            breal * (nh * (cur(C_SI) * (cur(C_SI) - const(1)))),
            breal * (nh * (
                cur(C_SBAI) - const(B63)
                - (const(1) - const(2) * cur(C_SI)) * cur(C_SABSI)
            )),
        ]
        exprs += [hold * (nxt(i) - cur(i)) for i in _HOLD_COLS]
        exprs += [
            bint * (nh * (nxt(C_AUIN) - cur(C_AUOUT))),
            bint * (nh * (nxt(C_AIIN) - cur(C_AIOUT))),
            bint * (nh * (nxt(C_EPOCH) - cur(C_EPOCH))),
            bint * (hd * nxt(C_AUIN)),
            bint * (hd * nxt(C_AIIN)),
            row0 * cur(C_AUIN),
            row0 * cur(C_AIIN),
        ]
        exprs += [lad64 * bit(i) for i in _LAD64_COLS]
        exprs += [zero64 * cur(i) for i in _LAD64_COLS]
        exprs += [lad63 * bit(i) for i in _LAD63_COLS]
        exprs += [zero63 * cur(i) for i in _LAD63_COLS]
        exprs += [lad120 * bit(i) for i in _LAD120_COLS]
        exprs += [zero120 * cur(i) for i in _LAD120_COLS]
        t_pu = cur(C_AUIN) + al * cur(C_WU) + al2 * cur(C_AUOUT) + const(BETA_POOL) * be
        t_pi = cur(C_AIIN) + al * cur(C_WI) + al2 * cur(C_AIOUT) + const(BETA_POOL) * be
        t_qu = cur(C_AUOUT) + al * cur(C_FWU) + al2 * cur(C_LEAF1) + const(BETA_POOL) * be
        t_qi = cur(C_AIOUT) + al * cur(C_FWI) + al2 * cur(C_LEAF0) + const(BETA_POOL) * be
        t_ck = cur(C_LEAF0) + al * cur(C_LEAF1) + al2 * cur(C_EPOCH) + const(BETA_CHECK) * be
        exprs += [
            cur(C_IPU) * (z - t_pu) - breal * (op + hd),
            cur(C_IPI) * (z - t_pi) - breal,
            cur(C_IQU) * (z - t_qu) - breal * hd,
            cur(C_IQI) * (z - t_qi) - breal * hd,
            cur(C_ICK) * (z - t_ck) - breal * hd,
            (nxt(C_ACC) - cur(C_ACC) - cur(C_IPU) - cur(C_IPI) - cur(C_IQU)
             - cur(C_IQI) - cur(C_ICK) + lastrow * S),
            row0 * cur(C_ACC),
        ]
        return exprs

    def transition_divisors(self):
        return ["trans"] * (len(self._exprs) - 7) + ["all"] * 7
