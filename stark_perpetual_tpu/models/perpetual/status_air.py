"""Position-status AIR: TV/TR solvency totals as proven claims.

Fourth business-logic AIR of the full-run arithmetization. The reference
computes each position's total value / total risk and enforces the
transition rule inside the proof (position/status.cairo:24-152,
position/validate_state_transition.cairo:20-94); until now this framework
checked those rules only in the host engine. This AIR proves, per recorded
status evaluation:

  - **snapshot binding**: the position snapshot is walked through its
    Merkle-leaf hash chain (position/hash.cairo:22-74) with one
    pedersen-pool logUp lookup per chain link — the same proven pool the
    batch's builtin proof covers — so the asset words, public key and
    final word this AIR prices ARE the preimage of the claimed leaf hash;
  - **asset-word decomposition** (hash.cairo:22-40): each packed word is
    split as asset_id*2^128 + (idx+2^63)*2^64 + (bal+2^63) with
    120/64/64-bit range ladders, and the balance's sign/magnitude via a
    63-bit ladder;
  - **risk-factor segments** (definitions/general_config.cairo:48-85):
    the witnessed segment's membership prev_upper < amount <= upper is
    proven with two 128-bit ladders, with (asset, bounds, risk) looked up
    in the public risk table (the config's step function);
  - **TV/TR accumulation** (status.cairo:84-152): running sums
    tv += price*balance (signed via the sign bit) and
    tr += price*|balance|*risk across the snapshot's asset blocks, with
    prices looked up in the public per-epoch price table;
  - **total bounds** (status.cairo:104-136): tv in (-2^95, 2^95) via a
    biased 96-bit ladder and tr < 2^128 via a 128-bit ladder — the
    OUT_OF_RANGE_TOTAL_VALUE / OUT_OF_RANGE_TOTAL_RISK checks;
  - **claims production**: each snapshot's header block emits one row of
    the public status-claims table (leaf_hash, epoch, tv+2^95, tr) via a
    produced-side logUp — consumers (the transition-rule AIR, liquidate /
    deleverage checks) can then consume proven totals by leaf hash.

Block layout: 128 rows per block; one block per snapshot asset plus one
header block per snapshot (hd=1). Chain/total accumulators flow across
block boundaries and reset after each header. Pad blocks (up to the
power-of-two block count) are dead: every semantic constraint is masked
by the public `breal` row-0 selector.

The engine-side witness is recorded by position.record_status_checks()
around check_valid_transition (position.py), keyed to price epochs by
first appearance of each oracle-price regime.
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.models.constraint_dsl import DslAir, chal, const, cur, nxt, pub
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
B16 = 1 << 16
B32 = 1 << 32
B63 = 1 << 63
B64 = 1 << 64
B95 = 1 << 95
B128 = 1 << 128

BETA_POOL = 5  # shared with order_link_air's pedersen-pool tag
BETA_PRICE = 6
BETA_RISK = 7
BETA_STATUS = 8


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


@dataclass(frozen=True)
class StatusRecord:
    """One status evaluation (engine witness): position snapshot + epoch."""

    public_key: int
    collateral_balance: int
    assets: Tuple[Tuple[int, int, int], ...]  # (asset_id, balance, cached_idx)
    epoch: int
    prices: Tuple[Tuple[int, int], ...]  # (asset_id, price) at this epoch


def _snapshot_words(rec: StatusRecord) -> Tuple[List[int], int, int]:
    """Packed chain words (hash.cairo:22-74 encoding)."""
    packed = []
    for aid, bal, idx in rec.assets:
        packed.append(aid * B128 + (idx + B63) * B64 + (bal + B63))
    fw = (rec.collateral_balance + B63) * B16 + len(rec.assets)
    return packed, rec.public_key, fw


def snapshot_chain(rec: StatusRecord) -> Tuple[List[Tuple[int, int, int]], int]:
    """The snapshot's full pedersen chain [(a, b, h)...] and its leaf hash."""
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash

    packed, pubkey, fw = _snapshot_words(rec)
    rows = []
    acc = 0
    for w in packed:
        h = fast_pedersen_hash(acc, w)
        rows.append((acc, w, h))
        acc = h
    h2 = fast_pedersen_hash(acc, pubkey)
    rows.append((acc, pubkey, h2))
    leaf = fast_pedersen_hash(h2, fw)
    rows.append((h2, fw, leaf))
    return rows, leaf


def _risk_segment(config, aid: int, amount: int) -> Tuple[int, int, int]:
    """(prev_upper (p-1 for the first segment), upper, risk) containing
    `amount` (general_config.cairo:48-85 semantics)."""
    info = config.synthetic_info(aid)
    assert info is not None, f"no synthetic info for {aid:#x}"
    prev = FIELD_PRIME - 1  # acts as -1: amount - prev - 1 == amount
    for seg in info.risk_factor_segments:
        if amount <= seg.upper_bound:
            return prev, seg.upper_bound, seg.risk
        prev = seg.upper_bound
    raise AssertionError("amount above final risk segment")


def status_public_surface(records: Sequence[StatusRecord], config):
    """(pool, price, risk, status) claims tables with multiplicities."""
    pool: Dict[Tuple[int, int, int], int] = {}
    price_t: Dict[Tuple[int, int, int], int] = {}
    risk_t: Dict[Tuple[int, int, int, int], int] = {}
    status_t: Dict[Tuple[int, int, int, int], int] = {}
    rb_only = 1 if config.is_risk_by_balance_only else 0
    for rec in records:
        rows, leaf = snapshot_chain(rec)
        for row in rows:
            pool[row] = pool.get(row, 0) + 1
        prices = dict(rec.prices)
        tv = rec.collateral_balance * B32
        tr = 0
        for aid, bal, _idx in rec.assets:
            price = prices[aid]
            a = abs(bal)
            amount = a if rb_only else a * price
            lo, hi, risk = _risk_segment(config, aid, amount)
            price_t[(rec.epoch, aid, price)] = price_t.get((rec.epoch, aid, price), 0) + 1
            risk_t[(aid, lo, hi, risk)] = risk_t.get((aid, lo, hi, risk), 0) + 1
            tv += price * bal
            tr += price * a * risk
        key = (leaf, rec.epoch, tv + B95, tr)
        status_t[key] = status_t.get(key, 0) + 1
    return (
        [k + (mu,) for k, mu in sorted(pool.items())],
        [k + (mu,) for k, mu in sorted(price_t.items())],
        [k + (mu,) for k, mu in sorted(risk_t.items())],
        [k + (mu,) for k, mu in sorted(status_t.items())],
    )


# Main column indices.
(C_HD, C_EPOCH, C_AIN, C_W, C_AOUT, C_FW, C_LEAF, C_TVS, C_TRS, C_PRICE,
 C_RISK, C_SGN, C_SEGL, C_SEGU, C_SBALB, C_SIDXB, C_SAID, C_SABS, C_SDLO,
 C_SDHI, C_SCOLB, C_SNA, C_STVB, C_STR, C_TVD, C_TRD, C_PA) = range(27)
# Interaction column indices (after main).
(C_IP1, C_IP2, C_IPR, C_IRK, C_ICL, C_ACC) = range(27, 33)
# Public column indices.
(P_START, P_BREAL, P_BINT, P_HOLD, P_LAD64, P_ZERO64, P_LAD63, P_ZERO63,
 P_LAD120, P_ZERO120, P_LAD127, P_BIT127, P_LAD96, P_ZERO96, P_LAD16,
 P_ZERO16, P_ROW0, P_LASTROW) = range(18)

_HOLD_COLS = (C_HD, C_EPOCH, C_AIN, C_W, C_AOUT, C_FW, C_LEAF, C_TVS,
              C_TRS, C_PRICE, C_RISK, C_SGN, C_SEGL, C_SEGU, C_TVD, C_TRD,
              C_PA)
_LAD64_COLS = (C_SBALB, C_SIDXB, C_SCOLB)
_LAD128_COLS = (C_SDLO, C_SDHI, C_STR)


class PositionStatusAir(DslAir, Air):
    """Witnessed status evaluations against public claims tables."""

    n_columns = 27
    n_interaction_columns = 6
    n_interaction_challenges = 3
    n_derived_challenges = 1
    n_public_columns = 18
    transition_degree = 4

    def __init__(
        self,
        pool_claims: Sequence[Tuple[int, int, int, int]],
        price_claims: Sequence[Tuple[int, int, int, int]],
        risk_claims: Sequence[Tuple[int, int, int, int, int]],
        status_claims: Sequence[Tuple[int, int, int, int, int]],
        n_blocks: int,
        is_risk_by_balance_only: int,
    ):
        assert n_blocks >= 1
        self.pool_claims = [tuple(c) for c in pool_claims]
        self.price_claims = [tuple(c) for c in price_claims]
        self.risk_claims = [tuple(c) for c in risk_claims]
        self.status_claims = [tuple(c) for c in status_claims]
        for _leaf, _ep, tvb, tr, mu in self.status_claims:
            assert 0 <= tvb < (1 << 96) and 0 <= tr < B128 and mu >= 0
        # Range-check the lookup tables so no in-trace product can wrap
        # mod p: price < 2^64 keeps price*|bal| < 2^127 (the dlo/dhi
        # ladders then witness genuine integer inequalities) and
        # risk < 2^32 keeps price*|bal|*risk < 2^159 (constants.cairo:9-58
        # bounds; ADVICE r4). The lower sentinel p-1 acts as -1.
        for _ep, _aid, price, mu in self.price_claims:
            assert 0 < price < B64 and mu >= 0
        for _aid, lo, hi, risk, mu in self.risk_claims:
            assert lo == FIELD_PRIME - 1 or 0 <= lo < B128
            assert 0 <= hi < B128 and 0 < risk < B32 and mu >= 0
        self.n_blocks = n_blocks
        self.rb_only = 1 if is_risk_by_balance_only else 0
        m = 1
        while m < max(2, n_blocks):
            m *= 2
        self.m = m
        self.n = BLOCK * m
        self._exprs = self._build_exprs()

    # --- witness ----------------------------------------------------------

    def trace(self, records: Sequence[StatusRecord], config) -> List[List[int]]:
        p = FIELD_PRIME
        n = self.n
        cols = [[0] * n for _ in range(self.n_columns)]
        blocks = []  # list of per-block dicts of row-0 values
        for rec in records:
            prices = dict(rec.prices)
            rows, leaf = snapshot_chain(rec)
            acc = 0
            tvs = 0
            trs = 0
            for k, (aid, bal, idx) in enumerate(rec.assets):
                price = prices[aid]
                a = abs(bal)
                amount = a if self.rb_only else a * price
                lo, hi, risk = _risk_segment(config, aid, amount)
                w = aid * B128 + (idx + B63) * B64 + (bal + B63)
                blocks.append(
                    dict(
                        hd=0, epoch=rec.epoch, a_in=acc, w=w, a_out=rows[k][2],
                        fw=0, leaf=0, tvs=tvs % p, trs=trs, price=price,
                        risk=risk, sgn=1 if bal < 0 else 0, segl=lo, segu=hi,
                        s_balb=bal + B63, s_idxb=idx + B63, s_aid=aid,
                        s_abs=a, s_dlo=(amount - lo - 1) % p,
                        s_dhi=hi - amount, s_colb=0, s_na=0, s_tvb=0, s_tr=0,
                        tvd=(price * bal) % p, trd=price * a * risk,
                        pa=price * a,
                    )
                )
                acc = rows[k][2]
                tvs += price * bal
                trs += price * a * risk
            packed, pubkey, fw = _snapshot_words(rec)
            tv = rec.collateral_balance * B32 + tvs
            assert -B95 < tv < B95, "total value out of range"
            assert 0 <= trs < B128, "total risk out of range"
            blocks.append(
                dict(
                    hd=1, epoch=rec.epoch, a_in=acc, w=pubkey,
                    a_out=rows[-2][2], fw=fw, leaf=leaf, tvs=tvs % p,
                    trs=trs, price=0, risk=0, sgn=0, segl=0, segu=0,
                    s_balb=0, s_idxb=0, s_aid=0, s_abs=0, s_dlo=0, s_dhi=0,
                    s_colb=rec.collateral_balance + B63,
                    s_na=len(rec.assets), s_tvb=tv + B95, s_tr=trs,
                    tvd=0, trd=0, pa=0,
                )
            )
        assert len(blocks) == self.n_blocks, (len(blocks), self.n_blocks)

        names = ("hd", "epoch", "a_in", "w", "a_out", "fw", "leaf", "tvs",
                 "trs", "price", "risk", "sgn", "segl", "segu")
        extra = {"tvd": C_TVD, "trd": C_TRD, "pa": C_PA}
        ladders = ("s_balb", "s_idxb", "s_aid", "s_abs", "s_dlo", "s_dhi",
                   "s_colb", "s_na", "s_tvb", "s_tr")
        for b, v in enumerate(blocks):
            base = b * BLOCK
            for i in range(BLOCK):
                for ci, nm in enumerate(names):
                    cols[ci][base + i] = v[nm] % p
                for nm, ci in extra.items():
                    cols[ci][base + i] = v[nm] % p
            lv = {nm: v[nm] for nm in ladders}
            for i in range(BLOCK):
                for off, nm in enumerate(ladders):
                    cols[14 + off][base + i] = lv[nm] % p
                    lv[nm] = lv[nm] >> 1
        return cols

    # --- interaction ------------------------------------------------------

    def _tuples(self, al, be, v):
        p = FIELD_PRIME
        al2 = al * al % p
        al3 = al2 * al % p
        return {
            "p1": (v["a_in"] + al * v["w"] + al2 * v["a_out"] + BETA_POOL * be) % p,
            "p2": (v["a_out"] + al * v["fw"] + al2 * v["leaf"] + BETA_POOL * be) % p,
            "pr": (v["epoch"] + al * v["s_aid"] + al2 * v["price"]
                   + BETA_PRICE * be) % p,
            "rk": (v["s_aid"] + al * v["segl"] + al2 * v["segu"]
                   + al3 * v["risk"] + BETA_RISK * be) % p,
            "cl": (v["leaf"] + al * v["epoch"] + al2 * v["s_tvb"]
                   + al3 * v["s_tr"] + BETA_STATUS * be) % p,
        }

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        n = self.n
        invs = {k: [0] * n for k in ("p1", "p2", "pr", "rk", "cl")}
        acc = [0] * n
        for b in range(self.n_blocks):
            base = b * BLOCK
            v = {
                "hd": main_columns[C_HD][base],
                "epoch": main_columns[C_EPOCH][base],
                "a_in": main_columns[C_AIN][base],
                "w": main_columns[C_W][base],
                "a_out": main_columns[C_AOUT][base],
                "fw": main_columns[C_FW][base],
                "leaf": main_columns[C_LEAF][base],
                "price": main_columns[C_PRICE][base],
                "risk": main_columns[C_RISK][base],
                "segl": main_columns[C_SEGL][base],
                "segu": main_columns[C_SEGU][base],
                "s_aid": main_columns[C_SAID][base],
                "s_tvb": main_columns[C_STVB][base],
                "s_tr": main_columns[C_STR][base],
            }
            t = self._tuples(al, be, v)
            hd = v["hd"]
            invs["p1"][base] = _inv(z - t["p1"])
            if hd:
                invs["p2"][base] = _inv(z - t["p2"])
                invs["cl"][base] = _inv(z - t["cl"])
            else:
                invs["pr"][base] = _inv(z - t["pr"])
                invs["rk"][base] = _inv(z - t["rk"])
        total = 0
        for r in range(n - 1):
            total = (
                total
                + invs["p1"][r] + invs["p2"][r] + invs["pr"][r] + invs["rk"][r]
                - invs["cl"][r]
            ) % p
            acc[r + 1] = total
        return [invs["p1"], invs["p2"], invs["pr"], invs["rk"], invs["cl"], acc]

    def derived_challenges(self, challenges):
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        al3 = al2 * al % p
        S = 0
        for a, b, h, mu in self.pool_claims:
            S = (S + mu * _inv(z - (a + al * b + al2 * h + BETA_POOL * be))) % p
        for ep, aid, pr, mu in self.price_claims:
            S = (S + mu * _inv(z - (ep + al * aid + al2 * pr + BETA_PRICE * be))) % p
        for aid, lo, hi, rk, mu in self.risk_claims:
            S = (S + mu * _inv(
                z - (aid + al * lo + al2 * hi + al3 * rk + BETA_RISK * be)
            )) % p
        for leaf, ep, tvb, tr, mu in self.status_claims:
            S = (S - mu * _inv(
                z - (leaf + al * ep + al2 * tvb + al3 * tr + BETA_STATUS * be)
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
            for i in range(BLOCK - 1):
                c[P_HOLD][base + i] = 1
                c[P_LAD127][base + i] = 1
            c[P_BIT127][base + BLOCK - 1] = 1
            for i in range(64):
                c[P_LAD64][base + i] = 1
            for i in range(64, BLOCK):
                c[P_ZERO64][base + i] = 1
            for i in range(63):
                c[P_LAD63][base + i] = 1
            for i in range(63, BLOCK):
                c[P_ZERO63][base + i] = 1
            for i in range(120):
                c[P_LAD120][base + i] = 1
            for i in range(120, BLOCK):
                c[P_ZERO120][base + i] = 1
            for i in range(96):
                c[P_LAD96][base + i] = 1
            for i in range(96, BLOCK):
                c[P_ZERO96][base + i] = 1
            for i in range(16):
                c[P_LAD16][base + i] = 1
            for i in range(16, BLOCK):
                c[P_ZERO16][base + i] = 1
        c[P_ROW0][0] = 1
        c[P_LASTROW][n - 1] = 1
        return c

    def public_columns(self):
        c = self._selectors()
        return [c[i] for i in range(self.n_public_columns)]

    def public_inputs(self):
        out = [self.n_blocks, self.m, self.rb_only]
        for table, sep in (
            (self.pool_claims, 1),
            (self.price_claims, 2),
            (self.risk_claims, 3),
            (self.status_claims, 4),
        ):
            for row in table:
                out += [v % FIELD_PRIME for v in row]
            out.append(FIELD_PRIME - sep)
        return out

    # --- constraints ------------------------------------------------------

    def _build_exprs(self):
        start, breal, bint = pub(P_START), pub(P_BREAL), pub(P_BINT)
        hold = pub(P_HOLD)
        lad64, zero64 = pub(P_LAD64), pub(P_ZERO64)
        lad63, zero63 = pub(P_LAD63), pub(P_ZERO63)
        lad120, zero120 = pub(P_LAD120), pub(P_ZERO120)
        lad127, bit127 = pub(P_LAD127), pub(P_BIT127)
        lad96, zero96 = pub(P_LAD96), pub(P_ZERO96)
        lad16, zero16 = pub(P_LAD16), pub(P_ZERO16)
        row0, lastrow = pub(P_ROW0), pub(P_LASTROW)
        z, al, be, S = chal(0), chal(1), chal(2), chal(3)
        al2 = al * al
        al3 = al2 * al

        hd = cur(C_HD)
        nh = const(1) - hd
        exprs = []

        def bit(i):
            b = cur(i) - nxt(i) - nxt(i)
            return b * (b - const(1))

        # Row-0 semantics. `pa` carries price*|bal| so every seeded
        # product stays within transition degree 4.
        amount = cur(C_SABS) if self.rb_only else cur(C_PA)
        exprs += [
            breal * (hd * (hd - const(1))),
            breal * (cur(C_SGN) * (cur(C_SGN) - const(1))),
            # w decomposition (asset blocks).
            breal * (nh * (
                cur(C_W)
                - (cur(C_SAID) * const(B128) + cur(C_SIDXB) * const(B64)
                   + cur(C_SBALB))
            )),
            # bal = balb - 2^63 = (1 - 2 sgn) * abs.
            breal * (nh * (
                cur(C_SBALB) - const(B63)
                - (const(1) - const(2) * cur(C_SGN)) * cur(C_SABS)
            )),
            # Segment membership ladders' seeds.
            breal * (nh * (cur(C_SDLO) - (amount - cur(C_SEGL) - const(1)))),
            breal * (nh * (cur(C_SDHI) - (cur(C_SEGU) - amount))),
            # Header: final word decomposition and totals.
            breal * (hd * (
                cur(C_FW) - (cur(C_SCOLB) * const(B16) + cur(C_SNA))
            )),
            breal * (hd * (
                cur(C_STVB)
                - (cur(C_TVS) + (cur(C_SCOLB) - const(B63)) * const(B32)
                   + const(B95))
            )),
            breal * (hd * (cur(C_STR) - cur(C_TRS))),
            # Per-asset contribution columns (keep boundary degree <= 4).
            breal * (nh * (cur(C_PA) - cur(C_PRICE) * cur(C_SABS))),
            breal * (nh * (
                cur(C_TVD)
                - (const(1) - const(2) * cur(C_SGN)) * cur(C_PA)
            )),
            breal * (nh * (cur(C_TRD) - cur(C_PA) * cur(C_RISK))),
        ]
        # Hold: value columns constant inside a block.
        exprs += [hold * (nxt(i) - cur(i)) for i in _HOLD_COLS]
        # Block boundaries (bint is row BLOCK-1 of blocks 0..n_blocks-2).
        exprs += [
            bint * (nh * (nxt(C_AIN) - cur(C_AOUT))),
            bint * (nh * (nxt(C_EPOCH) - cur(C_EPOCH))),
            bint * (nh * (nxt(C_TVS) - cur(C_TVS) - cur(C_TVD))),
            bint * (nh * (nxt(C_TRS) - cur(C_TRS) - cur(C_TRD))),
            bint * (hd * nxt(C_AIN)),
            bint * (hd * nxt(C_TVS)),
            bint * (hd * nxt(C_TRS)),
            row0 * cur(C_AIN),
            row0 * cur(C_TVS),
            row0 * cur(C_TRS),
        ]
        # Range ladders.
        exprs += [lad64 * bit(i) for i in _LAD64_COLS]
        exprs += [zero64 * cur(i) for i in _LAD64_COLS]
        exprs += [
            lad63 * bit(C_SABS), zero63 * cur(C_SABS),
            lad120 * bit(C_SAID), zero120 * cur(C_SAID),
            lad96 * bit(C_STVB), zero96 * cur(C_STVB),
            lad16 * bit(C_SNA), zero16 * cur(C_SNA),
            lad64 * bit(C_SIDXB), zero64 * cur(C_SIDXB),
        ]
        exprs += [lad127 * bit(i) for i in _LAD128_COLS]
        exprs += [bit127 * (cur(i) * (cur(i) - const(1))) for i in _LAD128_COLS]
        # Buses.
        t_p1 = cur(C_AIN) + al * cur(C_W) + al2 * cur(C_AOUT) + const(BETA_POOL) * be
        t_p2 = cur(C_AOUT) + al * cur(C_FW) + al2 * cur(C_LEAF) + const(BETA_POOL) * be
        t_pr = (cur(C_EPOCH) + al * cur(C_SAID) + al2 * cur(C_PRICE)
                + const(BETA_PRICE) * be)
        t_rk = (cur(C_SAID) + al * cur(C_SEGL) + al2 * cur(C_SEGU)
                + al3 * cur(C_RISK) + const(BETA_RISK) * be)
        t_cl = (cur(C_LEAF) + al * cur(C_EPOCH) + al2 * cur(C_STVB)
                + al3 * cur(C_STR) + const(BETA_STATUS) * be)
        exprs += [
            cur(C_IP1) * (z - t_p1) - breal,
            cur(C_IP2) * (z - t_p2) - breal * hd,
            cur(C_IPR) * (z - t_pr) - breal * nh,
            cur(C_IRK) * (z - t_rk) - breal * nh,
            cur(C_ICL) * (z - t_cl) - breal * hd,
            (nxt(C_ACC) - cur(C_ACC) - cur(C_IP1) - cur(C_IP2) - cur(C_IPR)
             - cur(C_IRK) + cur(C_ICL) + lastrow * S),
            row0 * cur(C_ACC),
        ]
        self._n_trans = len(exprs) - 2  # bus acc + row0 acc are 'all'
        return exprs

    def transition_divisors(self):
        n_bus = 7
        return ["trans"] * (len(self._exprs) - n_bus) + ["all"] * n_bus
