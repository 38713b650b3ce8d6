"""Limit-order execution link AIR: fairness, ranges, deltas, message binding.

Third business-logic AIR of the full-run arithmetization (after the
fulfillment and position buses). One 128-row block per limit-order
execution (transactions/execute_limit_order.cairo:37-156) proves, in-trace:

  - **order-id extraction** (order/order.cairo:23-59): the consumed order id
    is the top 64 bits of the 251-bit message hash, via the decomposition
    msg = oid*2^187 + rhi*2^94 + rlo with 64/93/94-bit range ladders.
  - **fairness** (order/validate_limit_order.cairo:25-77): the fee ratio
    actual_fee*amount_collateral <= amount_fee*actual_collateral and the
    buy/sell assets-ratio strict inequalities, as 128-bit range ladders on
    the (always-nonnegative for an honest execution) differences, with the
    reference's actual_collateral == 0 buy-side early-return reproduced by
    an inverse-witnessed zero flag.
  - **amount windows** (execute_limit_order.cairo:49-76): 1 <= C < 2^64,
    0 <= fee limit/actuals < 2^64, 1 <= s < 2^64, plus F < 2^64 and
    nonce/expiration < 2^32 (order/order.cairo:148-153).
  - **delta production** (execute_limit_order.cairo:93-150): the collateral,
    synthetic and fee position deltas are algebraically tied to the actuals
    (buy: -c - fee / +s; sell: +c - fee / -s; fee position: +fee), and the
    fee position is proven distinct from the trader position.
  - **message-field binding**: four logUp lookups per execution into the
    public pedersen-pool table (a, b, h) — the batch's proven hash
    obligations — walk the order's hash chain
    (order/limit_order.cairo:24-52 -> signature_message_hashes.cairo:56-91):
        h1 = h(asset_sell, asset_buy); h2 = h(h1, collateral_asset);
        h3 = h(h2, w0); msg = h(h3, w1)
    with w0/w1 reconstructed in-trace from the SAME columns the fairness
    and delta constraints use (amounts selected by the buy flag, fee
    limit, nonce, position id, expiration — the packed words of the
    exchange with-fee format). The verifier cross-checks every referenced
    pool row against the pooled pedersen-builtin proof, so the order
    fields this AIR ties to position deltas ARE the signed ones.

  logUp buses bind every block to the public tables:
  - each execution consumes one row of the fulfillment claims table
    (msg, order_id, full_amount) — the SAME table (same multiplicities)
    the FulfillmentBusAir proves its accesses against and the verifier
    cross-links to the ECDSA pool, so the fill amounts here are the signed
    ones;
  - each execution produces three rows of the produced-updates table
    (pid, tag, aid, kcode=0, delta) in exactly PositionBusAir's update-
    claims encoding; the verifier checks this multiset is contained in the
    position AIR's public update table, so trade-driven position deltas
    stop being free public inputs.
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
B32 = 1 << 32
B64 = 1 << 64
B94 = 1 << 94
B187 = 1 << 187
# w1 = (3*2^192 + pid*(2^128 + 2^64 + 1)) * 2^49 + exp * 2^17
W1_CONST = 3 << 241
W1_PID = ((1 << 128) + (1 << 64) + 1) << 49
W1_EXP = 1 << 17
# w0 = amount_sell*2^160 + amount_buy*2^96 + fee_limit*2^32 + nonce
W0_SELL = 1 << 160
W0_BUY = 1 << 96
W0_FEE = 1 << 32

BETA_FC = 3  # fulfillment-claims tag (mirrors fulfillment_air.BETA_SIG)
BETA_UPD = 4  # produced-updates tag (mirrors position_bus_air.BETA_UPD)
BETA_POOL = 5  # pedersen-pool lookup tag


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


@dataclass(frozen=True)
class OrderExecRecord:
    """One limit-order execution (the engine's witness for this AIR)."""

    message_hash: int
    order_id: int
    amount_synthetic: int  # F: the signed full amount
    amount_collateral: int  # C
    amount_fee: int  # Phi
    is_buying: int  # beta
    actual_synthetic: int  # s
    actual_collateral: int  # c
    actual_fee: int  # fee paid
    position_id: int
    asset_id_synthetic: int
    fee_position_id: int
    # Message-binding fields (the remaining signed order fields).
    nonce: int = 0
    expiration_timestamp: int = 0
    asset_id_collateral: int = 0

    def packed_words(self) -> Tuple[int, int]:
        if self.is_buying:
            amt_sell, amt_buy = self.amount_collateral, self.amount_synthetic
        else:
            amt_sell, amt_buy = self.amount_synthetic, self.amount_collateral
        w0 = amt_sell * W0_SELL + amt_buy * W0_BUY + self.amount_fee * W0_FEE + self.nonce
        w1 = W1_CONST + self.position_id * W1_PID + self.expiration_timestamp * W1_EXP
        return w0, w1

    def hash_chain(self) -> List[Tuple[int, int, int]]:
        """The four (a, b, h) Pedersen calls of the order's message hash
        (order/limit_order.cairo:24-52 onto the exchange with-fee format,
        signature_message_hashes.cairo:56-91)."""
        from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash

        if self.is_buying:
            asel, abuy = self.asset_id_collateral, self.asset_id_synthetic
        else:
            asel, abuy = self.asset_id_synthetic, self.asset_id_collateral
        w0, w1 = self.packed_words()
        h1 = fast_pedersen_hash(asel, abuy)
        h2 = fast_pedersen_hash(h1, self.asset_id_collateral)
        h3 = fast_pedersen_hash(h2, w0)
        msg = fast_pedersen_hash(h3, w1)
        return [
            (asel, abuy, h1),
            (h1, self.asset_id_collateral, h2),
            (h2, w0, h3),
            (h3, w1, msg),
        ]


def order_link_public_surface(records: Sequence[OrderExecRecord]):
    """(fc_claims, upd_claims, pool_claims) from the execution log.

    fc_claims: [(msg, order_id, full_amount, mult)] — must equal the
    fulfillment AIR's claims table (host cross-check).
    upd_claims: [(pid, tag, aid, 0, operand, mult)] — the trade-produced
    subset of the position AIR's update claims.
    pool_claims: [(a, b, h, mult)] — the referenced pedersen-pool rows of
    the orders' message-hash chains (each row must appear in the batch's
    pooled pedersen-builtin obligations).
    """
    fc: Dict[Tuple[int, int, int], int] = {}
    upd: Dict[Tuple[int, int, int, int, int], int] = {}
    pool: Dict[Tuple[int, int, int], int] = {}
    for r in records:
        key = (r.message_hash, r.order_id, r.amount_synthetic)
        fc[key] = fc.get(key, 0) + 1
        if r.is_buying:
            cd = -r.actual_collateral - r.actual_fee
            sd = r.actual_synthetic
        else:
            cd = r.actual_collateral - r.actual_fee
            sd = -r.actual_synthetic
        for k in (
            (r.fee_position_id, 0, 0, 0, r.actual_fee % FIELD_PRIME),
            (r.position_id, 0, 0, 0, cd % FIELD_PRIME),
            (r.position_id, 1, r.asset_id_synthetic, 0, sd % FIELD_PRIME),
        ):
            upd[k] = upd.get(k, 0) + 1
        for row in r.hash_chain():
            pool[row] = pool.get(row, 0) + 1
    fc_claims = [k + (mu,) for k, mu in sorted(fc.items())]
    upd_claims = [k + (mu,) for k, mu in sorted(upd.items())]
    pool_claims = [k + (mu,) for k, mu in sorted(pool.items())]
    return fc_claims, upd_claims, pool_claims


class OrderLinkAir(Air):
    """Witnessed limit-order executions against public claims tables.

    Main columns (37):
      0 msg  1 oid  2 pid  3 aid  4 F  5 C  6 Phi  7 beta  8 s  9 c
      10 phi  11 cinv  12 zc  13 gam  14 cd  15 sd  16..21 64-bit ladders
      (C-1, Phi, s-1, c, phi, F)  22 sD1  23 sD2 (128-bit fairness ladders)
      24 sRlo (94b)  25 sRhi (93b)  26 sOid (64b)  27 dinv (pid != feepid)
      28 nonce  29 expv  30 h1  31 h2  32 h3  33 w0  34 w1
      35 snon  36 sexp (32-bit ladders)
    Interaction columns (9): inv_fc inv_f1..3 inv_h1..4 acc.
    Challenges: z, alpha, beta_ch (drawn) + S (derived claims grand sum).
    """

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 37
    n_interaction_columns = 9
    n_interaction_challenges = 3
    n_derived_challenges = 1
    transition_degree = 4

    def __init__(
        self,
        fc_claims: Sequence[Tuple[int, int, int, int]],
        upd_claims: Sequence[Tuple[int, int, int, int, int, int]],
        pool_claims: Sequence[Tuple[int, int, int, int]],
        fee_position_id: int,
        collateral_asset_id: int,
        n_execs: int,
    ):
        assert n_execs >= 1
        for _msg, _oid, ful, mu in fc_claims:
            assert 0 <= ful < B64 and mu >= 0
        for _pid, tag, aid, kcode, _op, mu in upd_claims:
            assert tag in (0, 1) and kcode == 0 and mu >= 0
            assert (tag == 1) or (aid == 0)
        for _a, _b, _h, mu in pool_claims:
            assert mu >= 0
        self.fc_claims = [tuple(c) for c in fc_claims]
        self.upd_claims = [tuple(c) for c in upd_claims]
        self.pool_claims = [tuple(c) for c in pool_claims]
        self.fee_position_id = fee_position_id
        self.collateral_asset_id = collateral_asset_id
        self.n_execs = n_execs
        m = 1
        while m < max(2, n_execs):
            m *= 2
        self.m = m
        self.n = BLOCK * m

    # --- witness ------------------------------------------------------------

    def trace(self, records: Sequence[OrderExecRecord]) -> List[List[int]]:
        assert len(records) == self.n_execs
        p = FIELD_PRIME
        n = self.n
        cols = [[0] * n for _ in range(self.n_columns)]
        (msg_c, oid_c, pid_c, aid_c, F_c, C_c, Phi_c, beta_c, s_c, c_c,
         phi_c, cinv_c, zc_c, gam_c, cd_c, sd_c, sC_c, sPhi_c, ss_c, sc_c,
         sphi_c, sF_c, sD1_c, sD2_c, sRlo_c, sRhi_c, sOid_c, dinv_c,
         non_c, exp_c, h1_c, h2_c, h3_c, w0_c, w1_c, snon_c, sexp_c) = cols
        for k, r in enumerate(records):
            base = k * BLOCK
            msg, oid = r.message_hash, r.order_id
            F, C, Phi = r.amount_synthetic, r.amount_collateral, r.amount_fee
            beta, s, c, phi = r.is_buying, r.actual_synthetic, r.actual_collateral, r.actual_fee
            if not (oid == msg >> 187 and 0 <= oid < B64):
                raise ValueError(f"order id does not match message hash: {r}")
            if not (1 <= C < B64 and 0 <= Phi < B64 and 0 <= F < B64):
                raise ValueError(f"order amounts out of range: {r}")
            if not (1 <= s < B64 and 0 <= c < B64 and 0 <= phi < B64):
                raise ValueError(f"actual amounts out of range: {r}")
            if not (0 <= r.nonce < B32 and 0 <= r.expiration_timestamp < B32):
                raise ValueError(f"nonce/expiration out of range: {r}")
            if r.asset_id_collateral != self.collateral_asset_id:
                raise ValueError("order collateral asset != config collateral")
            chain = r.hash_chain()
            if chain[-1][2] != msg:
                raise ValueError(f"message hash does not match order fields: {r}")
            d1 = Phi * c - phi * C
            if d1 < 0:
                raise ValueError(f"fee fairness violated: {r}")
            zc = 1 if c == 0 else 0
            if beta:
                d2 = 0 if zc else C * s - (c - 1) * F - 1
            else:
                d2 = F * (c + 1) - s * C - 1
            if d2 < 0:
                raise ValueError(f"assets-ratio fairness violated: {r}")
            cd = (-c - phi if beta else c - phi) % p
            sd = (s if beta else -s) % p
            if r.position_id == r.fee_position_id:
                raise ValueError("trader position is the fee position")
            rest = msg - (oid << 187)
            rlo, rhi = rest % B94, rest // B94
            w0, w1 = r.packed_words()
            sC, sPhi, ss, sc_, sphi, sF = C - 1, Phi, s - 1, c, phi, F
            sD1, sD2, sRlo, sRhi, sOid = d1, d2, rlo, rhi, oid
            snon, sexp = r.nonce, r.expiration_timestamp
            for i in range(BLOCK):
                msg_c[base + i] = msg
                oid_c[base + i] = oid
                pid_c[base + i] = r.position_id
                aid_c[base + i] = r.asset_id_synthetic
                F_c[base + i], C_c[base + i], Phi_c[base + i] = F, C, Phi
                beta_c[base + i] = beta
                s_c[base + i], c_c[base + i], phi_c[base + i] = s, c, phi
                cinv_c[base + i] = _inv(c) if c else 0
                zc_c[base + i] = zc
                gam_c[base + i] = beta * (1 - zc)
                cd_c[base + i], sd_c[base + i] = cd, sd
                dinv_c[base + i] = _inv(r.position_id - r.fee_position_id)
                non_c[base + i] = r.nonce
                exp_c[base + i] = r.expiration_timestamp
                h1_c[base + i] = chain[0][2]
                h2_c[base + i] = chain[1][2]
                h3_c[base + i] = chain[2][2]
                w0_c[base + i] = w0 % p
                w1_c[base + i] = w1 % p
                sC_c[base + i], sPhi_c[base + i], ss_c[base + i] = sC, sPhi, ss
                sc_c[base + i], sphi_c[base + i], sF_c[base + i] = sc_, sphi, sF
                sD1_c[base + i], sD2_c[base + i] = sD1, sD2
                sRlo_c[base + i], sRhi_c[base + i] = sRlo, sRhi
                sOid_c[base + i] = sOid
                snon_c[base + i], sexp_c[base + i] = snon, sexp
                sC, sPhi, ss = sC >> 1, sPhi >> 1, ss >> 1
                sc_, sphi, sF = sc_ >> 1, sphi >> 1, sF >> 1
                sD1, sD2 = sD1 >> 1, sD2 >> 1
                sRlo, sRhi, sOid = sRlo >> 1, sRhi >> 1, sOid >> 1
                snon, sexp = snon >> 1, sexp >> 1
        return cols

    # --- interaction phase ----------------------------------------------------

    def _row_tuples(self, al, be, v):
        """All eight lookup tuples at a block's row 0 (host ints).

        v: dict of row-0 column values.
        """
        p = FIELD_PRIME
        al2 = al * al % p
        al4 = al2 * al2 % p
        beta, acoll = v["beta"], self.collateral_asset_id
        asel = (beta * acoll + (1 - beta) * v["aid"]) % p
        abuy = (beta * v["aid"] + (1 - beta) * acoll) % p
        return {
            "fc": (v["msg"] + al * v["oid"] + al2 * v["F"] + BETA_FC * be) % p,
            "f1": (self.fee_position_id + al4 * v["phi"] + BETA_UPD * be) % p,
            "f2": (v["pid"] + al4 * v["cd"] + BETA_UPD * be) % p,
            "f3": (v["pid"] + al + al2 * v["aid"] + al4 * v["sd"]
                   + BETA_UPD * be) % p,
            "h1": (asel + al * abuy + al2 * v["h1"] + BETA_POOL * be) % p,
            "h2": (v["h1"] + al * acoll + al2 * v["h2"] + BETA_POOL * be) % p,
            "h3": (v["h2"] + al * v["w0"] + al2 * v["h3"] + BETA_POOL * be) % p,
            "h4": (v["h3"] + al * v["w1"] + al2 * v["msg"] + BETA_POOL * be) % p,
        }

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        names = ("msg", "oid", "pid", "aid", "F", "C", "Phi", "beta", "s",
                 "c", "phi", "cinv", "zc", "gam", "cd", "sd")
        n = self.n
        invs = {k: [0] * n for k in ("fc", "f1", "f2", "f3", "h1", "h2", "h3", "h4")}
        acc = [0] * n
        for k in range(self.n_execs):
            b = k * BLOCK
            v = {nm: main_columns[i][b] for i, nm in enumerate(names)}
            v["h1"] = main_columns[30][b]
            v["h2"] = main_columns[31][b]
            v["h3"] = main_columns[32][b]
            v["w0"] = main_columns[33][b]
            v["w1"] = main_columns[34][b]
            tups = self._row_tuples(al, be, v)
            for key, t in tups.items():
                invs[key][b] = _inv(z - t)
        total = 0
        for r in range(n - 1):
            total = (
                total
                + invs["fc"][r] + invs["h1"][r] + invs["h2"][r]
                + invs["h3"][r] + invs["h4"][r]
                - invs["f1"][r] - invs["f2"][r] - invs["f3"][r]
            ) % p
            acc[r + 1] = total
        return [invs["fc"], invs["f1"], invs["f2"], invs["f3"],
                invs["h1"], invs["h2"], invs["h3"], invs["h4"], acc]

    def derived_challenges(self, challenges):
        """S = sum_fc mu/(z - t_fc) + sum_pool mu/(z - t_pool)
             - sum_upd mu/(z - t_upd) over the public tables; the trace-side
        bus sums must hit exactly this value."""
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        al4 = al2 * al2 % p
        S = 0
        for msg, oid, ful, mu in self.fc_claims:
            S = (S + mu * _inv(z - (msg + al * oid + al2 * ful + BETA_FC * be))) % p
        for a, b, h, mu in self.pool_claims:
            S = (S + mu * _inv(z - (a + al * b + al2 * h + BETA_POOL * be))) % p
        for pid, tag, aid, _kc, op, mu in self.upd_claims:
            S = (S - mu * _inv(
                z - (pid + al * tag + al2 * aid + al4 * op + BETA_UPD * be)
            )) % p
        return [S]

    # --- public columns ---------------------------------------------------------

    _PUB_ORDER = (
        "start", "breal", "hold", "lad64", "zero64", "lad93", "zero93",
        "lad94", "zero94", "lad127", "bit127", "lad32", "zero32t", "row0",
        "lastrow", "feepid", "acoll",
    )

    def _selectors(self):
        n, m = self.n, self.m
        cols = {name: [0] * n for name in self._PUB_ORDER}
        for k in range(m):
            base = k * BLOCK
            cols["start"][base] = 1
            if k < self.n_execs:
                cols["breal"][base] = 1
                cols["feepid"][base] = self.fee_position_id
                cols["acoll"][base] = self.collateral_asset_id
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            for i in range(64):
                cols["lad64"][base + i] = 1
            for i in range(64, BLOCK):
                cols["zero64"][base + i] = 1
            for i in range(93):
                cols["lad93"][base + i] = 1
            for i in range(93, BLOCK):
                cols["zero93"][base + i] = 1
            for i in range(94):
                cols["lad94"][base + i] = 1
            for i in range(94, BLOCK):
                cols["zero94"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["lad127"][base + i] = 1
            cols["bit127"][base + BLOCK - 1] = 1
            for i in range(32):
                cols["lad32"][base + i] = 1
            for i in range(32, BLOCK):
                cols["zero32t"][base + i] = 1
        cols["row0"][0] = 1
        cols["lastrow"][n - 1] = 1
        return cols

    def public_columns(self):
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self):
        out = [self.n_execs, self.m, self.fee_position_id, self.collateral_asset_id]
        for c in self.fc_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 1)  # separator
        for c in self.upd_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 2)
        for c in self.pool_claims:
            out += [v % FIELD_PRIME for v in c]
        return out

    def transition_divisors(self):
        return ["trans"] * 73 + ["all"] * 10

    # --- constraints (host ints, verifier) -------------------------------------

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        p = FIELD_PRIME
        (msg, oid, pid, aid, F, C, Phi, beta, s, c, phi, cinv, zc, gam, cd,
         sd, sC, sPhi, ss, sc_, sphi, sF, sD1, sD2, sRlo, sRhi, sOid, dinv,
         non, expv, h1, h2, h3, w0, w1, snon, sexp,
         inv_fc, inv_f1, inv_f2, inv_f3, inv_h1, inv_h2, inv_h3, inv_h4,
         acc) = cur_vals
        (msg_n, oid_n, pid_n, aid_n, F_n, C_n, Phi_n, beta_n, s_n, c_n,
         phi_n, cinv_n, zc_n, gam_n, cd_n, sd_n, sC_n, sPhi_n, ss_n, sc_n,
         sphi_n, sF_n, sD1_n, sD2_n, sRlo_n, sRhi_n, sOid_n, _dinv_n,
         non_n, exp_n, h1_n, h2_n, h3_n, w0_n, w1_n, snon_n, sexp_n,
         _ifc_n, _if1_n, _if2_n, _if3_n, _ih1_n, _ih2_n, _ih3_n, _ih4_n,
         acc_n) = nxt_vals
        if pub_vals:
            (start, breal, hold, lad64, zero64, lad93, zero93, lad94,
             zero94, lad127, bit127, lad32, zero32t, row0, lastrow, feepid,
             acoll) = pub_vals
        else:  # constraint-count probe
            start = breal = hold = lad64 = zero64 = lad93 = zero93 = 0
            lad94 = zero94 = lad127 = bit127 = lad32 = zero32t = 0
            row0 = lastrow = feepid = acoll = 0
        z, al, be, S = chal_vals
        al2 = al * al % p
        al4 = al2 * al2 % p

        asel = (beta * acoll + (1 - beta) * aid) % p
        abuy = (beta * aid + (1 - beta) * acoll) % p
        t_fc = (msg + al * oid + al2 * F + BETA_FC * be) % p
        t_f1 = (feepid + al4 * phi + BETA_UPD * be) % p
        t_f2 = (pid + al4 * cd + BETA_UPD * be) % p
        t_f3 = (pid + al + al2 * aid + al4 * sd + BETA_UPD * be) % p
        t_h1 = (asel + al * abuy + al2 * h1 + BETA_POOL * be) % p
        t_h2 = (h1 + al * acoll + al2 * h2 + BETA_POOL * be) % p
        t_h3 = (h2 + al * w0 + al2 * h3 + BETA_POOL * be) % p
        t_h4 = (h3 + al * w1 + al2 * msg + BETA_POOL * be) % p
        msel = (beta * C + (1 - beta) * F) % p
        mbuy = (beta * F + (1 - beta) * C) % p

        def bit(sfx, sfx_n):
            b = (sfx - 2 * sfx_n) % p
            return b * (b - 1) % p

        return [
            # --- row-0 semantics (trans) ------------------------------------
            breal * beta % p * (beta - 1) % p,                       # C1
            breal * zc % p * (zc - 1) % p,                           # C2
            breal * zc % p * c % p,                                  # C3
            breal * (zc + c * cinv - 1) % p,                         # C4
            start * (gam - beta * (1 - zc)) % p,                     # C5
            breal * (sC - (C - 1)) % p,                              # C6
            breal * (sPhi - Phi) % p,                                # C7
            breal * (ss - (s - 1)) % p,                              # C8
            breal * (sc_ - c) % p,                                   # C9
            breal * (sphi - phi) % p,                                # C10
            breal * (sF - F) % p,                                    # C11
            breal * (sOid - oid) % p,                                # C12
            breal * (msg - oid * B187 - sRhi * B94 - sRlo) % p,      # C13
            breal * (sD1 - (Phi * c - phi * C)) % p,                 # C14
            breal * gam % p * (sD2 - (C * s - (c - 1) * F - 1)) % p, # C15
            breal * (1 - beta) % p * (sD2 - (F * (c + 1) - s * C - 1)) % p,  # C16
            breal * (beta - gam) % p * sD2 % p,                      # C17
            breal * (cd - (c - 2 * beta * c - phi)) % p,             # C18
            breal * (sd - (2 * beta - 1) * s) % p,                   # C19
            breal * ((pid - feepid) * dinv - 1) % p,                 # C20
            breal * (w0 - (msel * W0_SELL + mbuy * W0_BUY
                           + Phi * W0_FEE + non)) % p,               # C21
            breal * (w1 - (W1_CONST + pid * W1_PID + expv * W1_EXP)) % p,  # C22
            breal * (snon - non) % p,                                # C23
            breal * (sexp - expv) % p,                               # C24
            # --- hold: value columns constant inside a block ------------------
            hold * (msg_n - msg) % p,                                # H1
            hold * (oid_n - oid) % p,
            hold * (pid_n - pid) % p,
            hold * (aid_n - aid) % p,
            hold * (F_n - F) % p,
            hold * (C_n - C) % p,
            hold * (Phi_n - Phi) % p,
            hold * (beta_n - beta) % p,
            hold * (s_n - s) % p,
            hold * (c_n - c) % p,
            hold * (phi_n - phi) % p,
            hold * (cinv_n - cinv) % p,
            hold * (zc_n - zc) % p,
            hold * (gam_n - gam) % p,
            hold * (cd_n - cd) % p,
            hold * (sd_n - sd) % p,
            hold * (non_n - non) % p,
            hold * (exp_n - expv) % p,
            hold * (h1_n - h1) % p,
            hold * (h2_n - h2) % p,
            hold * (h3_n - h3) % p,
            hold * (w0_n - w0) % p,
            hold * (w1_n - w1) % p,                                  # H23
            # --- range ladders ------------------------------------------------
            lad64 * bit(sC, sC_n) % p,                               # L1
            lad64 * bit(sPhi, sPhi_n) % p,
            lad64 * bit(ss, ss_n) % p,
            lad64 * bit(sc_, sc_n) % p,
            lad64 * bit(sphi, sphi_n) % p,
            lad64 * bit(sF, sF_n) % p,
            lad64 * bit(sOid, sOid_n) % p,                           # L7
            zero64 * sC % p,
            zero64 * sPhi % p,
            zero64 * ss % p,
            zero64 * sc_ % p,
            zero64 * sphi % p,
            zero64 * sF % p,
            zero64 * sOid % p,                                       # L14
            lad127 * bit(sD1, sD1_n) % p,                            # L15
            lad127 * bit(sD2, sD2_n) % p,                            # L16
            bit127 * sD1 % p * (sD1 - 1) % p,                        # L17
            bit127 * sD2 % p * (sD2 - 1) % p,                        # L18
            lad94 * bit(sRlo, sRlo_n) % p,                           # L19
            zero94 * sRlo % p,                                       # L20
            lad93 * bit(sRhi, sRhi_n) % p,                           # L21
            zero93 * sRhi % p,                                       # L22
            lad32 * bit(snon, snon_n) % p,                           # L23
            lad32 * bit(sexp, sexp_n) % p,                           # L24
            zero32t * snon % p,                                      # L25
            zero32t * sexp % p,                                      # L26
            # --- buses (all) ----------------------------------------------------
            (inv_fc * ((z - t_fc) % p) - breal) % p,                 # I1
            (inv_f1 * ((z - t_f1) % p) - breal) % p,                 # I2
            (inv_f2 * ((z - t_f2) % p) - breal) % p,                 # I3
            (inv_f3 * ((z - t_f3) % p) - breal) % p,                 # I4
            (inv_h1 * ((z - t_h1) % p) - breal) % p,                 # I5
            (inv_h2 * ((z - t_h2) % p) - breal) % p,                 # I6
            (inv_h3 * ((z - t_h3) % p) - breal) % p,                 # I7
            (inv_h4 * ((z - t_h4) % p) - breal) % p,                 # I8
            (acc_n - acc - inv_fc - inv_h1 - inv_h2 - inv_h3 - inv_h4
             + inv_f1 + inv_f2 + inv_f3 + lastrow * S) % p,          # I9
            row0 * acc % p,                                          # I10
        ]

    # --- constraints (device, Montgomery domain) ----------------------------------

    def eval_transitions_chal(self, f, cur, nxt, pub, chal):
        import jax.numpy as jnp

        p = FIELD_PRIME
        (msg, oid, pid, aid, F, C, Phi, beta, s, c, phi, cinv, zc, gam, cd,
         sd, sC, sPhi, ss, sc_, sphi, sF, sD1, sD2, sRlo, sRhi, sOid, dinv,
         non, expv, h1, h2, h3, w0, w1, snon, sexp,
         inv_fc, inv_f1, inv_f2, inv_f3, inv_h1, inv_h2, inv_h3, inv_h4,
         acc) = cur
        (msg_n, oid_n, pid_n, aid_n, F_n, C_n, Phi_n, beta_n, s_n, c_n,
         phi_n, cinv_n, zc_n, gam_n, cd_n, sd_n, sC_n, sPhi_n, ss_n, sc_n,
         sphi_n, sF_n, sD1_n, sD2_n, sRlo_n, sRhi_n, sOid_n, _dinv_n,
         non_n, exp_n, h1_n, h2_n, h3_n, w0_n, w1_n, snon_n, sexp_n,
         _ifc_n, _if1_n, _if2_n, _if3_n, _ih1_n, _ih2_n, _ih3_n, _ih4_n,
         acc_n) = nxt
        (start, breal, hold, lad64, zero64, lad93, zero93, lad94, zero94,
         lad127, bit127, lad32, zero32t, row0, lastrow, feepid, acoll) = pub
        z_c, al_c, be_c, S_c = (jnp.broadcast_to(x, msg.shape) for x in chal)

        def bc(v):
            return jnp.broadcast_to(jnp.asarray(f.pack((v << 252) % p)), msg.shape)

        one = bc(1)
        two = bc(2)
        mul = f.mont_mul
        sub = f.sub
        add = f.add

        al2 = mul(al_c, al_c)
        al4 = mul(al2, al2)
        nbeta = sub(one, beta)
        asel = add(mul(beta, acoll), mul(nbeta, aid))
        abuy = add(mul(beta, aid), mul(nbeta, acoll))
        msel = add(mul(beta, C), mul(nbeta, F))
        mbuy = add(mul(beta, F), mul(nbeta, C))
        t_fc = add(msg, add(mul(al_c, oid), add(mul(al2, F), mul(be_c, bc(BETA_FC)))))
        t_f1 = add(feepid, add(mul(al4, phi), mul(be_c, bc(BETA_UPD))))
        t_f2 = add(pid, add(mul(al4, cd), mul(be_c, bc(BETA_UPD))))
        t_f3 = add(
            pid,
            add(al_c, add(mul(al2, aid), add(mul(al4, sd), mul(be_c, bc(BETA_UPD))))),
        )
        be_pool = mul(be_c, bc(BETA_POOL))
        t_h1 = add(asel, add(mul(al_c, abuy), add(mul(al2, h1), be_pool)))
        t_h2 = add(h1, add(mul(al_c, acoll), add(mul(al2, h2), be_pool)))
        t_h3 = add(h2, add(mul(al_c, w0), add(mul(al2, h3), be_pool)))
        t_h4 = add(h3, add(mul(al_c, w1), add(mul(al2, msg), be_pool)))

        def bit(sfx, sfx_n):
            b = sub(sfx, add(sfx_n, sfx_n))
            return mul(b, sub(b, one))

        return [
            mul(breal, mul(beta, sub(beta, one))),                    # C1
            mul(breal, mul(zc, sub(zc, one))),                        # C2
            mul(breal, mul(zc, c)),                                   # C3
            mul(breal, sub(add(zc, mul(c, cinv)), one)),              # C4
            mul(start, sub(gam, mul(beta, sub(one, zc)))),            # C5
            mul(breal, sub(sC, sub(C, one))),                         # C6
            mul(breal, sub(sPhi, Phi)),                               # C7
            mul(breal, sub(ss, sub(s, one))),                         # C8
            mul(breal, sub(sc_, c)),                                  # C9
            mul(breal, sub(sphi, phi)),                               # C10
            mul(breal, sub(sF, F)),                                   # C11
            mul(breal, sub(sOid, oid)),                               # C12
            mul(breal, sub(msg, add(mul(oid, bc(B187)),
                                    add(mul(sRhi, bc(B94)), sRlo)))),  # C13
            mul(breal, sub(sD1, sub(mul(Phi, c), mul(phi, C)))),      # C14
            mul(breal, mul(gam, sub(sD2, sub(mul(C, s),
                add(mul(sub(c, one), F), one))))),                    # C15
            mul(breal, mul(nbeta, sub(sD2,
                sub(mul(F, add(c, one)), add(mul(s, C), one))))),     # C16
            mul(breal, mul(sub(beta, gam), sD2)),                     # C17
            mul(breal, sub(cd, sub(c, add(mul(two, mul(beta, c)), phi)))),  # C18
            mul(breal, sub(sd, mul(sub(add(beta, beta), one), s))),   # C19
            mul(breal, sub(mul(sub(pid, feepid), dinv), one)),        # C20
            mul(breal, sub(w0, add(mul(msel, bc(W0_SELL)),
                add(mul(mbuy, bc(W0_BUY)),
                    add(mul(Phi, bc(W0_FEE)), non))))),               # C21
            mul(breal, sub(w1, add(bc(W1_CONST),
                add(mul(pid, bc(W1_PID)), mul(expv, bc(W1_EXP)))))),  # C22
            mul(breal, sub(snon, non)),                               # C23
            mul(breal, sub(sexp, expv)),                              # C24
            mul(hold, sub(msg_n, msg)),                               # H1
            mul(hold, sub(oid_n, oid)),
            mul(hold, sub(pid_n, pid)),
            mul(hold, sub(aid_n, aid)),
            mul(hold, sub(F_n, F)),
            mul(hold, sub(C_n, C)),
            mul(hold, sub(Phi_n, Phi)),
            mul(hold, sub(beta_n, beta)),
            mul(hold, sub(s_n, s)),
            mul(hold, sub(c_n, c)),
            mul(hold, sub(phi_n, phi)),
            mul(hold, sub(cinv_n, cinv)),
            mul(hold, sub(zc_n, zc)),
            mul(hold, sub(gam_n, gam)),
            mul(hold, sub(cd_n, cd)),
            mul(hold, sub(sd_n, sd)),
            mul(hold, sub(non_n, non)),
            mul(hold, sub(exp_n, expv)),
            mul(hold, sub(h1_n, h1)),
            mul(hold, sub(h2_n, h2)),
            mul(hold, sub(h3_n, h3)),
            mul(hold, sub(w0_n, w0)),
            mul(hold, sub(w1_n, w1)),                                 # H23
            mul(lad64, bit(sC, sC_n)),                                # L1
            mul(lad64, bit(sPhi, sPhi_n)),
            mul(lad64, bit(ss, ss_n)),
            mul(lad64, bit(sc_, sc_n)),
            mul(lad64, bit(sphi, sphi_n)),
            mul(lad64, bit(sF, sF_n)),
            mul(lad64, bit(sOid, sOid_n)),                            # L7
            mul(zero64, sC),
            mul(zero64, sPhi),
            mul(zero64, ss),
            mul(zero64, sc_),
            mul(zero64, sphi),
            mul(zero64, sF),
            mul(zero64, sOid),                                        # L14
            mul(lad127, bit(sD1, sD1_n)),                             # L15
            mul(lad127, bit(sD2, sD2_n)),                             # L16
            mul(bit127, mul(sD1, sub(sD1, one))),                     # L17
            mul(bit127, mul(sD2, sub(sD2, one))),                     # L18
            mul(lad94, bit(sRlo, sRlo_n)),                            # L19
            mul(zero94, sRlo),                                        # L20
            mul(lad93, bit(sRhi, sRhi_n)),                            # L21
            mul(zero93, sRhi),                                        # L22
            mul(lad32, bit(snon, snon_n)),                            # L23
            mul(lad32, bit(sexp, sexp_n)),                            # L24
            mul(zero32t, snon),                                       # L25
            mul(zero32t, sexp),                                       # L26
            sub(mul(inv_fc, sub(z_c, t_fc)), breal),                  # I1
            sub(mul(inv_f1, sub(z_c, t_f1)), breal),                  # I2
            sub(mul(inv_f2, sub(z_c, t_f2)), breal),                  # I3
            sub(mul(inv_f3, sub(z_c, t_f3)), breal),                  # I4
            sub(mul(inv_h1, sub(z_c, t_h1)), breal),                  # I5
            sub(mul(inv_h2, sub(z_c, t_h2)), breal),                  # I6
            sub(mul(inv_h3, sub(z_c, t_h3)), breal),                  # I7
            sub(mul(inv_h4, sub(z_c, t_h4)), breal),                  # I8
            add(
                add(
                    sub(acc_n, add(acc, add(inv_fc, add(inv_h1,
                        add(inv_h2, add(inv_h3, inv_h4)))))),
                    add(inv_f1, add(inv_f2, inv_f3)),
                ),
                mul(lastrow, S_c),
            ),                                                        # I9
            mul(row0, acc),                                           # I10
        ]
