"""Limit-order execution link AIR: fairness, ranges, and delta production.

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
    0 <= fee limit/actuals < 2^64, 1 <= s < 2^64, plus F < 2^64.
  - **delta production** (execute_limit_order.cairo:93-150): the collateral,
    synthetic and fee position deltas are algebraically tied to the actuals
    (buy: -c - fee / +s; sell: +c - fee / -s; fee position: +fee), and the
    fee position is proven distinct from the trader position.

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

Staging note (documented scope): the order's OTHER signed fields (C, Phi,
beta, position/asset ids) are bound to the message hash by the Pedersen
chain, which is proven hash-by-hash in the pooled pedersen builtin AIR but
not yet linked field-by-field in-trace; that link (logUp lookups into the
pedersen pool's public (a, b, h) table plus packing ladders) is the next
stage on top of this AIR's block layout.
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
B64 = 1 << 64
B94 = 1 << 94
B187 = 1 << 187

BETA_FC = 3  # fulfillment-claims tag (mirrors fulfillment_air.BETA_SIG)
BETA_UPD = 4  # produced-updates tag (mirrors position_bus_air.BETA_UPD)


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


def order_link_public_surface(records: Sequence[OrderExecRecord]):
    """(fc_claims, upd_claims) from the execution log.

    fc_claims: [(msg, order_id, full_amount, mult)] — must equal the
    fulfillment AIR's claims table (host cross-check).
    upd_claims: [(pid, tag, aid, 0, operand, mult)] — the trade-produced
    subset of the position AIR's update claims.
    """
    fc: Dict[Tuple[int, int, int], int] = {}
    upd: Dict[Tuple[int, int, int, int, int], int] = {}
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
    fc_claims = [k + (mu,) for k, mu in sorted(fc.items())]
    upd_claims = [k + (mu,) for k, mu in sorted(upd.items())]
    return fc_claims, upd_claims


class OrderLinkAir(Air):
    """Witnessed limit-order executions against public claims tables.

    Main columns (28):
      0 msg  1 oid  2 pid  3 aid  4 F  5 C  6 Phi  7 beta  8 s  9 c
      10 phi  11 cinv  12 zc  13 gam  14 cd  15 sd  16..21 64-bit ladders
      (C-1, Phi, s-1, c, phi, F)  22 sD1  23 sD2 (128-bit fairness ladders)
      24 sRlo (94b)  25 sRhi (93b)  26 sOid (64b)  27 dinv (pid != feepid)
    Interaction columns (5): inv_fc inv_f1 inv_f2 inv_f3 acc.
    Challenges: z, alpha, beta_ch (drawn) + S (derived claims grand sum).
    """

    n_columns = 28
    n_interaction_columns = 5
    n_interaction_challenges = 3
    n_derived_challenges = 1
    transition_degree = 4

    def __init__(
        self,
        fc_claims: Sequence[Tuple[int, int, int, int]],
        upd_claims: Sequence[Tuple[int, int, int, int, int, int]],
        fee_position_id: int,
        n_execs: int,
    ):
        assert n_execs >= 1
        for _msg, _oid, ful, mu in fc_claims:
            assert 0 <= ful < B64 and mu >= 0
        for _pid, tag, aid, kcode, _op, mu in upd_claims:
            assert tag in (0, 1) and kcode == 0 and mu >= 0
            assert (tag == 1) or (aid == 0)
        self.fc_claims = [tuple(c) for c in fc_claims]
        self.upd_claims = [tuple(c) for c in upd_claims]
        self.fee_position_id = fee_position_id
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
         sphi_c, sF_c, sD1_c, sD2_c, sRlo_c, sRhi_c, sOid_c, dinv_c) = cols
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
            sC, sPhi, ss, sc_, sphi, sF = C - 1, Phi, s - 1, c, phi, F
            sD1, sD2, sRlo, sRhi, sOid = d1, d2, rlo, rhi, oid
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
                sC_c[base + i], sPhi_c[base + i], ss_c[base + i] = sC, sPhi, ss
                sc_c[base + i], sphi_c[base + i], sF_c[base + i] = sc_, sphi, sF
                sD1_c[base + i], sD2_c[base + i] = sD1, sD2
                sRlo_c[base + i], sRhi_c[base + i] = sRlo, sRhi
                sOid_c[base + i] = sOid
                sC, sPhi, ss = sC >> 1, sPhi >> 1, ss >> 1
                sc_, sphi, sF = sc_ >> 1, sphi >> 1, sF >> 1
                sD1, sD2 = sD1 >> 1, sD2 >> 1
                sRlo, sRhi, sOid = sRlo >> 1, sRhi >> 1, sOid >> 1
        return cols

    # --- interaction phase ----------------------------------------------------

    def _tuples(self, al, be, row_vals):
        """(t_fc, t_f1, t_f2, t_f3) lookup tuples at a block's row 0."""
        p = FIELD_PRIME
        msg, oid, pid, aid, F, phi, cd, sd = row_vals
        al2 = al * al % p
        al4 = al2 * al2 % p
        t_fc = (msg + al * oid + al2 * F + BETA_FC * be) % p
        t_f1 = (self.fee_position_id + al4 * phi + BETA_UPD * be) % p
        t_f2 = (pid + al4 * cd + BETA_UPD * be) % p
        t_f3 = (pid + al + al2 * aid + al4 * sd + BETA_UPD * be) % p
        return t_fc, t_f1, t_f2, t_f3

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        (msg, oid, pid, aid, F, _C, _Phi, _beta, _s, _c, phi, _cinv, _zc,
         _gam, cd, sd) = main_columns[:16]
        n = self.n
        inv_fc = [0] * n
        inv_f1 = [0] * n
        inv_f2 = [0] * n
        inv_f3 = [0] * n
        acc = [0] * n
        for k in range(self.n_execs):
            b = k * BLOCK
            t_fc, t_f1, t_f2, t_f3 = self._tuples(
                al, be,
                (msg[b], oid[b], pid[b], aid[b], F[b], phi[b], cd[b], sd[b]),
            )
            inv_fc[b] = _inv(z - t_fc)
            inv_f1[b] = _inv(z - t_f1)
            inv_f2[b] = _inv(z - t_f2)
            inv_f3[b] = _inv(z - t_f3)
        total = 0
        for r in range(n - 1):
            total = (total + inv_fc[r] - inv_f1[r] - inv_f2[r] - inv_f3[r]) % p
            acc[r + 1] = total
        return [inv_fc, inv_f1, inv_f2, inv_f3, acc]

    def derived_challenges(self, challenges):
        """S = sum_fc mu/(z - t_fc) - sum_upd mu/(z - t_upd) over the public
        tables; the trace-side bus sums must hit exactly this value."""
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        al4 = al2 * al2 % p
        S = 0
        for msg, oid, ful, mu in self.fc_claims:
            S = (S + mu * _inv(z - (msg + al * oid + al2 * ful + BETA_FC * be))) % p
        for pid, tag, aid, _kc, op, mu in self.upd_claims:
            S = (S - mu * _inv(
                z - (pid + al * tag + al2 * aid + al4 * op + BETA_UPD * be)
            )) % p
        return [S]

    # --- public columns ---------------------------------------------------------

    _PUB_ORDER = (
        "start", "breal", "hold", "lad64", "zero64", "lad93", "zero93",
        "lad94", "zero94", "lad127", "bit127", "row0", "lastrow", "feepid",
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
        cols["row0"][0] = 1
        cols["lastrow"][n - 1] = 1
        return cols

    def public_columns(self):
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self):
        out = [self.n_execs, self.m, self.fee_position_id]
        for c in self.fc_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 1)  # separator
        for c in self.upd_claims:
            out += [v % FIELD_PRIME for v in c]
        return out

    def transition_divisors(self):
        return ["trans"] * 58 + ["all"] * 6

    # --- constraints (host ints, verifier) -------------------------------------

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        p = FIELD_PRIME
        (msg, oid, pid, aid, F, C, Phi, beta, s, c, phi, cinv, zc, gam, cd,
         sd, sC, sPhi, ss, sc_, sphi, sF, sD1, sD2, sRlo, sRhi, sOid, dinv,
         inv_fc, inv_f1, inv_f2, inv_f3, acc) = cur_vals
        (msg_n, oid_n, pid_n, aid_n, F_n, C_n, Phi_n, beta_n, s_n, c_n,
         phi_n, cinv_n, zc_n, gam_n, cd_n, sd_n, sC_n, sPhi_n, ss_n, sc_n,
         sphi_n, sF_n, sD1_n, sD2_n, sRlo_n, sRhi_n, sOid_n, _dinv_n,
         _ifc_n, _if1_n, _if2_n, _if3_n, acc_n) = nxt_vals
        if pub_vals:
            (start, breal, hold, lad64, zero64, lad93, zero93, lad94,
             zero94, lad127, bit127, row0, lastrow, feepid) = pub_vals
        else:  # constraint-count probe
            start = breal = hold = lad64 = zero64 = lad93 = zero93 = 0
            lad94 = zero94 = lad127 = bit127 = row0 = lastrow = feepid = 0
        z, al, be, S = chal_vals
        al2 = al * al % p
        al4 = al2 * al2 % p

        t_fc = (msg + al * oid + al2 * F + BETA_FC * be) % p
        t_f1 = (feepid + al4 * phi + BETA_UPD * be) % p
        t_f2 = (pid + al4 * cd + BETA_UPD * be) % p
        t_f3 = (pid + al + al2 * aid + al4 * sd + BETA_UPD * be) % p

        def bit(sfx, sfx_n):
            b = (sfx - 2 * sfx_n) % p
            return b * (b - 1) % p

        out = [
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
            hold * (sd_n - sd) % p,                                  # H16
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
            # --- buses (all) ----------------------------------------------------
            (inv_fc * ((z - t_fc) % p) - breal) % p,                 # I1
            (inv_f1 * ((z - t_f1) % p) - breal) % p,                 # I2
            (inv_f2 * ((z - t_f2) % p) - breal) % p,                 # I3
            (inv_f3 * ((z - t_f3) % p) - breal) % p,                 # I4
            (acc_n - acc - inv_fc + inv_f1 + inv_f2 + inv_f3
             + lastrow * S) % p,                                     # I5
            row0 * acc % p,                                          # I6
        ]
        return out

    # --- constraints (device, Montgomery domain) ----------------------------------

    def eval_transitions_chal(self, f, cur, nxt, pub, chal):
        import jax.numpy as jnp

        p = FIELD_PRIME
        (msg, oid, pid, aid, F, C, Phi, beta, s, c, phi, cinv, zc, gam, cd,
         sd, sC, sPhi, ss, sc_, sphi, sF, sD1, sD2, sRlo, sRhi, sOid, dinv,
         inv_fc, inv_f1, inv_f2, inv_f3, acc) = cur
        (msg_n, oid_n, pid_n, aid_n, F_n, C_n, Phi_n, beta_n, s_n, c_n,
         phi_n, cinv_n, zc_n, gam_n, cd_n, sd_n, sC_n, sPhi_n, ss_n, sc_n,
         sphi_n, sF_n, sD1_n, sD2_n, sRlo_n, sRhi_n, sOid_n, _dinv_n,
         _ifc_n, _if1_n, _if2_n, _if3_n, acc_n) = nxt
        (start, breal, hold, lad64, zero64, lad93, zero93, lad94, zero94,
         lad127, bit127, row0, lastrow, feepid) = pub
        z_c, al_c, be_c, S_c = (jnp.broadcast_to(x, msg.shape) for x in chal)

        def bc(v):
            return jnp.broadcast_to(jnp.asarray(f.pack((v << 252) % p)), msg.shape)

        one = bc(1)
        two = bc(2)
        b187 = bc(B187)
        b94 = bc(B94)
        mul = f.mont_mul
        sub = f.sub
        add = f.add

        al2 = mul(al_c, al_c)
        al4 = mul(al2, al2)
        t_fc = add(msg, add(mul(al_c, oid), add(mul(al2, F), mul(be_c, bc(BETA_FC)))))
        t_f1 = add(feepid, add(mul(al4, phi), mul(be_c, bc(BETA_UPD))))
        t_f2 = add(pid, add(mul(al4, cd), mul(be_c, bc(BETA_UPD))))
        t_f3 = add(
            pid,
            add(al_c, add(mul(al2, aid), add(mul(al4, sd), mul(be_c, bc(BETA_UPD))))),
        )

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
            mul(breal, sub(msg, add(mul(oid, b187), add(mul(sRhi, b94), sRlo)))),  # C13
            mul(breal, sub(sD1, sub(mul(Phi, c), mul(phi, C)))),      # C14
            mul(breal, mul(gam, sub(sD2, sub(mul(C, s),
                add(mul(sub(c, one), F), one))))),                    # C15
            mul(breal, mul(sub(one, beta), sub(sD2,
                sub(mul(F, add(c, one)), add(mul(s, C), one))))),     # C16
            mul(breal, mul(sub(beta, gam), sD2)),                     # C17
            mul(breal, sub(cd, sub(c, add(mul(two, mul(beta, c)), phi)))),  # C18
            mul(breal, sub(sd, mul(sub(add(beta, beta), one), s))),   # C19
            mul(breal, sub(mul(sub(pid, feepid), dinv), one)),        # C20
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
            mul(hold, sub(sd_n, sd)),                                 # H16
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
            sub(mul(inv_fc, sub(z_c, t_fc)), breal),                  # I1
            sub(mul(inv_f1, sub(z_c, t_f1)), breal),                  # I2
            sub(mul(inv_f2, sub(z_c, t_f2)), breal),                  # I3
            sub(mul(inv_f3, sub(z_c, t_f3)), breal),                  # I4
            add(
                sub(sub(acc_n, acc), inv_fc),
                add(add(inv_f1, add(inv_f2, inv_f3)), mul(lastrow, S_c)),
            ),                                                        # I5
            mul(row0, acc),                                           # I6
        ]
