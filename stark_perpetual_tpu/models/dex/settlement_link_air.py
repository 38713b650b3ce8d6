"""DEX limit-order execution link AIR: ratio/fee fairness, ranges, vault
diffs, and message binding for the spot exchange.

The DEX mirror of the perpetual order-link AIR
(models/perpetual/order_link_air.py). One 128-row block per L2 with-fee
limit-order execution (dex execute_limit_order.cairo:204-357) proves:

  - **settlement ratio** (execute_limit_order.cairo:227-233): the actual
    ratio is at least as good as the signed one,
    amount_sell*amount_bought - amount_sold*amount_buy >= 0, as a 128-bit
    range ladder on the difference.
  - **fee ratio** (fee.cairo:34-41): fee_taken*amount_buy <=
    amount_fee*amount_bought when a fee is taken (an inverse-free public
    flag column gates the fee path; no fee => fee_taken = 0).
  - **windows**: the six amounts < 2^63 (BALANCE_BOUND), vault ids < 2^64,
    nonce < 2^31, expiration < 2^22 (dex_constants.cairo bounds).
  - **vault-diff production**: the four vault moves of the execution
    (-sold on the sell vault, +bought on the buy vault, -fee on the fee
    vault, +fee on the exchange's destination vault) are emitted to a
    public diffs table through logUp buses; the verifier cross-checks that
    table against the vault AIR's public access schedule, so settlement
    vault moves are tied to proven-fair executions.
  - **message binding**: logUp lookups into the public pedersen-pool
    table walk the order hash chain. Both L2 message formats are bound
    in-trace, selected by a per-block witness flag `leg`:
      - with-fee 64-bit format (execute_limit_order.cairo:30-53 ->
        signature_message_hashes.cairo:39-104), four lookups:
            h1 = h(token_sell, token_buy); h2 = h(h1, token_fee);
            h3 = h(h2, w4); order_id = h(h3, w5)
        with w4 (amounts/nonce) and w5 (vaults/expiration) reconstructed
        in-trace from the same columns the fairness constraints use;
      - legacy 31-bit format (message_hashes.cairo:56-97, type 0), two
        lookups sharing the h1 row:
            h1 = h(token_sell, token_buy); order_id = h(h1, wl)
        with wl = vault_sell*2^210 + vault_buy*2^179 + amount_sell*2^116
        + amount_buy*2^53 + nonce*2^22 + expiration reconstructed
        in-trace, vaults additionally windowed to 31 bits (the legacy
        bound) and has_fee forced to 0.

Scope note: L1 orders (authorized by on-chain order messages, no
signature — execute_limit_order.cairo:118-147) remain outside this AIR;
their claims rows are justified by the L1 order-message outputs the
verifier checks on-chain.
"""

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
B63 = 1 << 63
B64 = 1 << 64
# w4 = amount_sell*2^160 + amount_buy*2^96 + amount_fee*2^32 + nonce
W4_SELL = 1 << 160
W4_BUY = 1 << 96
W4_FEE = 1 << 32
# w5 = 3*2^241 + vault_fee*2^177 + vault_sell*2^113 + vault_buy*2^49 + exp*2^17
W5_CONST = 3 << 241
W5_VF = 1 << 177
W5_VS = 1 << 113
W5_VB = 1 << 49
W5_EXP = 1 << 17
# wl = vs*2^210 + vb*2^179 + AS*2^116 + AB*2^53 + nonce*2^22 + exp
# (legacy packed word, type LEGACY_SETTLEMENT = 0: 31/31/63/63/31/22 bits,
# exchange_messages._legacy_packed).
WL_VS = 1 << 210
WL_VB = 1 << 179
WL_AS = 1 << 116
WL_AB = 1 << 53
WL_NON = 1 << 22

BETA_SIG = 3  # order-claims tag (mirrors fulfillment_air.BETA_SIG)
BETA_POOL = 5  # pedersen-pool lookup tag (mirrors perp order-link)
BETA_DIFF = 6  # produced vault-diff tag


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


@dataclass(frozen=True)
class DexOrderExecRecord:
    """One L2 with-fee limit-order execution (the engine's witness)."""

    order_id: int  # == the message hash for signed L2 orders
    amount_sell: int
    amount_buy: int
    amount_fee: int
    amount_sold: int
    amount_bought: int
    fee_taken: int
    has_fee: int  # 1 iff a FeeInfoExchange was applied
    vault_sell: int
    vault_buy: int
    vault_fee: int
    vault_dst: int  # exchange destination vault (0 when no fee)
    dst_key: int  # exchange destination stark key (0 when no fee)
    public_key: int
    token_sell: int
    token_buy: int
    token_fee: int
    nonce: int
    expiration_timestamp: int
    is_legacy: int = 0  # 1 -> legacy 31-bit format (no fee, 31-bit vaults)

    def packed_words(self) -> Tuple[int, int]:
        w4 = (self.amount_sell * W4_SELL + self.amount_buy * W4_BUY
              + self.amount_fee * W4_FEE + self.nonce)
        w5 = (W5_CONST + self.vault_fee * W5_VF + self.vault_sell * W5_VS
              + self.vault_buy * W5_VB + self.expiration_timestamp * W5_EXP)
        return w4, w5

    def legacy_word(self) -> int:
        """The legacy packed word from the same fields (mod p; meaningful
        only when the legacy windows hold, which the AIR enforces for
        legacy blocks)."""
        return (
            self.vault_sell * WL_VS + self.vault_buy * WL_VB
            + self.amount_sell * WL_AS + self.amount_buy * WL_AB
            + self.nonce * WL_NON + self.expiration_timestamp
        ) % FIELD_PRIME

    def hash_chain(self) -> List[Tuple[int, int, int]]:
        from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash

        h1 = fast_pedersen_hash(self.token_sell, self.token_buy)
        if self.is_legacy:
            wl = self.legacy_word()
            msg = fast_pedersen_hash(h1, wl)
            return [
                (self.token_sell, self.token_buy, h1),
                (h1, wl, msg),
            ]
        w4, w5 = self.packed_words()
        h2 = fast_pedersen_hash(h1, self.token_fee)
        h3 = fast_pedersen_hash(h2, w4)
        msg = fast_pedersen_hash(h3, w5)
        return [
            (self.token_sell, self.token_buy, h1),
            (h1, self.token_fee, h2),
            (h2, w4, h3),
            (h3, w5, msg),
        ]

    def diffs(self) -> List[Tuple[int, int, int, int]]:
        """The (key, token, vault, delta) vault moves this execution makes."""
        out = [
            (self.public_key, self.token_sell, self.vault_sell,
             (-self.amount_sold) % FIELD_PRIME),
            (self.public_key, self.token_buy, self.vault_buy,
             self.amount_bought % FIELD_PRIME),
        ]
        if self.has_fee:
            out.append((self.public_key, self.token_fee, self.vault_fee,
                        (-self.fee_taken) % FIELD_PRIME))
            out.append((self.dst_key, self.token_fee, self.vault_dst,
                        self.fee_taken % FIELD_PRIME))
        return out


def dex_link_public_surface(records: Sequence[DexOrderExecRecord]):
    """(oc_claims, diff_claims, pool_claims) of the execution log.

    oc_claims: [(msg, order_id, full_amount, mult)] (msg == order_id) — the
    with-fee L2 subset of the DEX order-claims table.
    diff_claims: [(key, token, vault, delta, mult)] — produced vault moves.
    pool_claims: [(a, b, h, mult)] — referenced pedersen-pool rows.
    """
    oc: Dict[Tuple[int, int, int], int] = {}
    df: Dict[Tuple[int, int, int, int], int] = {}
    pool: Dict[Tuple[int, int, int], int] = {}
    for r in records:
        key = (r.order_id, r.order_id, r.amount_sell)
        oc[key] = oc.get(key, 0) + 1
        for row in r.diffs():
            df[row] = df.get(row, 0) + 1
        for row in r.hash_chain():
            pool[row] = pool.get(row, 0) + 1
    oc_claims = [k + (mu,) for k, mu in sorted(oc.items())]
    diff_claims = [k + (mu,) for k, mu in sorted(df.items())]
    pool_claims = [k + (mu,) for k, mu in sorted(pool.items())]
    return oc_claims, diff_claims, pool_claims


class DexOrderLinkAir(Air):
    """Witnessed DEX limit-order executions against public claims tables.

    Main columns (40):
      0 msg  1 AS  2 AB  3 AF  4 sold  5 bought  6 ftk  7 hf
      8 vs  9 vb  10 vf  11 vd  12 kdst  13 pk  14 ts  15 tb  16 tf
      17 nonce  18 expv  19 h1  20 h2  21 h3  22 w4  23 w5
      24..29 63-bit ladders (AS AB AF sold bought ftk)
      30 sD1  31 sD2 (128-bit fairness ladders)
      32..35 64-bit vault-id ladders (vs vb vf vd)
      36 snon (31b)  37 sexp (22b)
      38 leg (legacy-format flag)  39 wl (legacy packed word)
    Interaction (11): inv_oc inv_d1..d4 inv_h1..h4 inv_hl acc.
    """

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 40
    n_interaction_columns = 11
    n_interaction_challenges = 3
    n_derived_challenges = 1
    transition_degree = 4

    def __init__(
        self,
        oc_claims: Sequence[Tuple[int, int, int, int]],
        diff_claims: Sequence[Tuple[int, int, int, int, int]],
        pool_claims: Sequence[Tuple[int, int, int, int]],
        n_execs: int,
    ):
        assert n_execs >= 1
        for msg, oid, ful, mu in oc_claims:
            assert msg == oid and 0 <= ful < B63 and mu >= 0
        for _k, _t, _v, _d, mu in diff_claims:
            assert mu >= 0
        for _a, _b, _h, mu in pool_claims:
            assert mu >= 0
        self.oc_claims = [tuple(c) for c in oc_claims]
        self.diff_claims = [tuple(c) for c in diff_claims]
        self.pool_claims = [tuple(c) for c in pool_claims]
        self.n_execs = n_execs
        m = 1
        while m < max(2, n_execs):
            m *= 2
        self.m = m
        self.n = BLOCK * m

    # --- witness ------------------------------------------------------------

    def trace(self, records: Sequence[DexOrderExecRecord]) -> List[List[int]]:
        assert len(records) == self.n_execs
        p = FIELD_PRIME
        n = self.n
        cols = [[0] * n for _ in range(self.n_columns)]
        for k, r in enumerate(records):
            base = k * BLOCK
            AS, AB, AF = r.amount_sell, r.amount_buy, r.amount_fee
            sold, bought, ftk = r.amount_sold, r.amount_bought, r.fee_taken
            if not all(0 <= v < B63 for v in (AS, AB, AF, sold, bought, ftk)):
                raise ValueError(f"amount out of range: {r}")
            if not all(0 <= v < B64 for v in (r.vault_sell, r.vault_buy,
                                              r.vault_fee, r.vault_dst)):
                raise ValueError(f"vault id out of range: {r}")
            if not (0 <= r.nonce < (1 << 31)):
                raise ValueError(f"nonce out of range: {r}")
            if not (0 <= r.expiration_timestamp < (1 << 22)):
                raise ValueError(f"expiration out of range: {r}")
            if r.has_fee not in (0, 1) or (not r.has_fee and ftk != 0):
                raise ValueError(f"bad fee flag: {r}")
            if r.is_legacy not in (0, 1):
                raise ValueError(f"bad legacy flag: {r}")
            if r.is_legacy and (
                r.has_fee
                or r.vault_sell >= (1 << 31)
                or r.vault_buy >= (1 << 31)
            ):
                raise ValueError(f"legacy order violates legacy bounds: {r}")
            chain = r.hash_chain()
            if chain[-1][2] != r.order_id:
                raise ValueError(f"order id does not match order fields: {r}")
            d1 = AS * bought - sold * AB
            if d1 < 0:
                raise ValueError(f"settlement ratio violated: {r}")
            d2 = AF * bought - ftk * AB if r.has_fee else 0
            if d2 < 0:
                raise ValueError(f"fee ratio violated: {r}")
            w4, w5 = r.packed_words()
            h2 = chain[1][2] if not r.is_legacy else 0
            h3 = chain[2][2] if not r.is_legacy else 0
            vals = [
                r.order_id, AS, AB, AF, sold, bought, ftk, r.has_fee,
                r.vault_sell, r.vault_buy, r.vault_fee, r.vault_dst,
                r.dst_key, r.public_key, r.token_sell, r.token_buy,
                r.token_fee, r.nonce, r.expiration_timestamp,
                chain[0][2], h2, h3, w4 % p, w5 % p,
            ]
            lads = [AS, AB, AF, sold, bought, ftk, d1, d2,
                    r.vault_sell, r.vault_buy, r.vault_fee, r.vault_dst,
                    r.nonce, r.expiration_timestamp]
            leg, wl = r.is_legacy, r.legacy_word()
            for i in range(BLOCK):
                for c, v in enumerate(vals):
                    cols[c][base + i] = v
                for j, lv in enumerate(lads):
                    cols[24 + j][base + i] = lv
                cols[38][base + i] = leg
                cols[39][base + i] = wl
                lads = [lv >> 1 for lv in lads]
        return cols

    # --- interaction phase ----------------------------------------------------

    def _row_tuples(self, al, be, v, wl):
        p = FIELD_PRIME
        al2 = al * al % p
        al3 = al2 * al % p
        (msg, AS, _AB, _AF, sold, bought, ftk, hf, vs, vb, vf, vd, kdst,
         pk, ts, tb, tf, _non, _exp, h1, h2, h3, w4, w5) = v
        out = {
            "oc": (msg + al * msg + al2 * AS + BETA_SIG * be) % p,
            "d1": (pk + al * ts + al2 * vs + al3 * (-sold) + BETA_DIFF * be) % p,
            "d2": (pk + al * tb + al2 * vb + al3 * bought + BETA_DIFF * be) % p,
            "d3": (pk + al * tf + al2 * vf + al3 * (-ftk) + BETA_DIFF * be) % p,
            "d4": (kdst + al * tf + al2 * vd + al3 * ftk + BETA_DIFF * be) % p,
            "h1": (ts + al * tb + al2 * h1 + BETA_POOL * be) % p,
            "h2": (h1 + al * tf + al2 * h2 + BETA_POOL * be) % p,
            "h3": (h2 + al * w4 + al2 * h3 + BETA_POOL * be) % p,
            "h4": (h3 + al * w5 + al2 * msg + BETA_POOL * be) % p,
            "hl": (h1 + al * wl + al2 * msg + BETA_POOL * be) % p,
        }
        return out, hf

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        n = self.n
        keys = ("oc", "d1", "d2", "d3", "d4", "h1", "h2", "h3", "h4", "hl")
        invs = {k: [0] * n for k in keys}
        acc = [0] * n
        for k in range(self.n_execs):
            b = k * BLOCK
            v = [main_columns[i][b] for i in range(24)]
            leg = main_columns[38][b]
            tups, hf = self._row_tuples(al, be, v, main_columns[39][b])
            for key, t in tups.items():
                if key in ("d3", "d4") and not hf:
                    continue
                if key in ("h2", "h3", "h4") and leg:
                    continue
                if key == "hl" and not leg:
                    continue
                invs[key][b] = _inv(z - t)
        total = 0
        for r in range(n - 1):
            total = (
                total
                + invs["oc"][r] + invs["h1"][r] + invs["h2"][r]
                + invs["h3"][r] + invs["h4"][r] + invs["hl"][r]
                - invs["d1"][r] - invs["d2"][r] - invs["d3"][r] - invs["d4"][r]
            ) % p
            acc[r + 1] = total
        return [invs[k] for k in keys] + [acc]

    def derived_challenges(self, challenges):
        """S = sum_oc + sum_pool - sum_diff over the public tables."""
        p = FIELD_PRIME
        z, al, be = challenges
        al2 = al * al % p
        al3 = al2 * al % p
        S = 0
        for msg, oid, ful, mu in self.oc_claims:
            S = (S + mu * _inv(z - (msg + al * oid + al2 * ful + BETA_SIG * be))) % p
        for a, b, h, mu in self.pool_claims:
            S = (S + mu * _inv(z - (a + al * b + al2 * h + BETA_POOL * be))) % p
        for key, tok, vlt, dlt, mu in self.diff_claims:
            S = (S - mu * _inv(
                z - (key + al * tok + al2 * vlt + al3 * dlt + BETA_DIFF * be)
            )) % p
        return [S]

    # --- public columns ---------------------------------------------------------

    _PUB_ORDER = (
        "start", "breal", "hold", "lad63", "zero63", "lad64", "zero64",
        "lad127", "bit127", "lad31", "zero31", "lad22", "zero22", "row31",
        "row0", "lastrow",
    )

    def _selectors(self):
        n, m = self.n, self.m
        cols = {name: [0] * n for name in self._PUB_ORDER}
        spans = (("lad63", 0, 63), ("zero63", 63, BLOCK), ("lad64", 0, 64),
                 ("zero64", 64, BLOCK), ("lad127", 0, BLOCK - 1),
                 ("lad31", 0, 31), ("zero31", 31, BLOCK),
                 ("lad22", 0, 22), ("zero22", 22, BLOCK))
        for k in range(m):
            base = k * BLOCK
            cols["start"][base] = 1
            if k < self.n_execs:
                cols["breal"][base] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            for name, lo, hi in spans:
                for i in range(lo, hi):
                    cols[name][base + i] = 1
            cols["bit127"][base + BLOCK - 1] = 1
            cols["row31"][base + 31] = 1
        cols["row0"][0] = 1
        cols["lastrow"][n - 1] = 1
        return cols

    def public_columns(self):
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self):
        out = [self.n_execs, self.m]
        for c in self.oc_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 1)
        for c in self.diff_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 2)
        for c in self.pool_claims:
            out += [v % FIELD_PRIME for v in c]
        return out

    def transition_divisors(self):
        # 22 row-0 + 26 hold + 30 ladder constraints, then the 12 buses.
        return ["trans"] * 78 + ["all"] * 12

    # --- constraints (host ints, verifier) -------------------------------------

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        p = FIELD_PRIME
        (msg, AS, AB, AF, sold, bought, ftk, hf, vs, vb, vf, vd, kdst, pk,
         ts, tb, tf, non, expv, h1, h2, h3, w4, w5,
         sAS, sAB, sAF, ssold, sbought, sftk, sD1, sD2, svs, svb, svf, svd,
         snon, sexp, leg, wl,
         inv_oc, inv_d1, inv_d2, inv_d3, inv_d4, inv_h1, inv_h2, inv_h3,
         inv_h4, inv_hl, acc) = cur_vals
        nxt = nxt_vals
        if pub_vals:
            (start, breal, hold, lad63, zero63, lad64, zero64, lad127,
             bit127, lad31, zero31, lad22, zero22, row31, row0,
             lastrow) = pub_vals
        else:
            start = breal = hold = lad63 = zero63 = lad64 = zero64 = 0
            lad127 = bit127 = lad31 = zero31 = lad22 = zero22 = 0
            row31 = row0 = lastrow = 0
        z, al, be, S = chal_vals
        al2 = al * al % p
        al3 = al2 * al % p

        t_oc = (msg + al * msg + al2 * AS + BETA_SIG * be) % p
        t_d1 = (pk + al * ts + al2 * vs + al3 * (-sold) + BETA_DIFF * be) % p
        t_d2 = (pk + al * tb + al2 * vb + al3 * bought + BETA_DIFF * be) % p
        t_d3 = (pk + al * tf + al2 * vf + al3 * (-ftk) + BETA_DIFF * be) % p
        t_d4 = (kdst + al * tf + al2 * vd + al3 * ftk + BETA_DIFF * be) % p
        t_h1 = (ts + al * tb + al2 * h1 + BETA_POOL * be) % p
        t_h2 = (h1 + al * tf + al2 * h2 + BETA_POOL * be) % p
        t_h3 = (h2 + al * w4 + al2 * h3 + BETA_POOL * be) % p
        t_h4 = (h3 + al * w5 + al2 * msg + BETA_POOL * be) % p
        t_hl = (h1 + al * wl + al2 * msg + BETA_POOL * be) % p

        def bit(i_cur, i_nxt):
            b = (cur_vals[i_cur] - 2 * nxt[i_nxt]) % p
            return b * (b - 1) % p

        out = [
            # --- row-0 semantics (trans) ------------------------------------
            breal * hf % p * (hf - 1) % p,                           # C1
            breal * (1 - hf) % p * ftk % p,                          # C2
            breal * leg % p * (leg - 1) % p,                         # C1b
            breal * leg % p * hf % p,                                # C1c
            breal * (wl - (vs * WL_VS + vb * WL_VB + AS * WL_AS
                           + AB * WL_AB + non * WL_NON + expv)) % p, # C20
            breal * (sAS - AS) % p,                                  # C3
            breal * (sAB - AB) % p,
            breal * (sAF - AF) % p,
            breal * (ssold - sold) % p,
            breal * (sbought - bought) % p,
            breal * (sftk - ftk) % p,
            breal * (svs - vs) % p,
            breal * (svb - vb) % p,
            breal * (svf - vf) % p,
            breal * (svd - vd) % p,
            breal * (snon - non) % p,
            breal * (sexp - expv) % p,                               # C14
            breal * (sD1 - (AS * bought - sold * AB)) % p,           # C15
            breal * hf % p * (sD2 - (AF * bought - ftk * AB)) % p,   # C16
            breal * (1 - hf) % p * sD2 % p,                          # C17
            breal * (w4 - (AS * W4_SELL + AB * W4_BUY
                           + AF * W4_FEE + non)) % p,                # C18
            breal * (w5 - (W5_CONST + vf * W5_VF + vs * W5_VS
                           + vb * W5_VB + expv * W5_EXP)) % p,       # C19
        ]
        # --- hold: 24 value columns + leg/wl constant inside a block --------
        for i in list(range(24)) + [38, 39]:
            out.append(hold * (nxt[i] - cur_vals[i]) % p)
        # --- ladders --------------------------------------------------------
        for i in range(24, 30):  # 63-bit amount ladders
            out.append(lad63 * bit(i, i) % p)
            out.append(zero63 * cur_vals[i] % p)
        out.append(lad127 * bit(30, 30) % p)                         # sD1
        out.append(lad127 * bit(31, 31) % p)                         # sD2
        out.append(bit127 * sD1 % p * (sD1 - 1) % p)
        out.append(bit127 * sD2 % p * (sD2 - 1) % p)
        for i in range(32, 36):  # 64-bit vault-id ladders
            out.append(lad64 * bit(i, i) % p)
            out.append(zero64 * cur_vals[i] % p)
        out.append(lad31 * bit(36, 36) % p)
        out.append(zero31 * snon % p)
        out.append(lad22 * bit(37, 37) % p)
        out.append(zero22 * sexp % p)
        # Legacy 31-bit vault windows: at block row 31 the shifted vault
        # ladders must have reached zero when the block is legacy.
        out.append(row31 * leg % p * svs % p)
        out.append(row31 * leg % p * svb % p)
        # --- buses (all) ----------------------------------------------------
        out.extend([
            (inv_oc * ((z - t_oc) % p) - breal) % p,                 # I1
            (inv_d1 * ((z - t_d1) % p) - breal) % p,                 # I2
            (inv_d2 * ((z - t_d2) % p) - breal) % p,                 # I3
            (inv_d3 * ((z - t_d3) % p) - breal * hf) % p,            # I4
            (inv_d4 * ((z - t_d4) % p) - breal * hf) % p,            # I5
            (inv_h1 * ((z - t_h1) % p) - breal) % p,                 # I6
            (inv_h2 * ((z - t_h2) % p) - breal * (1 - leg)) % p,     # I7
            (inv_h3 * ((z - t_h3) % p) - breal * (1 - leg)) % p,     # I8
            (inv_h4 * ((z - t_h4) % p) - breal * (1 - leg)) % p,     # I9
            (inv_hl * ((z - t_hl) % p) - breal * leg) % p,           # I9b
            (nxt[-1] - acc - inv_oc - inv_h1 - inv_h2 - inv_h3 - inv_h4
             - inv_hl + inv_d1 + inv_d2 + inv_d3 + inv_d4
             + lastrow * S) % p,                                     # I10
            row0 * acc % p,                                          # I11
        ])
        return out

    # --- constraints (device, Montgomery domain) ----------------------------------

    def eval_transitions_chal(self, f, cur, nxt, pub, chal):
        import jax.numpy as jnp

        p = FIELD_PRIME
        (msg, AS, AB, AF, sold, bought, ftk, hf, vs, vb, vf, vd, kdst, pk,
         ts, tb, tf, non, expv, h1, h2, h3, w4, w5,
         sAS, sAB, sAF, ssold, sbought, sftk, sD1, sD2, svs, svb, svf, svd,
         snon, sexp, leg, wl,
         inv_oc, inv_d1, inv_d2, inv_d3, inv_d4, inv_h1, inv_h2, inv_h3,
         inv_h4, inv_hl, acc) = cur
        (start, breal, hold, lad63, zero63, lad64, zero64, lad127, bit127,
         lad31, zero31, lad22, zero22, row31, row0, lastrow) = pub
        z_c, al_c, be_c, S_c = (jnp.broadcast_to(x, msg.shape) for x in chal)

        def bc(v):
            return jnp.broadcast_to(jnp.asarray(f.pack((v << 252) % p)), msg.shape)

        one = bc(1)
        mul = f.mont_mul
        sub = f.sub
        add = f.add
        al2 = mul(al_c, al_c)
        al3 = mul(al2, al_c)
        be_sig = mul(be_c, bc(BETA_SIG))
        be_pool = mul(be_c, bc(BETA_POOL))
        be_diff = mul(be_c, bc(BETA_DIFF))

        def lin(x0, c1, x1, c2, x2, c3, x3, tag):
            return add(x0, add(mul(c1, x1), add(mul(c2, x2),
                                                add(mul(c3, x3), tag))))

        t_oc = add(msg, add(mul(al_c, msg), add(mul(al2, AS), be_sig)))
        t_d1 = lin(pk, al_c, ts, al2, vs, al3, f.neg(sold), be_diff)
        t_d2 = lin(pk, al_c, tb, al2, vb, al3, bought, be_diff)
        t_d3 = lin(pk, al_c, tf, al2, vf, al3, f.neg(ftk), be_diff)
        t_d4 = lin(kdst, al_c, tf, al2, vd, al3, ftk, be_diff)
        t_h1 = add(ts, add(mul(al_c, tb), add(mul(al2, h1), be_pool)))
        t_h2 = add(h1, add(mul(al_c, tf), add(mul(al2, h2), be_pool)))
        t_h3 = add(h2, add(mul(al_c, w4), add(mul(al2, h3), be_pool)))
        t_h4 = add(h3, add(mul(al_c, w5), add(mul(al2, msg), be_pool)))
        t_hl = add(h1, add(mul(al_c, wl), add(mul(al2, msg), be_pool)))

        def bitc(s_cur, s_nxt):
            b = sub(s_cur, add(s_nxt, s_nxt))
            return mul(b, sub(b, one))

        out = [
            mul(breal, mul(hf, sub(hf, one))),                        # C1
            mul(breal, mul(sub(one, hf), ftk)),                       # C2
            mul(breal, mul(leg, sub(leg, one))),                      # C1b
            mul(breal, mul(leg, hf)),                                 # C1c
            mul(breal, sub(wl, add(mul(vs, bc(WL_VS)),
                add(mul(vb, bc(WL_VB)), add(mul(AS, bc(WL_AS)),
                add(mul(AB, bc(WL_AB)), add(mul(non, bc(WL_NON)),
                                            expv))))))),              # C20
            mul(breal, sub(sAS, AS)),                                 # C3
            mul(breal, sub(sAB, AB)),
            mul(breal, sub(sAF, AF)),
            mul(breal, sub(ssold, sold)),
            mul(breal, sub(sbought, bought)),
            mul(breal, sub(sftk, ftk)),
            mul(breal, sub(svs, vs)),
            mul(breal, sub(svb, vb)),
            mul(breal, sub(svf, vf)),
            mul(breal, sub(svd, vd)),
            mul(breal, sub(snon, non)),
            mul(breal, sub(sexp, expv)),                              # C14
            mul(breal, sub(sD1, sub(mul(AS, bought), mul(sold, AB)))),  # C15
            mul(breal, mul(hf, sub(sD2, sub(mul(AF, bought),
                                            mul(ftk, AB))))),         # C16
            mul(breal, mul(sub(one, hf), sD2)),                       # C17
            mul(breal, sub(w4, add(mul(AS, bc(W4_SELL)),
                add(mul(AB, bc(W4_BUY)), add(mul(AF, bc(W4_FEE)), non))))),  # C18
            mul(breal, sub(w5, add(bc(W5_CONST), add(mul(vf, bc(W5_VF)),
                add(mul(vs, bc(W5_VS)), add(mul(vb, bc(W5_VB)),
                                            mul(expv, bc(W5_EXP)))))))),  # C19
        ]
        for i in list(range(24)) + [38, 39]:
            out.append(mul(hold, sub(nxt[i], cur[i])))
        for i in range(24, 30):
            out.append(mul(lad63, bitc(cur[i], nxt[i])))
            out.append(mul(zero63, cur[i]))
        out.append(mul(lad127, bitc(sD1, nxt[30])))
        out.append(mul(lad127, bitc(sD2, nxt[31])))
        out.append(mul(bit127, mul(sD1, sub(sD1, one))))
        out.append(mul(bit127, mul(sD2, sub(sD2, one))))
        for i in range(32, 36):
            out.append(mul(lad64, bitc(cur[i], nxt[i])))
            out.append(mul(zero64, cur[i]))
        out.append(mul(lad31, bitc(snon, nxt[36])))
        out.append(mul(zero31, snon))
        out.append(mul(lad22, bitc(sexp, nxt[37])))
        out.append(mul(zero22, sexp))
        out.append(mul(row31, mul(leg, svs)))
        out.append(mul(row31, mul(leg, svb)))
        not_leg = mul(breal, sub(one, leg))
        out.extend([
            sub(mul(inv_oc, sub(z_c, t_oc)), breal),                  # I1
            sub(mul(inv_d1, sub(z_c, t_d1)), breal),                  # I2
            sub(mul(inv_d2, sub(z_c, t_d2)), breal),                  # I3
            sub(mul(inv_d3, sub(z_c, t_d3)), mul(breal, hf)),         # I4
            sub(mul(inv_d4, sub(z_c, t_d4)), mul(breal, hf)),         # I5
            sub(mul(inv_h1, sub(z_c, t_h1)), breal),                  # I6
            sub(mul(inv_h2, sub(z_c, t_h2)), not_leg),                # I7
            sub(mul(inv_h3, sub(z_c, t_h3)), not_leg),                # I8
            sub(mul(inv_h4, sub(z_c, t_h4)), not_leg),                # I9
            sub(mul(inv_hl, sub(z_c, t_hl)), mul(breal, leg)),        # I9b
            add(
                add(
                    sub(nxt[-1], add(acc, add(inv_oc, add(inv_h1,
                        add(inv_h2, add(inv_h3, add(inv_h4, inv_hl))))))),
                    add(inv_d1, add(inv_d2, add(inv_d3, inv_d4))),
                ),
                mul(lastrow, S_c),
            ),                                                        # I10
            mul(row0, acc),                                           # I11
        ])
        return out
