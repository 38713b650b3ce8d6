"""Fulfillment-dict AIR: the order-bookkeeping rules as polynomial constraints.

Constrains the perpetual batch's order-fulfillment accounting
(order/order.cairo:79-127 semantics, engine analog
models/perpetual/transactions.py:update_order_fulfillment): every access
row must satisfy

    new = prev + update_amount
    update_amount   in [0, 2^64)          (bit ladder)
    full - new      in [0, 2^64)          (bit ladder; so new <= full)
    per-order continuity: the first access starts from the carried-in
    fulfilled amount, later accesses continue from the previous access's
    result, and the last access lands on the claimed final amount (the
    value written into the orders tree).

This is the first stage of the full-run arithmetization (VERDICT round-1
item 1): the dict-squash discipline of state.cairo:67-96 expressed as a
sorted access log with continuity constraints. v1 public-input model: the
access schedule (order ids, update/full amounts, message hashes) is bound
into the Fiat-Shamir transcript via ``public_inputs`` — the same model the
pooled builtin AIRs use for their claims. The message hashes double as the
linkage keys to the ECDSA pool (prove.py checks every scheduled hash is a
verified signature claim).

Block layout (128 rows per access, trace width 4):
  row 0        the access: new = prev + update; ladders seeded
  rows 0..63   both suffix ladders halve (64 bits each)
  rows 64..127 ladders pinned to zero; prev/new held constant so the next
               block's row 0 can read them through the (cur, next) window
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
NBITS = 64
AMOUNT_BOUND = 1 << 64


@dataclass(frozen=True)
class FulfillmentAccess:
    """One update_order_fulfillment call (in batch execution order)."""

    order_id: int
    update_amount: int
    full_amount: int
    message_hash: int


class FulfillmentAir(Air):
    """AIR over the sorted fulfillment access log of one batch."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 4  # prev, new, suf_a (full-new ladder), suf_b (update ladder)
    transition_degree = 3

    def __init__(
        self,
        accesses: Sequence[FulfillmentAccess],
        initial_amounts: Optional[Dict[int, int]] = None,
        final_amounts: Optional[Dict[int, int]] = None,
    ):
        assert accesses, "empty access log"
        self.initial = dict(initial_amounts or {})
        # Stable sort by order id keeps same-id accesses in execution order.
        order = sorted(range(len(accesses)), key=lambda i: (accesses[i].order_id, i))
        acc = [accesses[i] for i in order]
        for a in acc:
            assert 0 <= a.update_amount < AMOUNT_BOUND
            assert 0 <= a.full_amount < AMOUNT_BOUND
            # Perpetual order ids are 64-bit (order.cairo:79); DEX order ids
            # are the 251-bit order-message hashes. Either way the id is only
            # a (public, transcript-bound) sort key, never a traced value.
            assert 0 <= a.order_id < FIELD_PRIME
        m = 1
        while m < len(acc):
            m *= 2
        self.accesses = acc
        self.m = m  # padded block count
        self.n = BLOCK * m
        # Claimed final amounts (what the orders tree will hold): default =
        # replay of the schedule.
        if final_amounts is None:
            running = dict(self.initial)
            for a in acc:
                running[a.order_id] = running.get(a.order_id, 0) + a.update_amount
            final_amounts = running
        self.final = dict(final_amounts)

    # --- witness ------------------------------------------------------------

    def trace(self) -> List[List[int]]:
        prev_c: List[int] = []
        new_c: List[int] = []
        sa_c: List[int] = []
        sb_c: List[int] = []
        running = dict(self.initial)
        for a in self.accesses:
            prev = running.get(a.order_id, 0)
            new = prev + a.update_amount
            if new > a.full_amount:
                raise ValueError("over-fulfillment: schedule is unprovable")
            running[a.order_id] = new
            sa = a.full_amount - new
            sb = a.update_amount
            for i in range(BLOCK):
                prev_c.append(prev)
                new_c.append(new)
                sa_c.append(sa)
                sb_c.append(sb)
                if i < NBITS:
                    sa >>= 1
                    sb >>= 1
        pad_rows = (self.m - len(self.accesses)) * BLOCK
        for col in (prev_c, new_c, sa_c, sb_c):
            col.extend([0] * pad_rows)
        return [prev_c, new_c, sa_c, sb_c]

    # --- public columns -------------------------------------------------------

    def _selectors(self):
        """Per-row selector/value columns (host ints, derived from the
        public schedule)."""
        n = self.n
        cols = {
            name: [0] * n
            for name in (
                "start", "lad", "zero", "hold", "link_same", "first_bind",
                "init_amt", "last_sel", "final_amt", "update", "full",
            )
        }
        acc = self.accesses
        for k, a in enumerate(acc):
            base = k * BLOCK
            cols["start"][base] = 1
            cols["update"][base] = a.update_amount
            cols["full"][base] = a.full_amount
            for i in range(NBITS):
                cols["lad"][base + i] = 1
            for i in range(NBITS, BLOCK):
                cols["zero"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            first = k == 0 or acc[k - 1].order_id != a.order_id
            if first:
                cols["first_bind"][base] = 1
                cols["init_amt"][base] = self.initial.get(a.order_id, 0)
            else:
                # Previous block has the same order id: link across blocks.
                cols["link_same"][base - 1] = 1
            last = k == len(acc) - 1 or acc[k + 1].order_id != a.order_id
            if last:
                cols["last_sel"][base] = 1
                cols["final_amt"][base] = self.final.get(a.order_id, 0)
        return cols

    def public_columns(self) -> List[List[int]]:
        c = self._selectors()
        return [
            c["start"], c["lad"], c["zero"], c["hold"], c["link_same"],
            c["first_bind"], c["init_amt"], c["last_sel"], c["final_amt"],
            c["update"], c["full"],
        ]

    def public_inputs(self) -> List[int]:
        """Bind the full schedule + carried/final amounts into the transcript."""
        out = [len(self.accesses), self.m]
        for a in self.accesses:
            out += [a.order_id, a.update_amount, a.full_amount, a.message_hash]
        for oid in sorted(self.initial):
            out += [oid, self.initial[oid]]
        out.append(FIELD_PRIME - 1)  # domain separator
        for oid in sorted(self.final):
            out += [oid, self.final[oid]]
        return out

    # --- constraints (device, Montgomery domain) ------------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        import jax.numpy as jnp

        prev, new, sa, sb = cur
        prev_n, new_n, sa_n, sb_n = nxt
        (start, lad, zero, hold, link_same, first_bind, init_amt,
         last_sel, final_amt, update, full) = pub
        one = jnp.broadcast_to(jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), prev.shape)

        b_a = f.sub(sa, f.add(sa_n, sa_n))
        b_b = f.sub(sb, f.add(sb_n, sb_n))
        return [
            f.mont_mul(start, f.sub(new, f.add(prev, update))),        # C1
            f.mont_mul(start, f.sub(sa, f.sub(full, new))),            # C2
            f.mont_mul(start, f.sub(sb, update)),                      # C3
            f.mont_mul(lad, f.mont_mul(b_a, f.sub(b_a, one))),         # C4
            f.mont_mul(lad, f.mont_mul(b_b, f.sub(b_b, one))),         # C5
            f.mont_mul(zero, sa),                                      # C6
            f.mont_mul(zero, sb),                                      # C7
            f.mont_mul(hold, f.sub(prev_n, prev)),                     # C8
            f.mont_mul(hold, f.sub(new_n, new)),                       # C9
            f.mont_mul(link_same, f.sub(prev_n, new)),                 # C10
            f.mont_mul(first_bind, f.sub(prev, init_amt)),             # C11
            f.mont_mul(last_sel, f.sub(new, final_amt)),               # C12
        ]

    # --- constraints (host ints, verifier) -------------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        prev, new, sa, sb = cur_vals
        prev_n, new_n, sa_n, sb_n = nxt_vals
        if pub_vals:
            (start, lad, zero, hold, link_same, first_bind, init_amt,
             last_sel, final_amt, update, full) = pub_vals
        else:  # constraint-count probe
            start = lad = zero = hold = link_same = 0
            first_bind = init_amt = last_sel = final_amt = update = full = 0
        b_a = (sa - 2 * sa_n) % p
        b_b = (sb - 2 * sb_n) % p
        return [
            start * (new - prev - update) % p,
            start * (sa - (full - new)) % p,
            start * (sb - update) % p,
            lad * (b_a * (b_a - 1)) % p,
            lad * (b_b * (b_b - 1)) % p,
            zero * sa % p,
            zero * sb % p,
            hold * (prev_n - prev) % p,
            hold * (new_n - new) % p,
            link_same * (prev_n - new) % p,
            first_bind * (prev - init_amt) % p,
            last_sel * (new - final_amt) % p,
        ]


# --- v2: witnessed schedule + logUp bus ---------------------------------------


SENTINEL = FIELD_PRIME - 1  # pad-block order id (never a valid order id)
BETA_INIT = 1  # lookup-category tags (multiples of the beta challenge)
BETA_FINAL = 2
BETA_SIG = 3


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


class FulfillmentBusAir(Air):
    """Fulfillment accounting with a WITNESSED access schedule.

    The v2 of FulfillmentAir: where v1 binds the full per-access schedule
    (order ids, amounts, interleavings) into the transcript as public
    inputs — so every cross-check is public glue — here the schedule is
    private trace and the proof itself establishes, via randomized lookup
    (logUp) arguments against public tables, that:

      - each maximal run of same-id accesses starts from the public
        journal's carried-in amount and ends on its claimed final amount
        (the value the orders-tree update consumes), each id covered
        exactly once (the run-boundary tuple multiset must equal the
        journal multiset — split/duplicate runs change the count and die);
      - every access rides on a publicly claimed, signature-verified order:
        the access's (message_hash, order_id, full_amount) triple must hit
        the claims table, whose per-claim multiplicity is public.

    Public inputs shrink to: the touched-order journal {id: (init, final)}
    and the claims table [(msg, order_id, full_amount, multiplicity)].
    The claims' own integrity (msg is ECDSA-verified; (id, full) match the
    signed message content) is cross-checked against the pooled builtin
    proofs by the batch verifier (prove.py); pulling the message hash
    chain itself in-proof is the documented next stage.

    Mechanics: the lookup sums close against challenge-derived public
    values (Air.derived_challenges) — the verifier recomputes
        S =   sum_journal 1/(z - (id + a*init + b))
            + sum_journal 1/(z - (id + a*final + 2b))
            + sum_claims  mu/(z - (msg + a*id + a^2*full + 3b))
    itself, and one accumulator column must telescope to S around the
    trace cycle (divisor x^n - 1, so the wraparound row participates).
    Pad blocks carry a sentinel id so the wrap boundary (last pad -> first
    access) triggers the first access's init-side lookup.

    Reference semantics: order.cairo:79-127 fulfillment rules plus the
    dict-squash discipline of state.cairo:67-96, with Cairo's sorted-keys
    requirement replaced by the run-counting argument (no 251-bit key
    comparisons on the device).

    Block layout: 128 rows per access, as v1; row 127 of each block is the
    run-boundary row (same/winv live there; the (cur, next) window spans
    into the next block, and into row 0 at the wrap).
    """

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 10  # oid, upd, ful, msg, prev, new, sa, sb, same, winv
    n_interaction_columns = 4  # inv_i, inv_f, inv_s, acc
    n_interaction_challenges = 3  # z, a, b
    n_derived_challenges = 1  # S (lookup grand sum)
    transition_degree = 3

    def __init__(
        self,
        journal: Dict[int, Tuple[int, int]],
        claims: Sequence[Tuple[int, int, int, int]],
        n_accesses: int,
    ):
        assert n_accesses >= 1
        assert journal, "empty journal"
        for oid, (v0, v1) in journal.items():
            assert 0 <= oid < SENTINEL
            assert 0 <= v0 < AMOUNT_BOUND and 0 <= v1 < AMOUNT_BOUND
        for msg, oid, ful, mu in claims:
            assert 0 <= ful < AMOUNT_BOUND and mu >= 0
        self.journal = dict(journal)
        self.claims = [tuple(c) for c in claims]
        self.n_acc = n_accesses
        m = 1
        while m <= n_accesses:  # always >= 1 pad block (wrap boundary)
            m *= 2
        self.m = m
        self.n = BLOCK * m

    # --- witness ------------------------------------------------------------

    def trace(self, accesses: Optional[Sequence[FulfillmentAccess]] = None):
        """Build the main trace from the execution-ordered access log."""
        assert accesses is not None, "v2 trace needs the access log (witness)"
        assert len(accesses) == self.n_acc
        order = sorted(range(len(accesses)), key=lambda i: (accesses[i].order_id, i))
        acc = [accesses[i] for i in order]

        cols = [[] for _ in range(self.n_columns)]
        oid_c, upd_c, ful_c, msg_c, prev_c, new_c, sa_c, sb_c, same_c, winv_c = cols
        running = {oid: v0 for oid, (v0, _v1) in self.journal.items()}
        for k, a in enumerate(acc):
            prev = running.get(a.order_id, 0)
            new = prev + a.update_amount
            if new > a.full_amount:
                raise ValueError("over-fulfillment: schedule is unprovable")
            running[a.order_id] = new
            sa = a.full_amount - new
            sb = a.update_amount
            next_oid = acc[k + 1].order_id if k + 1 < len(acc) else SENTINEL
            for i in range(BLOCK):
                oid_c.append(a.order_id)
                upd_c.append(a.update_amount)
                ful_c.append(a.full_amount)
                msg_c.append(a.message_hash)
                prev_c.append(prev)
                new_c.append(new)
                sa_c.append(sa)
                sb_c.append(sb)
                if i < NBITS:
                    sa >>= 1
                    sb >>= 1
                if i == BLOCK - 1 and next_oid == a.order_id:
                    same_c.append(1)
                    winv_c.append(0)
                elif i == BLOCK - 1:
                    same_c.append(0)
                    winv_c.append(_inv(next_oid - a.order_id))
                else:
                    same_c.append(0)
                    winv_c.append(0)
        first_oid = acc[0].order_id
        for blk in range(self.m - len(acc)):
            last_pad = blk == self.m - len(acc) - 1
            for i in range(BLOCK):
                for c in (upd_c, ful_c, msg_c, prev_c, new_c, sa_c, sb_c):
                    c.append(0)
                oid_c.append(SENTINEL)
                if i == BLOCK - 1 and not last_pad:
                    same_c.append(1)  # pad -> pad
                    winv_c.append(0)
                elif i == BLOCK - 1:
                    same_c.append(0)  # wrap: pad -> first access
                    winv_c.append(_inv(first_oid - SENTINEL))
                else:
                    same_c.append(0)
                    winv_c.append(0)
        return cols

    # --- interaction phase ----------------------------------------------------

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, a, b, S = challenges
        oid, _upd, ful, msg, prev, new, _sa, _sb, same, _winv = main_columns
        n = self.n
        pub = self._selectors()
        a2 = a * a % p
        inv_i = [0] * n
        inv_f = [0] * n
        inv_s = [0] * n
        acc = [0] * n
        for r in range(n):
            nr = (r + 1) % n
            if pub["start_real"][r]:
                inv_s[r] = _inv(z - (msg[r] + a * oid[r] + a2 * ful[r] + BETA_SIG * b))
            if pub["bfin"][r] and not same[r]:
                inv_f[r] = _inv(z - (oid[r] + a * new[r] + BETA_FINAL * b))
            if pub["binit"][r] and not same[r]:
                inv_i[r] = _inv(z - (oid[nr] + a * prev[nr] + BETA_INIT * b))
        total = 0
        for r in range(n - 1):
            total = (total + inv_i[r] + inv_f[r] + inv_s[r]) % p
            acc[r + 1] = total
        return [inv_i, inv_f, inv_s, acc]

    def derived_challenges(self, challenges):
        p = FIELD_PRIME
        z, a, b = challenges
        a2 = a * a % p
        S = 0
        for oid in sorted(self.journal):
            v0, v1 = self.journal[oid]
            S = (S + _inv(z - (oid + a * v0 + BETA_INIT * b))) % p
            S = (S + _inv(z - (oid + a * v1 + BETA_FINAL * b))) % p
        for msg, oid, ful, mu in self.claims:
            S = (S + mu * _inv(z - (msg + a * oid + a2 * ful + BETA_SIG * b))) % p
        return [S]

    # --- public columns ---------------------------------------------------------

    _PUB_ORDER = (
        "start", "lad", "zero", "hold", "bsel", "bfin", "binit",
        "start_real", "real", "lastrow",
    )

    def _selectors(self):
        n = self.n
        cols = {name: [0] * n for name in self._PUB_ORDER}
        for k in range(self.m):
            base = k * BLOCK
            real = 1 if k < self.n_acc else 0
            next_real = 1 if k + 1 < self.n_acc or (k == self.m - 1) else 0
            cols["start"][base] = 1
            cols["start_real"][base] = real
            for i in range(NBITS):
                cols["lad"][base + i] = 1
            for i in range(NBITS, BLOCK):
                cols["zero"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            cols["bsel"][base + BLOCK - 1] = 1
            cols["bfin"][base + BLOCK - 1] = real
            cols["binit"][base + BLOCK - 1] = next_real
            if real:
                cols["real"][base : base + BLOCK] = [1] * BLOCK
        cols["lastrow"][n - 1] = 1
        return cols

    def public_columns(self):
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self):
        out = [self.n_acc, self.m]
        for oid in sorted(self.journal):
            v0, v1 = self.journal[oid]
            out += [oid, v0, v1]
        out.append(FIELD_PRIME - 1)  # separator
        for msg, oid, ful, mu in sorted(self.claims):
            out += [msg, oid, ful, mu]
        return out

    def transition_divisors(self):
        return ["trans"] * 11 + ["all"] * 7

    # --- constraints (device, Montgomery domain) ----------------------------------

    def eval_transitions_chal(self, f, cur, nxt, pub, chal):
        import jax.numpy as jnp

        oid, upd, ful, msg, prev, new, sa, sb, same, winv = cur[:10]
        oid_n, _u, _f2, _m2, prev_n, new_n, sa_n, sb_n, _s2, _w2 = nxt[:10]
        (start, lad, zero, hold, bsel, bfin, binit, start_real, real,
         lastrow) = pub
        # The framework passes main+interaction columns concatenated.
        inv_i, inv_f, inv_s, acc_c = cur[10], cur[11], cur[12], cur[13]
        acc_n = nxt[13]
        z_c, a_c, b_c, S_c = (
            jnp.broadcast_to(c, oid.shape) for c in chal
        )
        one = jnp.broadcast_to(jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), oid.shape)
        sent = jnp.broadcast_to(
            jnp.asarray(f.pack((SENTINEL << 252) % FIELD_PRIME)), oid.shape
        )

        ba = f.sub(sa, f.add(sa_n, sa_n))
        bb = f.sub(sb, f.add(sb_n, sb_n))
        w = f.sub(oid_n, oid)
        a2_c = f.mont_mul(a_c, a_c)
        b2 = f.add(b_c, b_c)
        b3 = f.add(b2, b_c)
        t_fin = f.add(oid, f.add(f.mont_mul(a_c, new), b2))
        t_init = f.add(oid_n, f.add(f.mont_mul(a_c, prev_n), b_c))
        t_sig = f.add(msg, f.add(f.mont_mul(a_c, oid), f.add(f.mont_mul(a2_c, ful), b3)))
        return [
            f.mont_mul(start, f.sub(new, f.add(prev, upd))),            # T1
            f.mont_mul(start, f.sub(sa, f.sub(ful, new))),              # T2
            f.mont_mul(start, f.sub(sb, upd)),                          # T3
            f.mont_mul(lad, f.mont_mul(ba, f.sub(ba, one))),            # T4
            f.mont_mul(lad, f.mont_mul(bb, f.sub(bb, one))),            # T5
            f.mont_mul(zero, sa),                                       # T6
            f.mont_mul(zero, sb),                                       # T7
            f.mont_mul(hold, f.sub(prev_n, prev)),                      # T8
            f.mont_mul(hold, f.sub(new_n, new)),                        # T9
            f.mont_mul(hold, f.sub(oid_n, oid)),                        # T10
            f.mont_mul(f.sub(real, one), f.sub(oid, sent)),             # T11
            f.mont_mul(bsel, f.mont_mul(same, w)),                      # A1
            f.mont_mul(bsel, f.sub(f.sub(one, same), f.mont_mul(w, winv))),  # A2
            f.mont_mul(bsel, f.mont_mul(same, f.sub(prev_n, new))),     # A3
            f.sub(f.mont_mul(inv_f, f.sub(z_c, t_fin)),
                  f.mont_mul(bfin, f.sub(one, same))),                  # A4
            f.sub(f.mont_mul(inv_i, f.sub(z_c, t_init)),
                  f.mont_mul(binit, f.sub(one, same))),                 # A5
            f.sub(f.mont_mul(inv_s, f.sub(z_c, t_sig)), start_real),    # A6
            f.add(
                f.sub(acc_n, f.add(acc_c, f.add(inv_i, f.add(inv_f, inv_s)))),
                f.mont_mul(lastrow, S_c),
            ),                                                          # A7
        ]

    # --- constraints (host ints, verifier) -----------------------------------------

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        p = FIELD_PRIME
        (oid, upd, ful, msg, prev, new, sa, sb, same, winv,
         inv_i, inv_f, inv_s, acc) = cur_vals
        (oid_n, _u, _f2, _m2, prev_n, new_n, sa_n, sb_n, _s2, _w2,
         _ii, _if, _is, acc_n) = nxt_vals
        if pub_vals:
            (start, lad, zero, hold, bsel, bfin, binit, start_real, real,
             lastrow) = pub_vals
        else:
            start = lad = zero = hold = bsel = bfin = binit = 0
            start_real = real = lastrow = 0
        z, a, b, S = chal_vals
        a2 = a * a % p
        ba = (sa - 2 * sa_n) % p
        bb = (sb - 2 * sb_n) % p
        w = (oid_n - oid) % p
        t_fin = (oid + a * new + BETA_FINAL * b) % p
        t_init = (oid_n + a * prev_n + BETA_INIT * b) % p
        t_sig = (msg + a * oid + a2 * ful + BETA_SIG * b) % p
        return [
            start * (new - prev - upd) % p,
            start * (sa - (ful - new)) % p,
            start * (sb - upd) % p,
            lad * (ba * (ba - 1)) % p,
            lad * (bb * (bb - 1)) % p,
            zero * sa % p,
            zero * sb % p,
            hold * (prev_n - prev) % p,
            hold * (new_n - new) % p,
            hold * (oid_n - oid) % p,
            (real - 1) * (oid - SENTINEL) % p,
            bsel * same * w % p,
            bsel * ((1 - same) - w * winv) % p,
            bsel * same * (prev_n - new) % p,
            (inv_f * ((z - t_fin) % p) - bfin * (1 - same)) % p,
            (inv_i * ((z - t_init) % p) - binit * (1 - same)) % p,
            (inv_s * ((z - t_sig) % p) - start_real) % p,
            (acc_n - acc - inv_i - inv_f - inv_s + lastrow * S) % p,
        ]
