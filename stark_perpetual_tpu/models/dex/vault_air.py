"""Vault-cell AIR: the DEX batch's vault accounting as polynomial constraints.

DEX analog of the perpetual PositionCellAir (third stage of the full-run
arithmetization): every L2 vault mutation (vault_update.cairo:15-98) and
every L1 vault diff (l1_vault_update.cairo:104-135), recorded cell by cell,
with the dict-squash discipline of the reference's DictAccess squash
expressed as a sorted access log.

Cells:
  ('l2', vault_id)                       an L2 vault: (stark_key, token, bal)
  ('l1', eth_key, token_id, vault_index) an L1 vault: balance only (the key
                                         and token ARE the cell id)

Access kinds and their row constraints:
  'diff'  new_bal = prev_bal + diff          (vault_update.cairo:70-98)
  'set'   prev_bal = before, new_bal = after (vault_update.cairo:52-68,
                                              modifications + false full
                                              withdrawals)

Every access also:
  - range-proves the result: new_bal in [0, 2^63)  (BALANCE_BOUND, the
    vault balance window of dex/dex_constants.cairo)
  - guards key/token consistency: a non-empty prev vault keeps its
    stark_key/token_id (prev_bal * (prev_key - access_key) = 0), and a
    non-empty new vault holds the access's key/token.

Continuity per cell runs from the carried-in value (the prev-state vault,
bound as a public input) to the claimed final value (what the vault leaf
hash and Merkle update consume). Zero-balance canonicalization
(L2VaultState.canonical) is a PUBLIC property: the verifier checks
final_bal == 0 implies final_key == final_tok == 0 on the public finals;
in-trace key values of empty vaults are irrelevant to every constraint.

Block layout (64 rows per access, trace width 7):
  row 0       access semantics + range-ladder seed (suf = new_bal)
  rows 0..62  suf halves (63 bits)
  row 63      suf pinned to zero; state columns held so the next block's
              row 0 reads them through the (cur, next) window
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 64
NBITS = 63
BALANCE_BOUND = 1 << 63

_KINDS = ("diff", "set")


@dataclass(frozen=True)
class VaultAccess:
    """One recorded vault mutation (execution order)."""

    cell: tuple  # ('l2', vault_id) | ('l1', eth_key, token_id, vault_index)
    kind: str  # 'diff' | 'set'
    stark_key: int
    token_id: int
    op1: int  # diff (may be negative) | balance_before
    op2: int  # 0 | balance_after

    def cell_words(self) -> Tuple[int, int, int, int]:
        """Cell id as field elements for the transcript."""
        if self.cell[0] == "l2":
            return (0, self.cell[1], 0, 0)
        return (1, self.cell[1], self.cell[2], self.cell[3])


def accesses_from_log(log) -> List[VaultAccess]:
    """DexCarriedState.vault_access_log records -> typed accesses."""
    out = []
    for space, cell_key, kind, key, tok, op1, op2 in log:
        cell = ("l2", cell_key) if space == "l2" else ("l1", *cell_key)
        out.append(VaultAccess(cell, kind, key, tok, op1, op2))
    return out


def initial_cells_from_state(vaults, l1_min_balances) -> Dict[tuple, tuple]:
    """Carried-in (balance, key, token) cell values from the prev state."""
    cells: Dict[tuple, tuple] = {}
    for vid, v in vaults.items():
        c = v.canonical()
        cells[("l2", vid)] = (c.balance, c.stark_key, c.token_id)
    for (eth, tok, idx), bal in l1_min_balances.items():
        cells[("l1", eth, tok, idx)] = (bal, eth, tok)
    return cells


def final_cells_from_state(final_vaults, l1_final_balances) -> Dict[tuple, tuple]:
    cells: Dict[tuple, tuple] = {}
    for vid, v in final_vaults.items():
        c = v.canonical()
        cells[("l2", vid)] = (c.balance, c.stark_key, c.token_id)
    for (eth, tok, idx), bal in l1_final_balances.items():
        cells[("l1", eth, tok, idx)] = (bal, eth, tok)
    return cells


class DexVaultCellAir(Air):
    """AIR over the sorted vault-cell access log of one DEX batch."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 7  # pb, nb, pk, nk, pt, nt, suf
    transition_degree = 3

    def __init__(
        self,
        accesses: Sequence[VaultAccess],
        initial_cells: Optional[Dict[tuple, tuple]] = None,
        final_cells: Optional[Dict[tuple, tuple]] = None,
    ):
        assert accesses, "empty access log"
        self.initial = dict(initial_cells or {})
        order = sorted(range(len(accesses)), key=lambda i: (accesses[i].cell, i))
        acc = [accesses[i] for i in order]
        for a in acc:
            assert a.kind in _KINDS
        m = 1
        while m < len(acc):
            m *= 2
        if m == len(acc):
            # Always keep at least one pad block: the global last row is
            # exempt from transition constraints ('trans' divisor), and the
            # last access's zero-pin (row 63) must not land on it.
            m *= 2
        self.accesses = acc
        self.m = m
        self.n = BLOCK * m
        if final_cells is None:
            final_cells = self._replay()[1]
        self.final = dict(final_cells)

    # --- replay ---------------------------------------------------------------

    def _replay(self):
        """Per-access (prev, new) triples + final cells from the public
        schedule. Raises if an access violates the window/guard rules (an
        honest engine never logs such an access)."""
        running = dict(self.initial)
        rows = []
        for a in self.accesses:
            pb, pk, pt = running.get(a.cell, (0, 0, 0))
            if pb != 0 and (pk != a.stark_key or pt != a.token_id):
                raise ValueError(f"key/token mismatch on non-empty vault: {a}")
            if a.kind == "diff":
                nb = pb + a.op1
            else:  # set
                if pb != a.op1:
                    raise ValueError(f"balance_before mismatch: {a} (prev {pb})")
                nb = a.op2
            if not 0 <= nb < BALANCE_BOUND:
                raise ValueError(f"vault balance out of range: {a} -> {nb}")
            running[a.cell] = (nb, a.stark_key, a.token_id)
            rows.append(((pb, pk, pt), (nb, a.stark_key, a.token_id)))
        return rows, running

    # --- witness ----------------------------------------------------------------

    def trace(self) -> List[List[int]]:
        rows, _final = self._replay()
        cols = [[] for _ in range(self.n_columns)]
        pb_c, nb_c, pk_c, nk_c, pt_c, nt_c, suf_c = cols
        for (pb, pk, pt), (nb, nk, nt) in rows:
            suf = nb
            for i in range(BLOCK):
                pb_c.append(pb)
                nb_c.append(nb)
                pk_c.append(pk)
                nk_c.append(nk)
                pt_c.append(pt)
                nt_c.append(nt)
                suf_c.append(suf)
                if i < NBITS:
                    suf >>= 1
        pad_rows = (self.m - len(self.accesses)) * BLOCK
        for col in cols:
            col.extend([0] * pad_rows)
        return cols

    # --- public columns -----------------------------------------------------------

    _PUB_ORDER = (
        "sel_diff", "sel_set", "start", "lad", "zero", "hold", "link_same",
        "first_bind", "last_sel", "acc_key", "acc_tok", "op1", "op2",
        "init_bal", "init_key", "init_tok", "final_bal", "final_key",
        "final_tok",
    )

    def _selectors(self):
        n = self.n
        cols = {name: [0] * n for name in self._PUB_ORDER}
        acc = self.accesses
        for k, a in enumerate(acc):
            base = k * BLOCK
            cols["start"][base] = 1
            cols["sel_" + a.kind][base] = 1
            cols["acc_key"][base] = a.stark_key % FIELD_PRIME
            cols["acc_tok"][base] = a.token_id % FIELD_PRIME
            cols["op1"][base] = a.op1 % FIELD_PRIME
            cols["op2"][base] = a.op2 % FIELD_PRIME
            for i in range(NBITS):
                cols["lad"][base + i] = 1
            for i in range(NBITS, BLOCK):
                cols["zero"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            first = k == 0 or acc[k - 1].cell != a.cell
            if first:
                cols["first_bind"][base] = 1
                ib, ik, it = self.initial.get(a.cell, (0, 0, 0))
                cols["init_bal"][base] = ib % FIELD_PRIME
                cols["init_key"][base] = ik % FIELD_PRIME
                cols["init_tok"][base] = it % FIELD_PRIME
            else:
                cols["link_same"][base - 1] = 1
            last = k == len(acc) - 1 or acc[k + 1].cell != a.cell
            if last:
                cols["last_sel"][base] = 1
                fb, fk, ft = self.final.get(a.cell, (0, 0, 0))
                cols["final_bal"][base] = fb % FIELD_PRIME
                cols["final_key"][base] = fk % FIELD_PRIME
                cols["final_tok"][base] = ft % FIELD_PRIME
        return cols

    def public_columns(self) -> List[List[int]]:
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self) -> List[int]:
        out = [len(self.accesses), self.m]
        for a in self.accesses:
            out += [
                *a.cell_words(), _KINDS.index(a.kind),
                a.stark_key % FIELD_PRIME, a.token_id % FIELD_PRIME,
                a.op1 % FIELD_PRIME, a.op2 % FIELD_PRIME,
            ]
        for cell in sorted(self.initial):
            b, k, t = self.initial[cell]
            out += [*VaultAccess(cell, "diff", 0, 0, 0, 0).cell_words(),
                    b % FIELD_PRIME, k % FIELD_PRIME, t % FIELD_PRIME]
        out.append(FIELD_PRIME - 1)  # separator
        for cell in sorted(self.final):
            b, k, t = self.final[cell]
            out += [*VaultAccess(cell, "diff", 0, 0, 0, 0).cell_words(),
                    b % FIELD_PRIME, k % FIELD_PRIME, t % FIELD_PRIME]
        return out

    # --- constraints (device, Montgomery domain) --------------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        import jax.numpy as jnp

        pb, nb, pk, nk, pt, nt, suf = cur
        pb_n, nb_n, pk_n, nk_n, pt_n, nt_n, suf_n = nxt
        (sel_diff, sel_set, start, lad, zero, hold, link_same, first_bind,
         last_sel, acc_key, acc_tok, op1, op2, init_bal, init_key, init_tok,
         final_bal, final_key, final_tok) = pub
        one = jnp.broadcast_to(jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), pb.shape)

        b = f.sub(suf, f.add(suf_n, suf_n))
        return [
            f.mont_mul(sel_diff, f.sub(nb, f.add(pb, op1))),           # diff
            f.mont_mul(sel_set, f.sub(pb, op1)),                       # set pre
            f.mont_mul(sel_set, f.sub(nb, op2)),                       # set post
            f.mont_mul(start, f.mont_mul(pb, f.sub(pk, acc_key))),     # prev key guard
            f.mont_mul(start, f.mont_mul(pb, f.sub(pt, acc_tok))),     # prev tok guard
            f.mont_mul(start, f.mont_mul(nb, f.sub(nk, acc_key))),     # new key bind
            f.mont_mul(start, f.mont_mul(nb, f.sub(nt, acc_tok))),     # new tok bind
            f.mont_mul(start, f.sub(suf, nb)),                         # range seed
            f.mont_mul(lad, f.mont_mul(b, f.sub(b, one))),             # bit ladder
            f.mont_mul(zero, suf),                                     # range pin
            f.mont_mul(hold, f.sub(pb_n, pb)),
            f.mont_mul(hold, f.sub(nb_n, nb)),
            f.mont_mul(hold, f.sub(pk_n, pk)),
            f.mont_mul(hold, f.sub(nk_n, nk)),
            f.mont_mul(hold, f.sub(pt_n, pt)),
            f.mont_mul(hold, f.sub(nt_n, nt)),
            f.mont_mul(link_same, f.sub(pb_n, nb)),                    # continuity
            f.mont_mul(link_same, f.sub(pk_n, nk)),
            f.mont_mul(link_same, f.sub(pt_n, nt)),
            f.mont_mul(first_bind, f.sub(pb, init_bal)),
            f.mont_mul(first_bind, f.sub(pk, init_key)),
            f.mont_mul(first_bind, f.sub(pt, init_tok)),
            f.mont_mul(last_sel, f.sub(nb, final_bal)),
            f.mont_mul(last_sel, f.mont_mul(nb, f.sub(nk, final_key))),
            f.mont_mul(last_sel, f.mont_mul(nb, f.sub(nt, final_tok))),
        ]

    # --- constraints (host ints, verifier) ---------------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        pb, nb, pk, nk, pt, nt, suf = cur_vals
        pb_n, nb_n, pk_n, nk_n, pt_n, nt_n, suf_n = nxt_vals
        if pub_vals:
            (sel_diff, sel_set, start, lad, zero, hold, link_same, first_bind,
             last_sel, acc_key, acc_tok, op1, op2, init_bal, init_key,
             init_tok, final_bal, final_key, final_tok) = pub_vals
        else:  # constraint-count probe
            sel_diff = sel_set = start = lad = zero = hold = link_same = 0
            first_bind = last_sel = acc_key = acc_tok = op1 = op2 = 0
            init_bal = init_key = init_tok = final_bal = final_key = final_tok = 0
        b = (suf - 2 * suf_n) % p
        return [
            sel_diff * (nb - pb - op1) % p,
            sel_set * (pb - op1) % p,
            sel_set * (nb - op2) % p,
            start * pb * (pk - acc_key) % p,
            start * pb * (pt - acc_tok) % p,
            start * nb * (nk - acc_key) % p,
            start * nb * (nt - acc_tok) % p,
            start * (suf - nb) % p,
            lad * (b * (b - 1)) % p,
            zero * suf % p,
            hold * (pb_n - pb) % p,
            hold * (nb_n - nb) % p,
            hold * (pk_n - pk) % p,
            hold * (nk_n - nk) % p,
            hold * (pt_n - pt) % p,
            hold * (nt_n - nt) % p,
            link_same * (pb_n - nb) % p,
            link_same * (pk_n - nk) % p,
            link_same * (pt_n - nt) % p,
            first_bind * (pb - init_bal) % p,
            first_bind * (pk - init_key) % p,
            first_bind * (pt - init_tok) % p,
            last_sel * (nb - final_bal) % p,
            last_sel * nb * (nk - final_key) % p,
            last_sel * nb * (nt - final_tok) % p,
        ]
