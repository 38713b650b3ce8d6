"""Position-cell AIR v2: witnessed schedule + in-proof funding-total argument.

The bus migration of ``PositionCellAir`` (position_air.py), completing the
dual-view memory argument its v1 docstring names as the next stage. Where
v1 binds the full ordered access schedule into the transcript as public
inputs and checks funding-total consistency by a verifier-side replay
(``validate_funding_totals``), here the schedule is private trace and the
proof itself establishes everything:

  - **Sorted view** (one 128-row block per access, grouped by cell): the
    per-access semantics of position.cairo / add_asset.cairo / funding.cairo
    as row constraints — balance deltas, cached-index writes, the funding
    floor division with its explicit 32-bit remainder — plus 64-bit range
    ladders on every result, per-cell continuity across blocks, and
    **time-ordering inside each cell run** (a 32-bit ladder on the gap of
    the execution-time column), which is what makes the funding balance
    *reads* sound: a read must return the cell's value at its execution
    moment, not a stale one.
  - **Execution view** (one row per access, the first ``m`` trace rows):
    the access stream in execution order, where a funding event
    (funding.cairo:31-127) is a contiguous run ``rd, idx, rd, idx, ..., adj``
    per position. Adjacency constraints pin each idx write to its preceding
    balance read (same position/asset, read value forwarded into the term),
    and a running-total column accumulates ``(g - cached) * balance`` so the
    event's 'adj' operand is *proven* equal to the sum — the funding-total
    term argument, in-proof.
  - **logUp buses** tie everything together: a permutation argument makes
    the two views the same access multiset; run-boundary lookups bind every
    cell run to the public journal {cell: (carried_in, final)} exactly once;
    claims lookups bind every transaction mutation to the public update
    table, every funding idx write to the public (epoch, asset) -> index
    table, and every funding application to the public (position, epoch)
    event table — all with public multiplicities, so phantom or dropped
    accesses change a sum and die.

Public surface: the journal, the three claims tables, and the access count.
The reference semantics proven: position.cairo:92-113 and add_asset.cairo
(balance deltas), funding.cairo:31-127 (index rewrites + the floor-division
collateral adjustment with its per-asset terms), and the dict-squash
discipline of state.cairo:67-96 as the journal-bound run accounting.

Block layout (sorted view): 128 rows per access; row 0 carries the access
and seeds the ladders; rows 0..63 halve the 64-bit result ladder; rows
0..31 halve the 32-bit remainder and time-gap ladders; row 127 is the run
boundary (same/winv; the (cur, next) window spans into the next block and
wraps to row 0 at the end). Pad blocks carry a sentinel position id so the
wrap boundary triggers the first real block's init-side lookup.
"""

from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.models.perpetual.position_air import (
    BLOCK,
    PositionCellAccess,
    TAG_ASSET,
    TAG_COLLATERAL,
    TAG_INDEX,
)
from stark_perpetual_tpu.params import FIELD_PRIME

B32 = 1 << 32
B63 = 1 << 63
B64 = 1 << 64
SENTINEL = FIELD_PRIME - 1  # pad-block position id (never a valid id)

# Lookup-category tags (multiples of the beta challenge).
BETA_INIT = 1
BETA_FINAL = 2
BETA_PERM = 3
BETA_UPD = 4
BETA_G = 5
BETA_EV = 6

Cell = Tuple[int, int, int]


def _inv(x: int) -> int:
    return pow(x % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)


def _flags_of(a: PositionCellAccess) -> Tuple[int, int, int, int, int]:
    """(fb, fiu, fif, fa, fr) for one access."""
    if a.kind == "bal":
        return (1, 0, 0, 0, 0)
    if a.kind == "idx":
        return (0, 0, 1, 0, 0) if a.phase == "fund" else (0, 1, 0, 0, 0)
    if a.kind == "adj":
        return (0, 0, 0, 1, 0)
    assert a.kind == "rd"
    return (0, 0, 0, 0, 1)


def _kcode(flags) -> int:
    fb, fiu, fif, fa, fr = flags
    return fiu + 2 * fif + 3 * fa + 4 * fr


def public_surface_from_accesses(
    accesses: Sequence[PositionCellAccess],
    initial_cells: Dict[Cell, int],
):
    """(journal, upd_claims, fund_claims, event_claims) of one batch.

    journal: {cell: (carried_in, final)} for every touched cell.
    upd_claims: [(pid, tag, aid, kcode, operand, mult)], kcode 0=bal 1=idx.
    fund_claims: [(epoch, aid, g_index, mult)] — consistent per (epoch, aid).
    event_claims: [(pid, epoch, mult)] — one per funding application.
    """
    running: Dict[Cell, int] = {}
    touched: Dict[Cell, int] = {}  # cell -> carried-in value
    upd: Dict[Tuple[int, int, int, int, int], int] = {}
    fund: Dict[Tuple[int, int], Tuple[int, int]] = {}  # (eid, aid) -> (g, mult)
    events: Dict[Tuple[int, int], int] = {}
    for a in accesses:
        if a.cell not in touched:
            touched[a.cell] = initial_cells.get(a.cell, 0)
            running[a.cell] = touched[a.cell]
        prev = running[a.cell]
        if a.kind in ("bal", "rd"):
            running[a.cell] = prev + a.operand
        elif a.kind == "idx":
            running[a.cell] = a.operand
        else:
            running[a.cell] = (prev * B32 - a.operand) >> 32
        if a.phase == "upd":
            kcode = 0 if a.kind == "bal" else 1
            key = (a.position_id, a.tag, a.asset_id, kcode, a.operand % FIELD_PRIME)
            upd[key] = upd.get(key, 0) + 1
        elif a.kind == "idx":
            key = (a.epoch, a.asset_id)
            g, mult = fund.get(key, (a.operand, 0))
            assert g == a.operand, (
                f"inconsistent funding index for epoch {a.epoch} asset "
                f"{a.asset_id:#x}: {g} vs {a.operand}"
            )
            fund[key] = (g, mult + 1)
        elif a.kind == "adj":
            key = (a.position_id, a.epoch)
            events[key] = events.get(key, 0) + 1
    journal = {cell: (touched[cell], running[cell]) for cell in touched}
    upd_claims = [k + (mu,) for k, mu in sorted(upd.items())]
    fund_claims = [
        (eid, aid, g % FIELD_PRIME, mu)
        for (eid, aid), (g, mu) in sorted(fund.items())
    ]
    event_claims = [(pid, eid, mu) for (pid, eid), mu in sorted(events.items())]
    return journal, upd_claims, fund_claims, event_claims


class PositionBusAir(Air):
    """Position accounting with a WITNESSED access schedule (see module doc).

    Main columns (30):
      sorted view  (16): pid tag aid t  fb fiu fif fa fr  prev new op
                         sa sb st same
      execution view (14): apid atag aaid  afb afiu afif afa afr
                           aprev anew aop abal aft aeid
    Interaction columns (7): winv inv_pB inv_i inv_f inv_pA inv_c acc
    Challenges: z, alpha, beta (drawn) + S (derived lookup grand sum).
    """

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 30
    n_interaction_columns = 7
    n_interaction_challenges = 3
    n_derived_challenges = 1
    transition_degree = 3

    def __init__(
        self,
        journal: Dict[Cell, Tuple[int, int]],
        upd_claims: Sequence[Tuple[int, int, int, int, int, int]],
        fund_claims: Sequence[Tuple[int, int, int, int]],
        event_claims: Sequence[Tuple[int, int, int]],
        n_accesses: int,
    ):
        assert n_accesses >= 1
        assert journal, "empty journal"
        for (pid, tag, aid), (v0, v1) in journal.items():
            assert 0 <= pid < SENTINEL and tag in (0, 1, 2) and 0 <= aid < FIELD_PRIME
            assert -B63 <= v0 < B63 and -B63 <= v1 < B63
        for pid, tag, aid, kcode, _op, mu in upd_claims:
            assert tag in (0, 1, 2) and kcode in (0, 1) and mu >= 0
        for _eid, _aid, _g, mu in fund_claims:
            assert mu >= 0
        for _pid, _eid, mu in event_claims:
            assert mu >= 0
        self.journal = dict(journal)
        self.upd_claims = [tuple(c) for c in upd_claims]
        self.fund_claims = [tuple(c) for c in fund_claims]
        self.event_claims = [tuple(c) for c in event_claims]
        self.n_acc = n_accesses
        m = 1
        while m <= n_accesses:  # always >= 1 pad block (wrap boundary)
            m *= 2
        self.m = m
        self.n = BLOCK * m

    # --- witness ------------------------------------------------------------

    def _replay(self, accesses: Sequence[PositionCellAccess]):
        """Execution-order replay: per-access (prev, new, rem) + final cells."""
        running = {cell: v0 for cell, (v0, _v1) in self.journal.items()}
        rows = []
        for a in accesses:
            prev = running.get(a.cell, 0)
            if a.kind in ("bal", "rd"):
                new = prev + a.operand
                rem = 0
            elif a.kind == "idx":
                new = a.operand
                rem = 0
            else:  # adj
                fxp = prev * B32 - a.operand
                new = fxp >> 32
                rem = fxp - new * B32
            if not -B63 <= new < B63:
                raise ValueError(f"cell value out of range: {a} -> {new}")
            running[a.cell] = new
            rows.append((prev, new, rem))
        return rows, running

    def trace(self, accesses: Optional[Sequence[PositionCellAccess]] = None):
        """Build the main trace from the execution-ordered access log."""
        assert accesses is not None, "v2 trace needs the access log (witness)"
        assert len(accesses) == self.n_acc
        rows, final = self._replay(accesses)
        for cell, (_v0, v1) in self.journal.items():
            if final.get(cell, 0) != v1:
                raise ValueError(f"replay does not land on journal final: {cell}")

        n, m, p = self.n, self.m, FIELD_PRIME
        cols = [[0] * n for _ in range(self.n_columns)]
        (pid_c, tag_c, aid_c, t_c, fb_c, fiu_c, fif_c, fa_c, fr_c, prev_c,
         new_c, op_c, sa_c, sb_c, st_c, same_c, apid_c, atag_c, aaid_c,
         afb_c, afiu_c, afif_c, afa_c, afr_c, aprev_c, anew_c, aop_c,
         abal_c, aft_c, aeid_c) = cols

        # --- execution view: rows 0..n_acc-1 -------------------------------
        ft = 0
        last_rd_value = 0
        for i, a in enumerate(accesses):
            prev, new, _rem = rows[i]
            fb, fiu, fif, fa, fr = _flags_of(a)
            apid_c[i] = a.position_id
            atag_c[i] = a.tag
            aaid_c[i] = a.asset_id
            afb_c[i], afiu_c[i], afif_c[i], afa_c[i], afr_c[i] = fb, fiu, fif, fa, fr
            aprev_c[i] = prev % p
            anew_c[i] = new % p
            aop_c[i] = a.operand % p
            aeid_c[i] = a.epoch if (fif or fa or fr) else 0
            aft_c[i] = ft % p
            if fr:
                last_rd_value = new
            if fif:
                abal_c[i] = last_rd_value % p
                ft += (a.operand - prev) * last_rd_value
            if fa:
                if ft != a.operand:
                    raise ValueError(
                        f"funding total mismatch at access {i}: {ft} vs {a.operand}"
                    )
                ft = 0

        # --- sorted view: one block per access, grouped by cell ------------
        order = sorted(range(len(accesses)), key=lambda i: (accesses[i].cell, i))
        prev_block_cell = None
        prev_block_t = None
        for k in range(m):
            base = k * BLOCK
            if k < self.n_acc:
                i = order[k]
                a = accesses[i]
                prev, new, rem = rows[i]
                cell = a.cell
                flags = _flags_of(a)
                t = i
                sa = (new + B63)  # new - (-2^63), a 64-bit value
                sb = rem
                op = a.operand % p
            else:
                cell = (SENTINEL, 0, 0)
                flags = (0, 0, 0, 0, 0)
                prev = new = sb = op = 0
                sa = 0
                t = self.n_acc + (k - self.n_acc)
            st = 0
            if prev_block_cell == cell:
                st = t - prev_block_t - 1
                assert st >= 0, "sorted view must be time-ordered within a run"
            for r in range(BLOCK):
                pid_c[base + r] = cell[0]
                tag_c[base + r] = cell[1]
                aid_c[base + r] = cell[2]
                t_c[base + r] = t
                fb_c[base + r], fiu_c[base + r], fif_c[base + r] = flags[:3]
                fa_c[base + r], fr_c[base + r] = flags[3:]
                prev_c[base + r] = prev % p
                new_c[base + r] = new % p
                op_c[base + r] = op
                sa_c[base + r] = sa
                sb_c[base + r] = sb
                st_c[base + r] = st
                if r < 64:
                    sa >>= 1
                if r < 32:
                    sb >>= 1
                    st >>= 1
            # Run boundary marker at row 127: does the next block (cyclically)
            # continue this cell?
            if k + 1 < m:
                if k + 1 < self.n_acc:
                    next_cell = accesses[order[k + 1]].cell
                else:
                    next_cell = (SENTINEL, 0, 0)
            else:
                next_cell = accesses[order[0]].cell  # wrap to block 0
            same_c[base + BLOCK - 1] = 1 if next_cell == cell else 0
            prev_block_cell, prev_block_t = cell, t
        return cols

    # --- interaction phase ----------------------------------------------------

    def _tuple_b(self, al, be, pid, tag, aid, t, kcode, prev, new, op):
        p = FIELD_PRIME
        al2 = al * al % p
        return (
            t + al * pid + al2 * tag + al * al2 % p * aid
            + pow(al, 4, p) * kcode + pow(al, 5, p) * prev
            + pow(al, 6, p) * new + pow(al, 7, p) * op + BETA_PERM * be
        ) % p

    def build_interaction(self, main_columns, challenges):
        p = FIELD_PRIME
        z, al, be, _S = challenges
        (pid, tag, aid, t, fb, fiu, fif, fa, fr, prev, new, op, _sa, _sb,
         _st, same) = main_columns[:16]
        (apid, atag, aaid, afb, afiu, afif, afa, afr, aprev, anew, aop,
         _abal, _aft, aeid) = main_columns[16:30]
        n, m = self.n, self.m
        pub = self._selectors()
        al2, al3, al4 = al * al % p, 0, 0
        al3 = al2 * al % p
        al4 = al3 * al % p

        winv = [0] * n
        inv_pb = [0] * n
        inv_i = [0] * n
        inv_f = [0] * n
        inv_pa = [0] * n
        inv_c = [0] * n
        acc = [0] * n
        for k in range(m):
            r = k * BLOCK + BLOCK - 1
            nr = (r + 1) % n
            if not same[r]:
                w = (
                    (pid[nr] - pid[r]) + al * (tag[nr] - tag[r])
                    + al2 * (aid[nr] - aid[r])
                ) % p
                winv[r] = _inv(w)
                if pub["bfin"][r]:
                    inv_f[r] = _inv(
                        z - (pid[r] + al * tag[r] + al2 * aid[r]
                             + al3 * new[r] + BETA_FINAL * be)
                    )
                if pub["binit"][r]:
                    inv_i[r] = _inv(
                        z - (pid[nr] + al * tag[nr] + al2 * aid[nr]
                             + al3 * prev[nr] + BETA_INIT * be)
                    )
            if pub["breal"][k * BLOCK]:
                b = k * BLOCK
                kcode = (fiu[b] + 2 * fif[b] + 3 * fa[b] + 4 * fr[b]) % p
                inv_pb[b] = _inv(
                    z - self._tuple_b(al, be, pid[b], tag[b], aid[b], t[b],
                                      kcode, prev[b], new[b], op[b])
                )
        for r in range(self.n_acc):
            kcode = (afiu[r] + 2 * afif[r] + 3 * afa[r] + 4 * afr[r]) % p
            inv_pa[r] = _inv(
                z - self._tuple_b(al, be, apid[r], atag[r], aaid[r], r,
                                  kcode, aprev[r], anew[r], aop[r])
            )
            if afb[r] or afiu[r]:
                inv_c[r] = _inv(
                    z - (apid[r] + al * atag[r] + al2 * aaid[r]
                         + al3 * afiu[r] + al4 * aop[r] + BETA_UPD * be)
                )
            elif afif[r]:
                inv_c[r] = _inv(
                    z - (aeid[r] + al * aaid[r] + al2 * aop[r] + BETA_G * be)
                )
            elif afa[r]:
                inv_c[r] = _inv(
                    z - (apid[r] + al * aeid[r] + BETA_EV * be)
                )
        total = 0
        for r in range(n - 1):
            total = (total + inv_i[r] + inv_f[r] + inv_c[r]
                     + inv_pa[r] - inv_pb[r]) % p
            acc[r + 1] = total
        return [winv, inv_pb, inv_i, inv_f, inv_pa, inv_c, acc]

    def derived_challenges(self, challenges):
        p = FIELD_PRIME
        z, al, be = challenges
        al2, al3, al4 = al * al % p, 0, 0
        al3 = al2 * al % p
        al4 = al3 * al % p
        S = 0
        for (pid, tag, aid), (v0, v1) in sorted(self.journal.items()):
            S = (S + _inv(z - (pid + al * tag + al2 * aid + al3 * v0
                               + BETA_INIT * be))) % p
            S = (S + _inv(z - (pid + al * tag + al2 * aid + al3 * v1
                               + BETA_FINAL * be))) % p
        for pid, tag, aid, kcode, op, mu in self.upd_claims:
            S = (S + mu * _inv(z - (pid + al * tag + al2 * aid + al3 * kcode
                                    + al4 * op + BETA_UPD * be))) % p
        for eid, aid, g, mu in self.fund_claims:
            S = (S + mu * _inv(z - (eid + al * aid + al2 * g
                                    + BETA_G * be))) % p
        for pid, eid, mu in self.event_claims:
            S = (S + mu * _inv(z - (pid + al * eid + BETA_EV * be))) % p
        return [S]

    # --- public columns ---------------------------------------------------------

    _PUB_ORDER = (
        "start", "breal", "lad", "lad32", "zero64", "zero32", "hold",
        "bsel", "bfin", "binit", "real", "lastrow", "alive", "arow", "row0",
    )

    def _selectors(self):
        n, m = self.n, self.m
        cols = {name: [0] * n for name in self._PUB_ORDER}
        for k in range(m):
            base = k * BLOCK
            real = 1 if k < self.n_acc else 0
            next_real = 1 if (k + 1 < self.n_acc or k == m - 1) else 0
            cols["start"][base] = 1
            cols["breal"][base] = real
            for i in range(64):
                cols["lad"][base + i] = 1
            for i in range(32):
                cols["lad32"][base + i] = 1
            for i in range(64, BLOCK):
                cols["zero64"][base + i] = 1
            for i in range(32, BLOCK):
                cols["zero32"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            cols["bsel"][base + BLOCK - 1] = 1
            cols["bfin"][base + BLOCK - 1] = real
            cols["binit"][base + BLOCK - 1] = next_real
            if real:
                cols["real"][base : base + BLOCK] = [1] * BLOCK
        cols["lastrow"][n - 1] = 1
        for r in range(self.n_acc):
            cols["alive"][r] = 1
        for r in range(m):
            cols["arow"][r] = r
        cols["row0"][0] = 1
        return cols

    def public_columns(self):
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self):
        out = [self.n_acc, self.m]
        for cell in sorted(self.journal):
            v0, v1 = self.journal[cell]
            out += [*cell, v0 % FIELD_PRIME, v1 % FIELD_PRIME]
        out.append(FIELD_PRIME - 1)  # separator
        for c in self.upd_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 2)
        for c in self.fund_claims:
            out += [v % FIELD_PRIME for v in c]
        out.append(FIELD_PRIME - 3)
        for c in self.event_claims:
            out += [v % FIELD_PRIME for v in c]
        return out

    # Divisor plan: block-local sorted-view rules and row-local execution-view
    # rules use the transition divisor; run-boundary rules, the execution
    # view's (cur, next) adjacency/accumulator chains and the bus columns
    # reference the cyclic wrap (row n-1 -> row 0) and divide by x^n - 1.
    def transition_divisors(self):
        return (
            ["trans"] * 26  # B1..B26
            + ["all"] * 6  # B27..B32 (boundary rules, wrap participates)
            + ["trans"] * 17  # A1..A17 booleanity/shape rules
            + ["all"] * 12  # A18..A29 adjacency/ft chain rules
            + ["trans"] * 2  # A31..A32 adj-total read + ft seed
            + ["all"] * 7  # I1..I7 interaction buses
        )

    # --- constraints (host ints, verifier) -------------------------------------

    def transition_exprs_host_chal(self, cur_vals, nxt_vals, pub_vals, chal_vals):
        p = FIELD_PRIME
        (pid, tag, aid, t, fb, fiu, fif, fa, fr, prev, new, op, sa, sb, st,
         same, apid, atag, aaid, afb, afiu, afif, afa, afr, aprev, anew,
         aop, abal, aft, aeid, winv, inv_pb, inv_i, inv_f, inv_pa, inv_c,
         acc) = cur_vals
        (pid_n, tag_n, aid_n, t_n, _fb2, _fiu2, _fif2, _fa2, _fr2, prev_n,
         new_n, _op2, sa_n, sb_n, st_n, _same2, apid_n, _atag2, aaid_n,
         _afb2, _afiu2, afif_n, afa_n, afr_n, _aprev2, _anew2, _aop2,
         abal_n, aft_n, aeid_n, _winv2, _invpb2, _invi2, _invf2, _invpa2,
         _invc2, acc_n) = nxt_vals
        if pub_vals:
            (start, breal, lad, lad32, zero64, zero32, hold, bsel, bfin,
             binit, real, lastrow, alive, arow, row0) = pub_vals
        else:  # constraint-count probe
            start = breal = lad = lad32 = zero64 = zero32 = hold = 0
            bsel = bfin = binit = real = lastrow = alive = arow = row0 = 0
        z, al, be, S = chal_vals
        al2 = al * al % p
        al3 = al2 * al % p
        al4 = al3 * al % p
        al5 = al4 * al % p
        al6 = al5 * al % p
        al7 = al6 * al % p

        ba = (sa - 2 * sa_n) % p
        bb = (sb - 2 * sb_n) % p
        bs = (st - 2 * st_n) % p
        kcode = (fiu + 2 * fif + 3 * fa + 4 * fr) % p
        akcode = (afiu + 2 * afif + 3 * afa + 4 * afr) % p
        w = ((pid_n - pid) + al * (tag_n - tag) + al2 * (aid_n - aid)) % p
        tup_b = (t + al * pid + al2 * tag + al3 * aid + al4 * kcode
                 + al5 * prev + al6 * new + al7 * op + BETA_PERM * be) % p
        tup_a = (arow + al * apid + al2 * atag + al3 * aaid + al4 * akcode
                 + al5 * aprev + al6 * anew + al7 * aop + BETA_PERM * be) % p
        t_init = (pid_n + al * tag_n + al2 * aid_n + al3 * prev_n
                  + BETA_INIT * be) % p
        t_fin = (pid + al * tag + al2 * aid + al3 * new + BETA_FINAL * be) % p
        t_upd = (apid + al * atag + al2 * aaid + al3 * afiu + al4 * aop
                 + BETA_UPD * be) % p
        t_g = (aeid + al * aaid + al2 * aop + BETA_G * be) % p
        t_ev = (apid + al * aeid + BETA_EV * be) % p
        T = ((afb + afiu) * t_upd + afif * t_g + afa * t_ev) % p

        return [
            # --- sorted view, block-local (trans) --------------------------
            fb * (fb - 1) % p,                                       # B1
            fiu * (fiu - 1) % p,                                     # B2
            fif * (fif - 1) % p,                                     # B3
            fa * (fa - 1) % p,                                       # B4
            fr * (fr - 1) % p,                                       # B5
            breal * (fb + fiu + fif + fa + fr - 1) % p,              # B6
            start * fb * (new - prev - op) % p,                      # B7
            start * fr * (new - prev) % p,                           # B8
            start * fr * op % p,                                     # B9
            start * (fiu + fif) % p * (new - op) % p,                # B10
            start * fa * (prev * B32 - op - new * B32 - sb) % p,     # B11
            breal * (sa - new - B63) % p,                            # B12
            breal * (1 - fa) % p * sb % p,                           # B13
            lad * (ba * (ba - 1)) % p,                               # B14
            lad * (bb * (bb - 1)) % p,                               # B15
            lad32 * (bs * (bs - 1)) % p,                             # B16
            zero64 * sa % p,                                         # B17
            zero32 * sb % p,                                         # B18
            zero32 * st % p,                                         # B19
            hold * (prev_n - prev) % p,                              # B20
            hold * (new_n - new) % p,                                # B21
            hold * (pid_n - pid) % p,                                # B22
            hold * (tag_n - tag) % p,                                # B23
            hold * (aid_n - aid) % p,                                # B24
            hold * (t_n - t) % p,                                    # B25
            (real - 1) * (pid - SENTINEL) % p,                       # B26
            # --- sorted view, run boundaries (all: wrap participates) ------
            bsel * same * (pid_n - pid) % p,                         # B27
            bsel * same * (tag_n - tag) % p,                         # B28
            bsel * same * (aid_n - aid) % p,                         # B29
            bsel * same * (prev_n - new) % p,                        # B30
            bsel * same * (st_n - (t_n - t - 1)) % p,                # B31
            bsel * (1 - same) % p * st_n % p,                        # B32
            # --- execution view, row-local (trans) -------------------------
            afb * (afb - 1) % p,                                     # A1
            afiu * (afiu - 1) % p,                                   # A2
            afif * (afif - 1) % p,                                   # A3
            afa * (afa - 1) % p,                                     # A4
            afr * (afr - 1) % p,                                     # A5
            alive * (afb + afiu + afif + afa + afr - 1) % p,         # A6
            (1 - alive) * afb % p,                                   # A7
            (1 - alive) * afiu % p,                                  # A8
            (1 - alive) * afif % p,                                  # A9
            (1 - alive) * afa % p,                                   # A10
            (1 - alive) * afr % p,                                   # A11
            afr * (atag - TAG_ASSET) % p,                            # A12
            (afiu + afif) * (atag - TAG_INDEX) % p,                  # A13
            afa * (atag - TAG_COLLATERAL) % p,                       # A14
            afa * aaid % p,                                          # A15
            afb * atag % p * (atag - 1) % p,                         # A16
            afb * (1 - atag) % p * aaid % p,                         # A17
            # --- execution view, adjacency + ft chain (all) ----------------
            afr * (1 - afif_n) % p,                                  # A18
            afif_n * (1 - afr) % p,                                  # A19
            afif_n * (apid_n - apid) % p,                            # A20
            afif_n * (aaid_n - aaid) % p,                            # A21
            afif_n * (abal_n - anew) % p,                            # A22
            afif * (1 - afr_n - afa_n) % p,                          # A23
            afif * (apid_n - apid) % p,                              # A24
            afr * (aeid_n - aeid) % p,                               # A25
            afif * (aeid_n - aeid) % p,                              # A26
            (afb + afiu + afr) * (aft_n - aft) % p,                  # A27
            afif * (aft_n - aft - (aop - aprev) * abal) % p,         # A28
            afa * aft_n % p,                                         # A29
            # --- execution view, row-local (trans) -------------------------
            afa * (aop - aft) % p,                                   # A31
            row0 * aft % p,                                          # A32
            # --- buses (all) ------------------------------------------------
            bsel * ((1 - same) - w * winv) % p,                      # I1
            (inv_pb * ((z - tup_b) % p) - breal) % p,                # I2
            (inv_i * ((z - t_init) % p) - binit * (1 - same)) % p,   # I3
            (inv_f * ((z - t_fin) % p) - bfin * (1 - same)) % p,     # I4
            (inv_pa * ((z - tup_a) % p) - alive) % p,                # I5
            (inv_c * ((z - T) % p)
             - (afb + afiu + afif + afa)) % p,                       # I6
            (acc_n - acc - inv_i - inv_f - inv_c - inv_pa + inv_pb
             + lastrow * S) % p,                                     # I7
        ]

    # --- constraints (device, Montgomery domain) ----------------------------------

    def eval_transitions_chal(self, f, cur, nxt, pub, chal):
        import jax.numpy as jnp

        p = FIELD_PRIME
        (pid, tag, aid, t, fb, fiu, fif, fa, fr, prev, new, op, sa, sb, st,
         same, apid, atag, aaid, afb, afiu, afif, afa, afr, aprev, anew,
         aop, abal, aft, aeid, winv, inv_pb, inv_i, inv_f, inv_pa, inv_c,
         acc) = cur
        (pid_n, tag_n, aid_n, t_n, _fb2, _fiu2, _fif2, _fa2, _fr2, prev_n,
         new_n, _op2, sa_n, sb_n, st_n, _same2, apid_n, _atag2, aaid_n,
         _afb2, _afiu2, afif_n, afa_n, afr_n, _aprev2, _anew2, _aop2,
         abal_n, aft_n, aeid_n, _winv2, _invpb2, _invi2, _invf2, _invpa2,
         _invc2, acc_n) = nxt
        (start, breal, lad, lad32, zero64, zero32, hold, bsel, bfin, binit,
         real, lastrow, alive, arow, row0) = pub
        z_c, al_c, be_c, S_c = (jnp.broadcast_to(c, pid.shape) for c in chal)

        def bc(v):
            return jnp.broadcast_to(
                jnp.asarray(f.pack((v << 252) % p)), pid.shape
            )

        one = bc(1)
        b32 = bc(B32)
        b63 = bc(B63)
        sent = bc(SENTINEL)
        mul = f.mont_mul
        sub = f.sub
        add = f.add

        al2 = mul(al_c, al_c)
        al3 = mul(al2, al_c)
        al4 = mul(al3, al_c)
        al5 = mul(al4, al_c)
        al6 = mul(al5, al_c)
        al7 = mul(al6, al_c)
        be_i = mul(be_c, bc(BETA_INIT))
        be_f = mul(be_c, bc(BETA_FINAL))
        be_p = mul(be_c, bc(BETA_PERM))
        be_u = mul(be_c, bc(BETA_UPD))
        be_g = mul(be_c, bc(BETA_G))
        be_e = mul(be_c, bc(BETA_EV))

        ba = sub(sa, add(sa_n, sa_n))
        bb = sub(sb, add(sb_n, sb_n))
        bs = sub(st, add(st_n, st_n))
        kcode = add(fiu, add(add(fif, fif), add(mul(bc(3), fa), mul(bc(4), fr))))
        akcode = add(
            afiu, add(add(afif, afif), add(mul(bc(3), afa), mul(bc(4), afr)))
        )
        w = add(
            sub(pid_n, pid),
            add(mul(al_c, sub(tag_n, tag)), mul(al2, sub(aid_n, aid))),
        )

        def lin8(x0, x1, x2, x3, x4, x5, x6, x7, beta_tag):
            out = x0
            for coef, x in ((al_c, x1), (al2, x2), (al3, x3), (al4, x4),
                            (al5, x5), (al6, x6), (al7, x7)):
                out = add(out, mul(coef, x))
            return add(out, beta_tag)

        tup_b = lin8(t, pid, tag, aid, kcode, prev, new, op, be_p)
        tup_a = lin8(arow, apid, atag, aaid, akcode, aprev, anew, aop, be_p)
        t_init = add(
            pid_n,
            add(mul(al_c, tag_n), add(mul(al2, aid_n),
                                      add(mul(al3, prev_n), be_i))),
        )
        t_fin = add(
            pid,
            add(mul(al_c, tag), add(mul(al2, aid), add(mul(al3, new), be_f))),
        )
        t_upd = add(
            apid,
            add(mul(al_c, atag),
                add(mul(al2, aaid),
                    add(mul(al3, afiu), add(mul(al4, aop), be_u)))),
        )
        t_g = add(aeid, add(mul(al_c, aaid), add(mul(al2, aop), be_g)))
        t_ev = add(apid, add(mul(al_c, aeid), be_e))
        T = add(
            mul(add(afb, afiu), t_upd), add(mul(afif, t_g), mul(afa, t_ev))
        )

        return [
            mul(fb, sub(fb, one)),                                   # B1
            mul(fiu, sub(fiu, one)),                                 # B2
            mul(fif, sub(fif, one)),                                 # B3
            mul(fa, sub(fa, one)),                                   # B4
            mul(fr, sub(fr, one)),                                   # B5
            mul(breal, sub(add(fb, add(fiu, add(fif, add(fa, fr)))), one)),  # B6
            mul(start, mul(fb, sub(new, add(prev, op)))),            # B7
            mul(start, mul(fr, sub(new, prev))),                     # B8
            mul(start, mul(fr, op)),                                 # B9
            mul(start, mul(add(fiu, fif), sub(new, op))),            # B10
            mul(start, mul(fa, sub(sub(mul(prev, b32), op),
                                   add(mul(new, b32), sb)))),        # B11
            mul(breal, sub(sa, add(new, b63))),                      # B12
            mul(breal, mul(sub(one, fa), sb)),                       # B13
            mul(lad, mul(ba, sub(ba, one))),                         # B14
            mul(lad, mul(bb, sub(bb, one))),                         # B15
            mul(lad32, mul(bs, sub(bs, one))),                       # B16
            mul(zero64, sa),                                         # B17
            mul(zero32, sb),                                         # B18
            mul(zero32, st),                                         # B19
            mul(hold, sub(prev_n, prev)),                            # B20
            mul(hold, sub(new_n, new)),                              # B21
            mul(hold, sub(pid_n, pid)),                              # B22
            mul(hold, sub(tag_n, tag)),                              # B23
            mul(hold, sub(aid_n, aid)),                              # B24
            mul(hold, sub(t_n, t)),                                  # B25
            mul(sub(real, one), sub(pid, sent)),                     # B26
            mul(bsel, mul(same, sub(pid_n, pid))),                   # B27
            mul(bsel, mul(same, sub(tag_n, tag))),                   # B28
            mul(bsel, mul(same, sub(aid_n, aid))),                   # B29
            mul(bsel, mul(same, sub(prev_n, new))),                  # B30
            mul(bsel, mul(same, sub(st_n, sub(sub(t_n, t), one)))),  # B31
            mul(bsel, mul(sub(one, same), st_n)),                    # B32
            mul(afb, sub(afb, one)),                                 # A1
            mul(afiu, sub(afiu, one)),                               # A2
            mul(afif, sub(afif, one)),                               # A3
            mul(afa, sub(afa, one)),                                 # A4
            mul(afr, sub(afr, one)),                                 # A5
            mul(alive, sub(add(afb, add(afiu, add(afif, add(afa, afr)))),
                           one)),                                    # A6
            mul(sub(one, alive), afb),                               # A7
            mul(sub(one, alive), afiu),                              # A8
            mul(sub(one, alive), afif),                              # A9
            mul(sub(one, alive), afa),                               # A10
            mul(sub(one, alive), afr),                               # A11
            mul(afr, sub(atag, bc(TAG_ASSET))),                      # A12
            mul(add(afiu, afif), sub(atag, bc(TAG_INDEX))),          # A13
            mul(afa, atag),                                          # A14 (TAG_COLLATERAL = 0)
            mul(afa, aaid),                                          # A15
            mul(afb, mul(atag, sub(atag, one))),                     # A16
            mul(afb, mul(sub(one, atag), aaid)),                     # A17
            mul(afr, sub(one, afif_n)),                              # A18
            mul(afif_n, sub(one, afr)),                              # A19
            mul(afif_n, sub(apid_n, apid)),                          # A20
            mul(afif_n, sub(aaid_n, aaid)),                          # A21
            mul(afif_n, sub(abal_n, anew)),                          # A22
            mul(afif, sub(one, add(afr_n, afa_n))),                  # A23
            mul(afif, sub(apid_n, apid)),                            # A24
            mul(afr, sub(aeid_n, aeid)),                             # A25
            mul(afif, sub(aeid_n, aeid)),                            # A26
            mul(add(afb, add(afiu, afr)), sub(aft_n, aft)),          # A27
            mul(afif, sub(sub(aft_n, aft),
                          mul(sub(aop, aprev), abal))),              # A28
            mul(afa, aft_n),                                         # A29
            mul(afa, sub(aop, aft)),                                 # A31
            mul(row0, aft),                                          # A32
            mul(bsel, sub(sub(one, same), mul(w, winv))),            # I1
            sub(mul(inv_pb, sub(z_c, tup_b)), breal),                # I2
            sub(mul(inv_i, sub(z_c, t_init)),
                mul(binit, sub(one, same))),                         # I3
            sub(mul(inv_f, sub(z_c, t_fin)),
                mul(bfin, sub(one, same))),                          # I4
            sub(mul(inv_pa, sub(z_c, tup_a)), alive),                # I5
            sub(mul(inv_c, sub(z_c, T)),
                add(afb, add(afiu, add(afif, afa)))),                # I6
            add(
                sub(acc_n, add(acc, add(inv_i, add(inv_f,
                                                   add(inv_c, inv_pa))))),
                add(inv_pb, mul(lastrow, S_c)),
            ),                                                       # I7
        ]
