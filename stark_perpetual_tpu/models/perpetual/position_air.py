"""Position-cell AIR: balance/funding accounting as polynomial constraints.

Second stage of the full-run arithmetization (after fulfillment_air.py):
the batch's position mutations, recorded cell by cell, with the dict-squash
discipline of state.cairo:67-96 expressed as a sorted access log.

Cells (key = (position_id, tag, asset_id)):
  tag 0  collateral balance of a position
  tag 1  a synthetic asset balance
  tag 2  a cached funding index

Access kinds and their row constraints:
  'bal'  new = prev + delta                      (position.cairo:92-113,
                                                  add_asset.cairo:17-209)
  'idx'  new = g_idx (the global funding index)  (funding.cairo:99-117)
  'adj'  funding application on collateral with the floor-division
         remainder made explicit (funding.cairo:31-127):
             prev * 2^32 - total = new * 2^32 + rem,  rem in [0, 2^32)
         where total = sum((g - cached) * balance) over the position's
         assets at that moment.

Every row also range-proves its result: new - range_base in [0, 2^64)
(range_base = -2^63 for balances and funding indices: the BALANCE and
FUNDING_INDEX windows of definitions/constants.cairo:9-58). Continuity per
cell runs from the carried-in value (the prev-state position, bound as a
public input) to the claimed final value (what the position leaf hash and
Merkle update consume).

v1 public-input model: the access schedule (keys, kinds, phases, operands)
and the initial/final cell values are bound into the transcript via
``public_inputs`` — the committed witness is the running values and the
range/remainder ladders. Funding ``total`` consistency with the per-asset
terms is checked by ``validate_funding_totals`` (an execution-order replay
of the same public schedule, run by both prover and verifier); folding it
into the trace is part of the dual-view (memory-argument) migration, the
same stage as witnessing this AIR's schedule like FulfillmentBusAir does.

Block layout: 128 rows per access, trace width 4 (prev, new, suf_a, suf_b):
  row 0        access semantics + ladder seeds
  rows 0..63   suf_a halves (64-bit range of new - range_base)
  rows 0..31   suf_b halves ('adj': the 32-bit remainder; 0 otherwise)
  rows 32..127 suf_b pinned 0; rows 64..127 suf_a pinned 0
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.air import Air
from stark_perpetual_tpu.params import FIELD_PRIME

BLOCK = 128
B32 = 1 << 32
B64 = 1 << 64
BAL_LOWER = -(1 << 63)
IDX_LOWER = -(1 << 63)

TAG_COLLATERAL = 0
TAG_ASSET = 1
TAG_INDEX = 2

_KINDS = ("bal", "idx", "adj", "rd")


@dataclass(frozen=True)
class PositionCellAccess:
    """One recorded cell mutation (execution order)."""

    position_id: int
    tag: int
    asset_id: int
    kind: str  # 'bal' | 'idx' | 'adj' | 'rd' (read: new = prev, operand 0)
    operand: int  # delta (bal) / g_idx (idx) / total funding term (adj)
    # 'fund' for funding-event writes (idx terms sum into the next 'adj'),
    # 'upd' for transaction mutations. Part of the public schedule: the
    # funding-total validator depends on it.
    phase: str = "upd"
    # Funding epoch in force when a 'fund' record was applied (number of
    # funding ticks executed before it); keys the bus AIR's public
    # (epoch, asset) -> global-index table.
    epoch: int = 0

    @property
    def cell(self) -> Tuple[int, int, int]:
        return (self.position_id, self.tag, self.asset_id)


def accesses_from_log(log) -> List[PositionCellAccess]:
    """CarriedState.position_access_log records -> typed accesses.

    Engine record kinds: 'col' (collateral delta), 'bal' (asset delta),
    'idx' (cached-index write), 'adj' (funding adjustment), 'rd' (funding
    balance read). 'col' maps to the AIR's 'bal' constraint on the
    collateral cell.
    """
    tag_of = {
        "col": TAG_COLLATERAL,
        "bal": TAG_ASSET,
        "idx": TAG_INDEX,
        "adj": TAG_COLLATERAL,
        "rd": TAG_ASSET,
    }
    out = []
    for position_id, kind, asset_id, _prev, _new, operand, phase, epoch in log:
        air_kind = "bal" if kind == "col" else kind
        out.append(
            PositionCellAccess(
                position_id, tag_of[kind],
                0 if kind in ("col", "adj") else asset_id,
                air_kind, operand, phase, epoch,
            )
        )
    return out


def validate_funding_totals(
    accesses: Sequence[PositionCellAccess],
    initial_cells: Dict[Tuple[int, int, int], int],
) -> bool:
    """Execution-order replay check: every 'adj' operand must equal the sum
    of its funding event's per-asset terms (g_idx - cached) * balance
    (funding.cairo:31-127). This closes the cross-row gap the AIR's sorted
    per-cell view cannot see: the AIR proves each cell evolves by its
    operand; this check pins the 'adj' operands to the idx/balance history
    of the same public schedule.

    The schedule is public, so this is verifier-side work (O(len(log)));
    folding it into the trace is part of the dual-view (memory-argument)
    migration.
    """
    cells = dict(initial_cells)
    pending: Dict[int, int] = {}
    for a in accesses:
        if a.kind == "rd":
            continue  # read: no state change, no pending term
        if a.kind == "bal":
            cells[a.cell] = cells.get(a.cell, 0) + a.operand
        elif a.kind == "idx":
            if a.phase == "fund":
                cached = cells.get(a.cell, 0)
                balance = cells.get((a.position_id, TAG_ASSET, a.asset_id), 0)
                pending[a.position_id] = (
                    pending.get(a.position_id, 0) + (a.operand - cached) * balance
                )
            cells[a.cell] = a.operand
        else:  # adj
            if a.operand != pending.pop(a.position_id, 0):
                return False
            prev = cells.get(a.cell, 0)
            cells[a.cell] = (prev * B32 - a.operand) >> 32
    # A funding event must complete with its 'adj' row.
    return not pending


def initial_cells_from_positions(positions) -> Dict[Tuple[int, int, int], int]:
    """Carried-in cell values from the prev-state position dict."""
    cells: Dict[Tuple[int, int, int], int] = {}
    for pid, pos in positions.items():
        cells[(pid, TAG_COLLATERAL, 0)] = pos.collateral_balance
        for a in pos.assets:
            cells[(pid, TAG_ASSET, a.asset_id)] = a.balance
            cells[(pid, TAG_INDEX, a.asset_id)] = a.cached_funding_index
    return cells


class PositionCellAir(Air):
    """AIR over the sorted position-cell access log of one batch."""

    composition_static = True  # traced constraints use no per-instance state
    n_columns = 4  # prev, new, suf_a, suf_b
    transition_degree = 3

    def __init__(
        self,
        accesses: Sequence[PositionCellAccess],
        initial_cells: Optional[Dict[Tuple[int, int, int], int]] = None,
        final_cells: Optional[Dict[Tuple[int, int, int], int]] = None,
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
        self.accesses = acc
        self.m = m
        self.n = BLOCK * m
        if final_cells is None:
            final_cells = self._replay()[1]
        self.final = dict(final_cells)

    # --- replay ---------------------------------------------------------------

    def _replay(self):
        """(per-access (prev, new, rem), final cell values) from the public
        schedule. Raises if an access violates the window rules (an honest
        engine never logs such an access)."""
        running = dict(self.initial)
        rows = []
        for a in self.accesses:
            prev = running.get(a.cell, 0)
            if a.kind in ("bal", "rd"):
                new = prev + a.operand  # rd: operand 0, new = prev
                rem = 0
                base = BAL_LOWER
            elif a.kind == "idx":
                new = a.operand
                rem = 0
                base = IDX_LOWER
            else:  # adj
                fxp = prev * B32 - a.operand
                new = fxp >> 32
                rem = fxp - new * B32
                base = BAL_LOWER
            if not 0 <= new - base < B64:
                raise ValueError(f"cell value out of range: {a} -> {new}")
            running[a.cell] = new
            rows.append((prev, new, rem))
        return rows, running

    # --- witness ----------------------------------------------------------------

    def trace(self) -> List[List[int]]:
        rows, _final = self._replay()
        prev_c: List[int] = []
        new_c: List[int] = []
        sa_c: List[int] = []
        sb_c: List[int] = []
        for a, (prev, new, rem) in zip(self.accesses, rows):
            base = BAL_LOWER if a.kind != "idx" else IDX_LOWER
            sa = new - base
            sb = rem
            for i in range(BLOCK):
                prev_c.append(prev % FIELD_PRIME)
                new_c.append(new % FIELD_PRIME)
                sa_c.append(sa)
                sb_c.append(sb)
                if i < 64:
                    sa >>= 1
                    sb >>= 1
        pad_rows = (self.m - len(self.accesses)) * BLOCK
        for col in (prev_c, new_c, sa_c, sb_c):
            col.extend([0] * pad_rows)
        return [prev_c, new_c, sa_c, sb_c]

    # --- public columns -----------------------------------------------------------

    def _selectors(self):
        n = self.n
        names = (
            "sel_bal", "sel_idx", "sel_adj", "start", "lad", "zero64", "zero32",
            "hold", "link_same", "first_bind", "init_val", "last_sel",
            "final_val", "operand", "rng_base",
        )
        cols = {name: [0] * n for name in names}
        acc = self.accesses
        for k, a in enumerate(acc):
            base = k * BLOCK
            cols["start"][base] = 1
            # 'rd' rides the bal constraint (new = prev + 0).
            cols["sel_" + ("bal" if a.kind == "rd" else a.kind)][base] = 1
            cols["operand"][base] = a.operand % FIELD_PRIME
            cols["rng_base"][base] = (BAL_LOWER if a.kind != "idx" else IDX_LOWER) % FIELD_PRIME
            for i in range(64):
                cols["lad"][base + i] = 1
            for i in range(64, BLOCK):
                cols["zero64"][base + i] = 1
            for i in range(32, BLOCK):
                cols["zero32"][base + i] = 1
            for i in range(BLOCK - 1):
                cols["hold"][base + i] = 1
            first = k == 0 or acc[k - 1].cell != a.cell
            if first:
                cols["first_bind"][base] = 1
                cols["init_val"][base] = self.initial.get(a.cell, 0) % FIELD_PRIME
            else:
                cols["link_same"][base - 1] = 1
            last = k == len(acc) - 1 or acc[k + 1].cell != a.cell
            if last:
                cols["last_sel"][base] = 1
                cols["final_val"][base] = self.final.get(a.cell, 0) % FIELD_PRIME
        return cols

    _PUB_ORDER = (
        "sel_bal", "sel_idx", "sel_adj", "start", "lad", "zero64", "zero32",
        "hold", "link_same", "first_bind", "init_val", "last_sel",
        "final_val", "operand", "rng_base",
    )

    def public_columns(self) -> List[List[int]]:
        c = self._selectors()
        return [c[name] for name in self._PUB_ORDER]

    def public_inputs(self) -> List[int]:
        out = [len(self.accesses), self.m]
        for a in self.accesses:
            out += [
                a.position_id, a.tag, a.asset_id,
                # phase rides the kind word (bit 2): the funding-total
                # validator's verdict depends on it, so it must be bound.
                _KINDS.index(a.kind) + (4 if a.phase == "fund" else 0),
                a.operand % FIELD_PRIME,
            ]
        for cell in sorted(self.initial):
            out += [*cell, self.initial[cell] % FIELD_PRIME]
        out.append(FIELD_PRIME - 1)  # separator
        for cell in sorted(self.final):
            out += [*cell, self.final[cell] % FIELD_PRIME]
        return out

    # --- constraints (device) -------------------------------------------------------

    def eval_transitions(self, f, cur, nxt, pub):
        import jax.numpy as jnp

        prev, new, sa, sb = cur
        prev_n, new_n, sa_n, sb_n = nxt
        (sel_bal, sel_idx, sel_adj, start, lad, zero64, zero32, hold,
         link_same, first_bind, init_val, last_sel, final_val, operand,
         rng_base) = pub
        one = jnp.broadcast_to(jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), prev.shape)
        b32 = f.consts((B32 << 252) % FIELD_PRIME, prev.shape[:-1])

        b_a = f.sub(sa, f.add(sa_n, sa_n))
        b_b = f.sub(sb, f.add(sb_n, sb_n))
        # adj: prev*2^32 - total = new*2^32 + rem  (rem = suf_b at row 0)
        adj_lhs = f.sub(f.mont_mul(prev, b32), operand)
        adj_rhs = f.add(f.mont_mul(new, b32), sb)
        return [
            f.mont_mul(sel_bal, f.sub(new, f.add(prev, operand))),   # bal delta
            f.mont_mul(sel_idx, f.sub(new, operand)),                # idx write
            f.mont_mul(sel_adj, f.sub(adj_lhs, adj_rhs)),            # funding floor
            f.mont_mul(start, f.sub(sa, f.sub(new, rng_base))),      # range seed
            f.mont_mul(f.sub(start, sel_adj), sb),                   # sb = 0 unless adj
            f.mont_mul(lad, f.mont_mul(b_a, f.sub(b_a, one))),
            f.mont_mul(lad, f.mont_mul(b_b, f.sub(b_b, one))),
            f.mont_mul(zero64, sa),
            f.mont_mul(zero32, sb),
            f.mont_mul(hold, f.sub(prev_n, prev)),
            f.mont_mul(hold, f.sub(new_n, new)),
            f.mont_mul(link_same, f.sub(prev_n, new)),
            f.mont_mul(first_bind, f.sub(prev, init_val)),
            f.mont_mul(last_sel, f.sub(new, final_val)),
        ]

    # --- constraints (host) ----------------------------------------------------------

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        p = FIELD_PRIME
        prev, new, sa, sb = cur_vals
        prev_n, new_n, sa_n, sb_n = nxt_vals
        if pub_vals:
            (sel_bal, sel_idx, sel_adj, start, lad, zero64, zero32, hold,
             link_same, first_bind, init_val, last_sel, final_val, operand,
             rng_base) = pub_vals
        else:  # constraint-count probe
            sel_bal = sel_idx = sel_adj = start = lad = zero64 = zero32 = 0
            hold = link_same = first_bind = init_val = last_sel = 0
            final_val = operand = rng_base = 0
        b_a = (sa - 2 * sa_n) % p
        b_b = (sb - 2 * sb_n) % p
        adj_lhs = (prev * B32 - operand) % p
        adj_rhs = (new * B32 + sb) % p
        return [
            sel_bal * (new - prev - operand) % p,
            sel_idx * (new - operand) % p,
            sel_adj * (adj_lhs - adj_rhs) % p,
            start * (sa - (new - rng_base)) % p,
            (start - sel_adj) * sb % p,
            lad * (b_a * (b_a - 1)) % p,
            lad * (b_b * (b_b - 1)) % p,
            zero64 * sa % p,
            zero32 * sb % p,
            hold * (prev_n - prev) % p,
            hold * (new_n - new) % p,
            link_same * (prev_n - new) % p,
            first_bind * (prev - init_val) % p,
            last_sel * (new - final_val) % p,
        ]
