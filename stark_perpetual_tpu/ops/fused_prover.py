"""Fused device-resident commitment + FRI programs for the STARK prover.

The host-orchestrated prover path (models/air.py + ops/fri.py) issues one
device round trip per tree level, per FRI fold and per Fiat-Shamir absorb.
Through a remote-TPU tunnel each round trip costs ~25 ms and each fetched
LDE costs ~60 ms/MB, so a single proof (hundreds of serial dispatches plus
Python-int churn over every LDE lane) was dispatch-bound at 70+ s steady
state even though the chip-side hash work is < 1 s.

This module collapses each commitment phase into ONE device program built
around a tiny step-list VM:

  - the whole phase (row-leaf folding, every Merkle level, the
    Pedersen-sponge Fiat-Shamir absorbs/challenges, every FRI fold) is a
    static list of fixed-shape steps over one flat (rows, 21) buffer;
  - a `lax.scan` over the step list executes them with `lax.switch` over
    four opcodes: HASH_PAIRS (tree level chunk), HASH2 (row-leaf chain /
    sponge chunk), COPY (single row), FOLD (FRI fold chunk);
  - every hash step processes exactly `chunk` lanes, so the whole program
    contains two Pedersen-MSM instantiations (pairs + two-operand) no
    matter how many levels or layers it covers — compile time and kernel
    count stay flat as proofs grow.

Only roots and query-time openings are ever fetched: the buffer stays on
the device and `gather_rows` pulls the queried rows in one dispatch per
buffer.

The programs are bit-exact with the host path: same leaf/level values,
same sponge states, same roots, identical proof bytes (asserted by
tests/test_fused_prover.py).
"""

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.field import N_LIMBS, stark_prime_field, unpack_ints
from stark_perpetual_tpu.ops.ntt import root_of_unity
from stark_perpetual_tpu.params import FIELD_PRIME

# Fixed scratch layout at the head of every VM buffer.
_ROW_ZERO = 0  # constant zero row (never written)
_ROW_STATE = 1  # sponge state / current beta
_SCRATCH0 = 8  # sa, sb, sout: one chunk each

OP_HASH_PAIRS = 0  # a: src (2*chunk interleaved pair rows), d: dst
OP_HASH2 = 1  # a, b: operand chunks, d: dst
OP_COPY = 2  # a: src row, d: dst row
OP_FOLD = 3  # a: lo, b: hi, c: inv2x table chunk, d: dst; beta = row 1


def _chunk() -> int:
    """Fixed lane count for every in-program hash step.

    4096 matches the Pallas kernel's native lane block on TPU; CPU tests
    shrink it so the XLA scan engine stays fast at tiny proof sizes.
    """
    return int(os.environ.get("STARK_HASH_CHUNK", "4096"))


def _data_base(chunk: int) -> int:
    return _SCRATCH0 + 3 * chunk


def _eager_msm():
    """Construct the MSM singleton OUTSIDE any trace: its tables become
    device constants; constructing it lazily inside a jit trace would
    cache tracers (UnexpectedTracerError on the next program)."""
    from stark_perpetual_tpu.ops.pedersen import _pedersen_msm

    return _pedersen_msm()


def _hash_block(a: jnp.ndarray, b: jnp.ndarray):
    """Pedersen hash of one (chunk, 21) std-domain block (traced)."""
    from stark_perpetual_tpu.ops.pedersen import _pedersen_msm, byte_windows

    msm = _pedersen_msm()
    digits = jnp.concatenate([byte_windows(a), byte_windows(b)], axis=-1)
    acc, bad = msm.accumulate(digits)
    x_mont, _ = msm.curve.to_affine(acc)
    return msm.f.from_mont(x_mont), jnp.any(bad)


@functools.lru_cache(maxsize=None)
def _vm_program(chunk: int, n_rows: int, n_steps: int):
    """The step-list VM: (buf (n_rows, 21), steps (n_steps, 5)) -> (buf, bad)."""
    _eager_msm()
    f = stark_prime_field()
    inv2 = pow(2, FIELD_PRIME - 2, FIELD_PRIME)
    inv2_m = np.asarray(f.pack((inv2 << 252) % FIELD_PRIME))

    def _ds(buf, start, rows):
        return jax.lax.dynamic_slice(buf, (start, 0), (rows, N_LIMBS))

    def op_hash_pairs(buf, s):
        blk = _ds(buf, s[1], 2 * chunk).reshape(chunk, 2, N_LIMBS)
        h, bad = _hash_block(blk[:, 0], blk[:, 1])
        return jax.lax.dynamic_update_slice(buf, h, (s[4], 0)), bad

    def op_hash2(buf, s):
        h, bad = _hash_block(_ds(buf, s[1], chunk), _ds(buf, s[2], chunk))
        return jax.lax.dynamic_update_slice(buf, h, (s[4], 0)), bad

    def op_copy(buf, s):
        row = _ds(buf, s[1], 1)
        return (
            jax.lax.dynamic_update_slice(buf, row, (s[4], 0)),
            jnp.zeros((), dtype=bool),
        )

    def op_fold(buf, s):
        lo = f.to_mont(_ds(buf, s[1], chunk))
        hi = f.to_mont(_ds(buf, s[2], chunk))
        tab = _ds(buf, s[3], chunk)  # inv2x table rows (already Montgomery)
        beta_m = f.to_mont(buf[_ROW_STATE])
        even = f.mont_mul(f.add(lo, hi), jnp.broadcast_to(jnp.asarray(inv2_m), lo.shape))
        odd = f.mont_mul(
            f.mont_mul(f.sub(lo, hi), tab), jnp.broadcast_to(beta_m, lo.shape)
        )
        out = f.from_mont(f.add(even, odd))
        return jax.lax.dynamic_update_slice(buf, out, (s[4], 0)), jnp.zeros(
            (), dtype=bool
        )

    @jax.jit
    def run(buf, steps):
        def body(carry, step):
            buf, bad = carry
            buf, b = jax.lax.switch(
                step[0], (op_hash_pairs, op_hash2, op_copy, op_fold), buf, step
            )
            return (buf, jnp.logical_or(bad, b)), None

        (buf, bad), _ = jax.lax.scan(body, (buf, jnp.zeros((), dtype=bool)), steps)
        return buf, bad

    return run


def _ceil_chunks(n: int, chunk: int) -> int:
    return -(-n // chunk)


def _tree_steps(leaf_off: int, n_leaves: int, chunk: int) -> Tuple[list, list]:
    """Steps hashing a full Merkle tree whose leaves sit at leaf_off.

    Levels are laid out contiguously after the leaves. Chunk writes may
    overrun a level's end; every overrun lands in a region that a later
    step overwrites (callers add tail padding after the LAST region).
    Returns (steps, level_offsets) with level_offsets[0] = leaf_off.
    """
    steps = []
    offsets = [leaf_off]
    size = n_leaves
    off = leaf_off
    while size > 1:
        nxt = off + size
        offsets.append(nxt)
        for j in range(_ceil_chunks(size // 2, chunk)):
            steps.append(
                (OP_HASH_PAIRS, off + 2 * chunk * j, 0, 0, nxt + chunk * j)
            )
        off = nxt
        size //= 2
    return steps, offsets


def _sponge_steps(value_row: int, out_row: int, chunk: int) -> list:
    """state = h(state, buf[value_row]); optionally mirror to out_row."""
    sa, sb, sout = _SCRATCH0, _SCRATCH0 + chunk, _SCRATCH0 + 2 * chunk
    steps = [
        (OP_COPY, _ROW_STATE, 0, 0, sa),
        (OP_COPY, value_row, 0, 0, sb),
        (OP_HASH2, sa, sb, 0, sout),
        (OP_COPY, sout, 0, 0, _ROW_STATE),
    ]
    if out_row is not None:
        steps.append((OP_COPY, sout, 0, 0, out_row))
    return steps


class _Plan:
    """A buffer layout + step list, host-built once per program shape."""

    def __init__(self, chunk: int):
        self.chunk = chunk
        self.n_rows = _data_base(chunk)
        self.steps: list = []

    def alloc(self, rows: int) -> int:
        off = self.n_rows
        self.n_rows += rows
        return off

    def finish(self, tail_pad: int = None):
        # Tail padding: the last chunk-granular write may overrun.
        self.n_rows += 2 * self.chunk if tail_pad is None else tail_pad
        self.steps_arr = np.asarray(self.steps, dtype=np.int32)
        return self


@functools.lru_cache(maxsize=None)
def _commit_plan(n_cols: int, big: int, chunk: int) -> _Plan:
    """Row-leaf chain over n_cols columns + full tree over `big` leaves."""
    plan = _Plan(chunk)
    cols_off = plan.alloc(n_cols * big)
    leaves_off = plan.alloc(big)  # starts zeroed: the chain's initial acc
    for c in range(n_cols):
        col_off = cols_off + c * big
        for j in range(_ceil_chunks(big, chunk)):
            # acc = h(acc, col): matches models/air._row_leaves.
            plan.steps.append(
                (
                    OP_HASH2,
                    leaves_off + chunk * j,
                    col_off + chunk * j,
                    0,
                    leaves_off + chunk * j,
                )
            )
    tree_steps, offsets = _tree_steps(leaves_off, big, chunk)
    # Tree levels live after the leaves; reserve them.
    plan.alloc(big - 1)
    plan.steps.extend(tree_steps)
    plan.cols_off = cols_off
    plan.level_offsets = offsets
    return plan.finish()


@functools.lru_cache(maxsize=None)
def _fri_plan(big: int, final_size: int, chunk: int) -> _Plan:
    """Full FRI commit phase: per layer tree + sponge + fold."""
    plan = _Plan(chunk)
    n_layers = (big // final_size).bit_length() - 1
    table_offs = []
    size = big
    for _ in range(n_layers):
        table_offs.append(plan.alloc(size // 2))
        size //= 2
    layer_value_offs = []
    layer_level_offsets = []
    size = big
    value_off = plan.alloc(big)  # layer-0 codeword
    for i in range(n_layers):
        layer_value_offs.append(value_off)
        tree_steps, offsets = _tree_steps(value_off, size, chunk)
        plan.alloc(size - 1)  # tree levels above the values
        plan.steps.extend(tree_steps)
        layer_level_offsets.append(offsets)
        root_row = offsets[-1]
        plan.steps.extend(_sponge_steps(root_row, None, chunk))  # absorb root
        plan.steps.extend(_sponge_steps(_ROW_ZERO, None, chunk))  # beta
        # Fold into the next layer's value region.
        next_off = plan.alloc(size // 2) if i < n_layers - 1 else plan.alloc(
            max(final_size, chunk)
        )
        half = size // 2
        for j in range(_ceil_chunks(half, chunk)):
            plan.steps.append(
                (
                    OP_FOLD,
                    value_off + chunk * j,
                    value_off + half + chunk * j,
                    table_offs[i] + chunk * j,
                    next_off + chunk * j,
                )
            )
        value_off = next_off
        size //= 2
    plan.codeword_off = layer_value_offs[0]
    plan.table_offs = table_offs
    plan.layer_level_offsets = layer_level_offsets
    plan.finals_off = value_off
    plan.n_layers = n_layers
    return plan.finish()


@functools.lru_cache(maxsize=None)
def _assemble_commit_program(n_cols: int, big: int, chunk: int):
    plan = _commit_plan(n_cols, big, chunk)
    vm = _vm_program(chunk, plan.n_rows, len(plan.steps))
    steps_dev = jnp.asarray(plan.steps_arr)

    @jax.jit
    def run(cols_std):
        head = jnp.zeros((plan.cols_off, N_LIMBS), dtype=jnp.int32)
        tail = jnp.zeros(
            (plan.n_rows - plan.cols_off - n_cols * big, N_LIMBS), dtype=jnp.int32
        )
        buf = jnp.concatenate(
            [head, cols_std.reshape(n_cols * big, N_LIMBS), tail], axis=0
        )
        return vm(buf, steps_dev)

    return run, plan


@functools.lru_cache(maxsize=None)
def _assemble_fri_program(big: int, final_size: int, chunk: int):
    plan = _fri_plan(big, final_size, chunk)
    vm = _vm_program(chunk, plan.n_rows, len(plan.steps))
    steps_dev = jnp.asarray(plan.steps_arr)
    tables_rows = plan.codeword_off - _data_base(chunk)

    @jax.jit
    def run(codeword_std, state_row, tables_flat):
        head = jnp.zeros((_data_base(chunk), N_LIMBS), dtype=jnp.int32)
        head = head.at[_ROW_STATE].set(state_row)
        tail = jnp.zeros(
            (plan.n_rows - plan.codeword_off - big, N_LIMBS), dtype=jnp.int32
        )
        buf = jnp.concatenate([head, tables_flat, codeword_std, tail], axis=0)
        return vm(buf, steps_dev)

    return run, plan, tables_rows


@functools.lru_cache(maxsize=None)
def _inv2x_tables_flat(big: int, offset: int, n_layers: int):
    """Montgomery 1/(2 x_i) tables for every layer, one flat device array."""
    f = stark_prime_field()
    vals = []
    size = big
    off = offset
    for _ in range(n_layers):
        w_inv = pow(root_of_unity(size), size - 1, FIELD_PRIME)
        acc = pow(2 * off % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
        for _ in range(size // 2):
            vals.append((acc << 252) % FIELD_PRIME)
            acc = acc * w_inv % FIELD_PRIME
        size //= 2
        off = off * off % FIELD_PRIME
    return jax.device_put(jnp.asarray(f.pack(vals)))


@functools.lru_cache(maxsize=None)
def _gather_program(k: int):
    """Gather k rows by flat index from a (N, 21) device buffer."""

    @jax.jit
    def run(buf, idx):
        return jnp.take(buf, idx, axis=0)

    return run


def gather_rows(buf, indices: Sequence[int]) -> List[int]:
    """Fetch buf[indices] as Python ints in one padded dispatch."""
    if len(indices) == 0:
        return []
    k = 1 << max(4, (len(indices) - 1).bit_length())
    idx = np.zeros((k,), dtype=np.int32)
    idx[: len(indices)] = np.asarray(indices, dtype=np.int32)
    rows = np.asarray(_gather_program(k)(buf, jnp.asarray(idx)))
    vals = unpack_ints(rows[: len(indices)])
    return [int(v) for v in vals]


class DeviceTree:
    """A committed Merkle tree whose levels live inside a device buffer."""

    def __init__(self, buf, level_offsets: List[int], n_leaves: int):
        self.buf = buf
        self.level_offsets = level_offsets
        self.n_leaves = n_leaves
        self.n_levels = len(level_offsets)  # includes the root level
        self._root = None

    @property
    def root(self) -> int:
        if self._root is None:
            self._root = gather_rows(self.buf, [self.level_offsets[-1]])[0]
        return self._root

    def path_indices(self, index: int) -> List[int]:
        """Flat row indices of the sibling path for a leaf index."""
        return [
            self.level_offsets[lvl] + ((index >> lvl) ^ 1)
            for lvl in range(self.n_levels - 1)
        ]

    def leaf_index(self, index: int) -> int:
        return self.level_offsets[0] + index


def commit_columns(cols_std) -> Tuple[DeviceTree, "jnp.ndarray"]:
    """Commit (n_cols, big, 21) std columns; returns (tree, bad_flag_dev).

    Leaf i = the Pedersen chain h(...h(h(0, col_0[i]), col_1[i])...) —
    bit-exact with models/air._row_leaves + ops/merkle.dense_commit_device.
    """
    n_cols, big, _ = cols_std.shape
    run, plan = _assemble_commit_program(n_cols, big, _chunk())
    buf, bad = run(cols_std)
    return DeviceTree(buf, plan.level_offsets, big), bad


class FusedFriLayers:
    """Device-resident FRI layer trees (one buffer for all layers)."""

    def __init__(self, buf, plan: _Plan):
        self.buf = buf
        self.trees = [
            DeviceTree(buf, offs, offs[1] - offs[0])
            for offs in plan.layer_level_offsets
        ]


def fri_fused(codeword_std, state: int, offset: int, final_size: int):
    """Run the fused FRI commit phase (bit-exact with ops/fri.fri_commit).

    Returns (layers: FusedFriLayers, roots: List[int],
    final_evals: List[int], state_out: int, bad_flag_dev).
    """
    f = stark_prime_field()
    big = codeword_std.shape[0]
    run, plan, tables_rows = _assemble_fri_program(big, final_size, _chunk())
    tables = _inv2x_tables_flat(big, offset, plan.n_layers)
    assert tables.shape[0] == tables_rows
    buf, bad = run(codeword_std, jnp.asarray(f.pack(state)), tables)
    layers = FusedFriLayers(buf, plan)
    # One gather for everything small: layer roots, final evals, state.
    idx = [offs[-1] for offs in plan.layer_level_offsets]
    idx += [plan.finals_off + i for i in range(final_size)]
    idx.append(_ROW_STATE)
    got = gather_rows(buf, idx)
    roots = got[: plan.n_layers]
    finals = got[plan.n_layers : plan.n_layers + final_size]
    state_out = got[-1]
    return layers, roots, finals, state_out, bad
