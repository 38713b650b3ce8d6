"""State commitment + program output serialization (the main() epilogue).

Parity:
  - state.cairo:118-210 (apply updates, shared-state serialization)
  - output/program_output.cairo:107-156 (ProgramOutput word layout)
  - output/data_availability.cairo:24-81 + position/serialize_change.cairo
  - main.cairo:41-195 (page splitting for rollup DA)

Merkle commitments run on the batched device hashing engines (SparseMerkleTree
over the Pedersen kernel); the word serialization is host-side (it is the
public on-chain artifact, byte-exact by construction).
"""

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from stark_perpetual_tpu.models.perpetual.engine import ProgramInput, execute_batch
from stark_perpetual_tpu.models.perpetual.objects import (
    ASSET_ID_UPPER_BOUND,
    BALANCE_LOWER_BOUND,
    BALANCE_UPPER_BOUND,
    FUNDING_INDEX_LOWER_BOUND,
    FundingIndicesInfo,
    Position,
    ROLLUP_MODE,
    SharedState,
    VALIDIUM_MODE,
    proof_assert,
)
from stark_perpetual_tpu.models.perpetual.position import hash_positions
from stark_perpetual_tpu.models.perpetual.transactions import PerpetualOutputs
from stark_perpetual_tpu.ops.merkle import SparseMerkleTree
from stark_perpetual_tpu.public.config_hash import (
    calculate_asset_hash,
    calculate_general_config_hash,
)


def general_config_hash_felt(config) -> int:
    """general_config_hash.cairo:98-148 via the byte-level chain (identical)."""
    cfg = _config_as_tool_dict(config)
    return int.from_bytes(calculate_general_config_hash(cfg), "big")


def asset_config_hash_entries(config) -> List[Tuple[int, int]]:
    """general_config_hash.cairo:150-184: [(asset_id, config_hash)]."""
    cfg = _config_as_tool_dict(config)
    out = []
    for info in config.synthetic_assets_info:
        h = calculate_asset_hash(cfg, hex(info.asset_id))
        out.append((info.asset_id, int.from_bytes(h, "big")))
    return out


def _config_as_tool_dict(config) -> dict:
    return {
        "max_funding_rate": config.max_funding_rate,
        "collateral_asset_info": {
            "asset_id": config.collateral_asset_info.asset_id,
            "resolution": config.collateral_asset_info.resolution,
        },
        "fee_position_info": {
            "position_id": config.fee_position_info.position_id,
            "public_key": config.fee_position_info.public_key,
        },
        "positions_tree_height": config.positions_tree_height,
        "orders_tree_height": config.orders_tree_height,
        "timestamp_validation_config": {
            "price_validity_period": config.timestamp_validation_config.price_validity_period,
            "funding_validity_period": config.timestamp_validation_config.funding_validity_period,
        },
        "data_availability_mode": config.data_availability_mode,
        "is_risk_by_balance_only": config.is_risk_by_balance_only,
        "synthetic_assets_info": {
            hex(i.asset_id): {
                "resolution": i.resolution,
                "risk_factor": {
                    "segments": [
                        {"upper_bound": s.upper_bound, "risk": s.risk}
                        for s in i.risk_factor_segments
                    ]
                },
                "oracle_price_signed_asset_ids": list(i.oracle_price_signed_asset_ids),
                "oracle_price_quorum": i.oracle_price_quorum,
                "oracle_price_signers": list(i.oracle_price_signers),
            }
            for i in config.synthetic_assets_info
        },
    }


# --- state trees -----------------------------------------------------------


class PerpetualStateTrees:
    """Positions + orders sparse Merkle trees with batched leaf hashing.

    The empty-position leaf hash is the tree default (a fresh tree of empty
    positions has the canonical empty root).
    """

    def __init__(self, positions_height: int, orders_height: int):
        from stark_perpetual_tpu.models.perpetual.objects import EMPTY_POSITION

        empty_leaf = hash_positions([EMPTY_POSITION])[0]
        self.positions_tree = SparseMerkleTree(positions_height, empty_leaf=empty_leaf)
        self.orders_tree = SparseMerkleTree(orders_height, empty_leaf=0)

    def load_positions(self, positions: Dict[int, Position]) -> int:
        items = sorted(positions.items())
        if items:
            leaves = hash_positions([p for _i, p in items])
            self.positions_tree.update([(i, h) for (i, _p), h in zip(items, leaves)])
        return self.positions_tree.root

    def load_orders(self, orders: Dict[int, int]) -> int:
        if orders:
            self.orders_tree.update(sorted(orders.items()))
        return self.orders_tree.root

    def apply_position_updates(self, journal: Dict[int, Tuple[Position, Position]]) -> int:
        """hash_position_updates + merkle_multi_update (state.cairo:145-163)."""
        items = sorted(journal.items())
        changed = [(i, new) for i, (prev, new) in items if prev != new]
        if changed:
            leaves = hash_positions([p for _i, p in changed])
            self.positions_tree.update([(i, h) for (i, _p), h in zip(changed, leaves)])
        return self.positions_tree.root

    def apply_order_updates(self, journal: Dict[int, Tuple[int, int]]) -> int:
        items = sorted(journal.items())
        changed = [(i, new) for i, (prev, new) in items if prev != new]
        if changed:
            self.orders_tree.update(changed)
        return self.orders_tree.root


# --- serialization ---------------------------------------------------------


def _serialize_funding_indices(info: FundingIndicesInfo) -> List[int]:
    words = [len(info.funding_indices)]
    for fi in info.funding_indices:
        words += [fi.asset_id, fi.funding_index - FUNDING_INDEX_LOWER_BOUND]
    words.append(info.funding_timestamp)
    return words


def serialize_shared_state(state: SharedState) -> List[int]:
    """state.cairo:188-210 (size-prefixed)."""
    words = [
        state.positions_root,
        state.positions_tree_height,
        state.orders_root,
        state.orders_tree_height,
    ]
    words += _serialize_funding_indices(state.global_funding_indices)
    words.append(len(state.oracle_prices))
    for p in state.oracle_prices:
        words += [p.asset_id, p.price]
    words.append(state.system_time)
    return [len(words)] + words


def serialize_program_output(
    config,
    prev_shared: SharedState,
    new_shared: SharedState,
    minimum_expiration_timestamp: int,
    outputs: PerpetualOutputs,
) -> List[int]:
    """program_output.cairo:107-156."""
    words: List[int] = [general_config_hash_felt(config), config.data_availability_mode]
    assets = asset_config_hash_entries(config)
    words.append(len(assets))
    for asset_id, config_hash in assets:
        words += [asset_id, config_hash]
    words += serialize_shared_state(prev_shared)
    words += serialize_shared_state(new_shared)
    words.append(minimum_expiration_timestamp)

    words.append(len(outputs.modifications))
    for m in outputs.modifications:
        words += [m.owner_key, m.position_id, m.biased_delta]

    fa_words: List[int] = [len(outputs.forced_actions)]
    for fa in outputs.forced_actions:
        fa_words += [fa.forced_type, *fa.fields]
    words.append(len(fa_words) - 1)  # data size excluding the count word
    words += fa_words

    words.append(len(outputs.conditions))
    words += outputs.conditions
    return words


def serialize_position_change(
    position_id: int, prev: Position, new: Position
) -> List[int]:
    """position/serialize_change.cairo:17-131 (size-prefixed diff record)."""
    words = [
        position_id,
        new.public_key,
        new.collateral_balance - BALANCE_LOWER_BOUND,
        new.funding_timestamp,
    ]
    balance_span = BALANCE_UPPER_BOUND - BALANCE_LOWER_BOUND

    pa = list(prev.assets)
    na = list(new.assets)
    pi = ni = 0
    while pi < len(pa) or ni < len(na):
        p_id = pa[pi].asset_id if pi < len(pa) else ASSET_ID_UPPER_BOUND
        n_id = na[ni].asset_id if ni < len(na) else ASSET_ID_UPPER_BOUND
        if p_id == n_id:
            if na[ni].balance != pa[pi].balance:
                words.append(n_id * balance_span + (na[ni].balance - BALANCE_LOWER_BOUND))
            pi += 1
            ni += 1
        elif p_id <= n_id:
            words.append(p_id * balance_span + (0 - BALANCE_LOWER_BOUND))
            pi += 1
        else:
            words.append(n_id * balance_span + (na[ni].balance - BALANCE_LOWER_BOUND))
            ni += 1
    return [len(words)] + words


def serialize_availability_data(
    position_journal: Dict[int, Tuple[Position, Position]],
    outputs: PerpetualOutputs,
) -> List[int]:
    """output/data_availability.cairo:44-81 (rollup mode)."""
    words: List[int] = [len(outputs.funding_indices_table)]
    for info in outputs.funding_indices_table:
        words += _serialize_funding_indices(info)
    for position_id, (prev, new) in sorted(position_journal.items()):
        words += serialize_position_change(position_id, prev, new)
    return words


# GPS fact topology (main.cairo:146-187): shared with the DEX program.
from stark_perpetual_tpu.models.gps_output import (  # noqa: E402
    FactTopology,
    build_fact_topology,
    fact_tree_root,
)


@dataclass
class ProgramRunResult:
    new_shared_state: SharedState
    outputs: PerpetualOutputs
    program_output: List[int]
    availability_data: Optional[List[int]]
    pages: Optional[List[List[int]]]
    final_positions: Dict[int, Position] = None
    final_orders: Dict[int, int] = None
    fact_topology: Optional[FactTopology] = None
    # Per-access logs for the arithmetization AIRs (execution order).
    order_access_log: list = None
    order_journal: Dict[int, Tuple[int, int]] = None
    position_access_log: list = None
    order_exec_log: list = None
    # Successful TV/TR status evaluations (status_air.StatusRecord), the
    # PositionStatusAir witness.
    status_log: list = None
    # Successful transition checks (transition_rule_air.TransitionCheck),
    # the TransitionRuleAir witness + public checks table source.
    transition_check_log: list = None
    # (initial, updated) StatusRecord pairs of the ratio-path checks,
    # the HoldingsMergeAir witness.
    merge_pair_log: list = None
    # Liquidate/deleverage solvency gates (threshold_rule_air.
    # ThresholdCheck), the ThresholdRuleAir witness.
    threshold_log: list = None


def run_program(
    program_input: ProgramInput,
    max_n_words_per_memory_page: int = 3072,
    crypto=None,
) -> ProgramRunResult:
    """The main() flow (main.cairo:41-195): execute, commit, serialize.

    crypto: an optional pre-prepared CryptoPrepass, so callers that already
    batch-verified the signatures (e.g. the staged arithmetization in
    prove.py) don't pay for a second device pass.
    """
    from stark_perpetual_tpu.models.perpetual.position import record_status_checks

    config = program_input.general_config
    with record_status_checks() as status_rec:
        state, outputs, _batch_config = execute_batch(program_input, crypto)

    trees = PerpetualStateTrees(config.positions_tree_height, config.orders_tree_height)
    prev_positions_root = trees.load_positions(program_input.positions or {})
    prev_orders_root = trees.load_orders(program_input.orders or {})
    prev = program_input.prev_shared_state
    proof_assert(prev.positions_root == prev_positions_root, None, "prev positions root")
    proof_assert(prev.orders_root == prev_orders_root, None, "prev orders root")

    new_positions_root = trees.apply_position_updates(state.position_journal)
    new_orders_root = trees.apply_order_updates(state.order_journal)

    new_shared = SharedState(
        positions_root=new_positions_root,
        positions_tree_height=config.positions_tree_height,
        orders_root=new_orders_root,
        orders_tree_height=config.orders_tree_height,
        global_funding_indices=state.global_funding_indices,
        oracle_prices=state.oracle_prices,
        system_time=state.system_time,
    )

    proof_assert(
        config.data_availability_mode in (VALIDIUM_MODE, ROLLUP_MODE),
        None,
        "bad DA mode",
    )
    program_output = serialize_program_output(
        config, prev, new_shared, program_input.minimum_expiration_timestamp, outputs
    )

    availability = None
    pages = None
    if config.data_availability_mode == ROLLUP_MODE:
        availability = serialize_availability_data(state.position_journal, outputs)
        proof_assert(len(availability) > 0, None, "Empty onchain data is not supported.")
        pages = [
            availability[i : i + max_n_words_per_memory_page]
            for i in range(0, len(availability), max_n_words_per_memory_page)
        ]

    return ProgramRunResult(
        new_shared_state=new_shared,
        outputs=outputs,
        program_output=program_output,
        availability_data=availability,
        pages=pages,
        final_positions=dict(state.positions),
        final_orders=dict(state.orders),
        fact_topology=build_fact_topology(program_output, pages),
        order_access_log=list(state.order_access_log),
        order_journal=dict(state.order_journal),
        position_access_log=list(state.position_access_log),
        order_exec_log=list(state.order_exec_log),
        status_log=list(status_rec.records),
        transition_check_log=list(status_rec.checks),
        merge_pair_log=list(status_rec.merge_pairs),
        threshold_log=list(status_rec.thresholds),
    )
