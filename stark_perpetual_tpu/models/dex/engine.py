"""Spot DEX (StarkEx exchange) batch execution engine.

Parity: /root/reference/src/starkware/cairo/dex/*.cairo (cited per function).
Same TPU-first split as the perpetual engine: sequential vault/order state
machine on the host, signature verification batched on the device, Merkle
commitments through the batched Pedersen trees.
"""

from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple, Union

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
from stark_perpetual_tpu.ops.merkle import SparseMerkleTree
from stark_perpetual_tpu.ops.patricia import PatriciaTree
from stark_perpetual_tpu.public import exchange_messages as EM

# dex_constants.cairo
ZERO_VAULT_HASH = 3051532127692517571387022095821932649971160144101372951378323654799587621206
BALANCE_BOUND = 2**63
NONCE_BOUND = 2**31
EXPIRATION_TIMESTAMP_BOUND = 2**22
ORDER_ID_BOUND = 2**251
L1_VAULT_INDEX_BOUND = 2**31
MINTABLE_ASSET_ID_BOUND = 2**240
MINTING_BIT = 2**250
ETH_ADDRESS_SHIFT = 2**160
ROLLUP_VAULT_BIT = 2**63
MINT_TREE_INDEX_SALT = 0x6D696E74  # "mint"

BALANCE_SHIFT = 2**64
VAULT_SHIFT = 2**64
FULL_WITHDRAWAL_SHIFT = BALANCE_SHIFT * VAULT_SHIFT

ONCHAIN_DATA_KEY_INDEX_BOUND = 2**15
ONCHAIN_DATA_TOKEN_INDEX_BOUND = 2**15


class DexBatchError(Exception):
    """The batch is unprovable (a Cairo assert would fail)."""


def dex_assert(cond: bool, message: str = "") -> None:
    if not cond:
        raise DexBatchError(message)


# --- objects ---------------------------------------------------------------


@dataclass(frozen=True)
class L2VaultState:
    stark_key: int = 0
    token_id: int = 0
    balance: int = 0

    def canonical(self) -> "L2VaultState":
        # Empty vault (balance 0) ignores key/token (vault_update.cairo:15-33).
        if self.balance == 0:
            return L2VaultState(0, 0, 0)
        return self


EMPTY_VAULT = L2VaultState()


@dataclass(frozen=True)
class OrderBase:
    nonce: int
    public_key: int
    expiration_timestamp: int
    signature_r: int = 0
    signature_s: int = 0


@dataclass(frozen=True)
class FeeInfoUser:
    token_id: int
    fee_limit: int
    source_vault_id: int


@dataclass(frozen=True)
class FeeInfoExchange:
    fee_taken: int
    destination_vault_id: int
    destination_stark_key: int


@dataclass(frozen=True)
class LimitOrder:
    """ExchangeLimitOrder; is_l1 selects the on-chain-signed flow."""

    base: OrderBase
    amount_buy: int
    amount_sell: int
    amount_fee: int
    asset_id_buy: int
    asset_id_sell: int
    asset_id_fee: int
    vault_buy: int
    vault_sell: int
    vault_fee: int
    is_l1: bool = False
    with_fee: bool = True  # False -> legacy 31-bit message format, no fee


@dataclass(frozen=True)
class Settlement:
    party_a_order: LimitOrder
    party_b_order: LimitOrder
    party_a_sold: int
    party_b_sold: int
    party_a_fee_info: Optional[FeeInfoExchange] = None
    party_b_fee_info: Optional[FeeInfoExchange] = None


@dataclass(frozen=True)
class Transfer:
    base: OrderBase
    sender_vault_id: int
    receiver_public_key: int
    receiver_vault_id: int
    amount: int
    token: int
    condition: int = 0
    fee_info_user: Optional[FeeInfoUser] = None
    fee_info_exchange: Optional[FeeInfoExchange] = None


@dataclass(frozen=True)
class Modification:
    """Deposit / withdrawal / full withdrawal on a single vault."""

    stark_key: int
    token_id: int
    vault_id: int
    balance_before: int
    balance_after: int
    is_full_withdrawal: bool = False


@dataclass(frozen=True)
class FalseFullWithdrawal:
    requester_stark_key: int
    vault_id: int


@dataclass(frozen=True)
class Mint:
    stark_key: int
    token_id: int
    vault_id: int


Transaction = Union[Settlement, Transfer, Modification, FalseFullWithdrawal, Mint]


@dataclass(frozen=True)
class DexGeneralConfig:
    validium_tree_height: int
    rollup_tree_height: int
    orders_tree_height: int
    unique_minting_enforced: int


@dataclass
class DexOutputs:
    modifications: List[Tuple[int, int, int]] = field(default_factory=list)  # key, token, action
    conditional_transfers: List[int] = field(default_factory=list)
    l1_order_messages: List[Tuple[int, ...]] = field(default_factory=list)


# --- message hashes --------------------------------------------------------


def limit_order_message(order: LimitOrder, hash_function=fast_pedersen_hash) -> int:
    """execute_limit_order.cairo:30-53 (get_order_hash)."""
    if order.with_fee:
        # 64-bit with-fee format (signature_message_hashes.cairo:39-104).
        msg = hash_function(order.asset_id_sell, order.asset_id_buy)
        msg = hash_function(msg, order.asset_id_fee)
        w4 = order.amount_sell
        w4 = w4 * 2**64 + order.amount_buy
        w4 = w4 * 2**64 + order.amount_fee
        w4 = w4 * 2**32 + order.base.nonce
        msg = hash_function(msg, w4)
        w5 = 3
        w5 = w5 * 2**64 + order.vault_fee
        w5 = w5 * 2**64 + order.vault_sell
        w5 = w5 * 2**64 + order.vault_buy
        w5 = w5 * 2**32 + order.base.expiration_timestamp
        w5 = w5 * 2**17
        return hash_function(msg, w5)
    return EM.get_limit_order_msg(
        order.vault_sell, order.vault_buy, order.amount_sell, order.amount_buy,
        order.asset_id_sell, order.asset_id_buy, order.base.nonce,
        order.base.expiration_timestamp, hash_function=hash_function,
    )


def transfer_message(tx: Transfer, hash_function=fast_pedersen_hash) -> int:
    """execute_transfer.cairo:188-216 (31-bit) / exchange transfer_hash (64-bit)."""
    if tx.fee_info_user is not None:
        return EM.get_transfer_msg_with_fee(
            tx.amount, tx.base.nonce, tx.sender_vault_id, tx.token,
            tx.receiver_vault_id, tx.receiver_public_key,
            tx.base.expiration_timestamp, tx.fee_info_user.token_id,
            tx.fee_info_user.source_vault_id, tx.fee_info_user.fee_limit,
            condition=tx.condition if tx.condition != 0 else None,
            hash_function=hash_function,
        )
    return EM.get_transfer_msg(
        tx.amount, tx.base.nonce, tx.sender_vault_id, tx.token,
        tx.receiver_vault_id, tx.receiver_public_key, tx.base.expiration_timestamp,
        condition=tx.condition if tx.condition != 0 else None,
        hash_function=hash_function,
    )


# --- carried state ---------------------------------------------------------


class DexCarriedState:
    def __init__(
        self,
        vaults: Dict[int, L2VaultState],
        orders: Dict[int, int],
        l1_vault_min_balances: Dict[Tuple[int, int, int], int],
    ):
        self.vaults = dict(vaults)
        self.orders = dict(orders)
        self.vault_journal: Dict[int, Tuple[L2VaultState, L2VaultState]] = {}
        self.order_journal: Dict[int, Tuple[int, int]] = {}
        # L1 vaults: keyed by (eth_key, token_id, vault_index); balances start
        # at the precomputed minimal initial balance (main_hint_functions.py).
        self.l1_balances: Dict[Tuple[int, int, int], int] = dict(l1_vault_min_balances)
        self.l1_min_balances = dict(l1_vault_min_balances)
        self.l1_journal_order: List[Tuple[int, int, int]] = []
        # Execution-ordered access logs feeding the business-logic AIRs
        # (models/dex/vault_air.py, prove.py): every vault-cell mutation and
        # every order-fulfillment update, the DEX analog of the perpetual
        # engine's position/order logs (objects.py:309-321).
        # vault record: (space, cell_key, kind, stark_key, token_id, op1, op2)
        #   space 'l2': cell_key = vault_id; kind 'diff' (op1 = delta) or
        #   'set' (op1 = balance_before, op2 = balance_after).
        #   space 'l1': cell_key = (eth_key, token_id, vault_index); 'diff'.
        # order record: (order_id, update_amount, full_amount, signed)
        self.vault_access_log: List[tuple] = []
        self.order_access_log: List[tuple] = []
        # L2 with-fee limit-order execution records
        # (settlement_link_air.DexOrderExecRecord): the witness of the DEX
        # order-link AIR binding ratio/fee fairness, vault diffs and the
        # signed message fields.
        self.order_exec_log: List[object] = []

    def get_vault(self, vault_id: int) -> L2VaultState:
        return self.vaults.get(vault_id, EMPTY_VAULT)

    def _write_vault(self, vault_id: int, prev: L2VaultState, new: L2VaultState) -> None:
        new = new.canonical()
        if vault_id in self.vault_journal:
            first_prev, _ = self.vault_journal[vault_id]
            self.vault_journal[vault_id] = (first_prev, new)
        else:
            self.vault_journal[vault_id] = (prev.canonical(), new)
        self.vaults[vault_id] = new

    def l2_vault_update_diff(self, diff: int, stark_key: int, token_id: int, vault_id: int):
        """vault_update.cairo:70-98 (+ key/token consistency of a non-empty
        prev vault, enforced in the reference by the witness manager)."""
        prev = self.get_vault(vault_id)
        if prev.balance != 0:
            dex_assert(
                prev.stark_key == stark_key and prev.token_id == token_id,
                f"vault {vault_id} key/token mismatch",
            )
        balance_after = prev.balance + diff
        dex_assert(0 <= balance_after < BALANCE_BOUND, "vault balance out of range")
        self.vault_access_log.append(
            ("l2", vault_id, "diff", stark_key, token_id, diff, 0)
        )
        self._write_vault(
            vault_id, prev, L2VaultState(stark_key, token_id, balance_after)
        )

    def l2_vault_update_balances(
        self, balance_before, balance_after, stark_key, token_id, vault_id
    ):
        """vault_update.cairo:52-68."""
        prev = self.get_vault(vault_id)
        dex_assert(prev.balance == balance_before, "balance_before mismatch")
        if prev.balance != 0:
            dex_assert(prev.stark_key == stark_key and prev.token_id == token_id)
        self.vault_access_log.append(
            ("l2", vault_id, "set", stark_key, token_id, balance_before, balance_after)
        )
        self._write_vault(
            vault_id, prev, L2VaultState(stark_key, token_id, balance_after)
        )

    def l1_vault_update_diff(self, diff, eth_key, token_id, vault_index):
        """l1_vault_update.cairo:104-135."""
        key = (eth_key, token_id, vault_index)
        before = self.l1_balances.get(key, 0)
        dex_assert(0 <= before < BALANCE_BOUND)
        after = before + diff
        dex_assert(0 <= after < BALANCE_BOUND, "L1 vault balance out of range")
        self.vault_access_log.append(("l1", key, "diff", eth_key, token_id, diff, 0))
        self.l1_balances[key] = after
        if key not in self.l1_journal_order:
            self.l1_journal_order.append(key)

    def update_order(self, order_id: int, prev_expected: Optional[int], new_value: int):
        prev = self.orders.get(order_id, 0)
        if prev_expected is not None:
            dex_assert(prev == prev_expected, "order fulfillment mismatch")
        if order_id in self.order_journal:
            first_prev, _ = self.order_journal[order_id]
            self.order_journal[order_id] = (first_prev, new_value)
        else:
            self.order_journal[order_id] = (prev, new_value)
        self.orders[order_id] = new_value


# --- executors -------------------------------------------------------------


def execute_limit_order(
    state: DexCarriedState,
    order: LimitOrder,
    amount_sold: int,
    amount_bought: int,
    fee_info_exchange: Optional[FeeInfoExchange],
    config_expiration: int,
    outputs: DexOutputs,
    signature_valid: Optional[bool],
) -> None:
    """execute_limit_order.cairo:204-357."""
    dex_assert(0 <= order.amount_sell < BALANCE_BOUND)
    dex_assert(0 <= order.amount_buy < BALANCE_BOUND)
    order_id = limit_order_message(order)
    prev_fulfilled = state.orders.get(order_id, 0)
    new_fulfilled = prev_fulfilled + amount_sold
    dex_assert(new_fulfilled <= order.amount_sell, "order over-fulfillment")
    dex_assert(0 <= order.base.nonce < NONCE_BOUND)
    dex_assert(order.base.expiration_timestamp >= config_expiration, "order expired")
    dex_assert(order.base.expiration_timestamp < EXPIRATION_TIMESTAMP_BOUND)
    # Actual ratio at least as good as the requested one.
    dex_assert(
        order.amount_sell * amount_bought - amount_sold * order.amount_buy >= 0,
        "unfair settlement ratio",
    )

    if order.is_l1:
        # L1 order: output the order message; vault moves are on L1 vaults.
        outputs.l1_order_messages.append(_serialize_l1_limit_order(order))
        state.l1_vault_update_diff(
            -amount_sold, order.base.public_key, order.asset_id_sell, order.vault_sell
        )
        state.l1_vault_update_diff(
            amount_bought, order.base.public_key, order.asset_id_buy, order.vault_buy
        )
    else:
        state.l2_vault_update_diff(
            -amount_sold, order.base.public_key, order.asset_id_sell, order.vault_sell
        )
        state.l2_vault_update_diff(
            amount_bought, order.base.public_key, order.asset_id_buy, order.vault_buy
        )
        dex_assert(signature_valid, "bad order signature")

    # Fee handling (fee.cairo:34-41, 44-108).
    if fee_info_exchange is not None:
        dex_assert(order.with_fee, "fee taken on an order without fee info")
        fee_taken = fee_info_exchange.fee_taken
        dex_assert(0 <= fee_taken < BALANCE_BOUND)
        dex_assert(0 <= order.amount_fee < BALANCE_BOUND)
        dex_assert(
            fee_taken * order.amount_buy <= order.amount_fee * amount_bought,
            "fee ratio violated",
        )
        if order.is_l1:
            state.l1_vault_update_diff(
                -fee_taken, order.base.public_key, order.asset_id_fee, order.vault_fee
            )
        else:
            state.l2_vault_update_diff(
                -fee_taken, order.base.public_key, order.asset_id_fee, order.vault_fee
            )
        state.l2_vault_update_diff(
            fee_taken,
            fee_info_exchange.destination_stark_key,
            order.asset_id_fee,
            fee_info_exchange.destination_vault_id,
        )

    dex_assert(order_id < ORDER_ID_BOUND)
    # L2 orders ride a verified signature over order_id; L1 orders are
    # authorized by the on-chain order message instead.
    state.order_access_log.append(
        (order_id, amount_sold, order.amount_sell, not order.is_l1)
    )
    state.update_order(order_id, prev_fulfilled, new_fulfilled)

    if not order.is_l1:
        # Both L2 formats feed the settlement-link AIR: with-fee orders
        # walk the 4-hash chain, legacy (31-bit) orders the 2-hash chain
        # with the legacy packed word reconstructed in-trace.
        from stark_perpetual_tpu.models.dex.settlement_link_air import (
            DexOrderExecRecord,
        )

        fee = fee_info_exchange
        state.order_exec_log.append(
            DexOrderExecRecord(
                order_id=order_id,
                amount_sell=order.amount_sell,
                amount_buy=order.amount_buy,
                amount_fee=order.amount_fee,
                amount_sold=amount_sold,
                amount_bought=amount_bought,
                fee_taken=fee.fee_taken if fee else 0,
                has_fee=1 if fee else 0,
                vault_sell=order.vault_sell,
                vault_buy=order.vault_buy,
                vault_fee=order.vault_fee,
                vault_dst=fee.destination_vault_id if fee else 0,
                dst_key=fee.destination_stark_key if fee else 0,
                public_key=order.base.public_key,
                token_sell=order.asset_id_sell,
                token_buy=order.asset_id_buy,
                token_fee=order.asset_id_fee,
                nonce=order.base.nonce,
                expiration_timestamp=order.base.expiration_timestamp,
                is_legacy=0 if order.with_fee else 1,
            )
        )


def _serialize_l1_limit_order(order: LimitOrder) -> Tuple[int, ...]:
    """message_l1_order.cairo:12-72: (eth_key, n_elms, 3 tokens, 2 packed)."""
    p0 = order.amount_sell
    p0 = p0 * 2**64 + order.amount_buy
    p0 = p0 * 2**64 + order.amount_fee
    p0 = p0 * 2**32 + order.base.nonce
    p1 = 3
    p1 = p1 * 2**64 + order.vault_fee
    p1 = p1 * 2**64 + order.vault_sell
    p1 = p1 * 2**64 + order.vault_buy
    p1 = p1 * 2**32 + order.base.expiration_timestamp
    p1 = p1 * 2**17
    return (
        order.base.public_key, 5, order.asset_id_sell, order.asset_id_buy,
        order.asset_id_fee, p0, p1,
    )


def execute_settlement(state, tx: Settlement, config_expiration, outputs, sig_flags) -> None:
    """execute_settlement.cairo:16-156."""
    dex_assert(0 <= tx.party_a_sold < BALANCE_BOUND)
    dex_assert(0 <= tx.party_b_sold < BALANCE_BOUND)
    a, b = tx.party_a_order, tx.party_b_order
    dex_assert(a.asset_id_buy == b.asset_id_sell)
    dex_assert(b.asset_id_buy == a.asset_id_sell)
    execute_limit_order(
        state, a, tx.party_a_sold, tx.party_b_sold, tx.party_a_fee_info,
        config_expiration, outputs, sig_flags.get(id(a)),
    )
    execute_limit_order(
        state, b, tx.party_b_sold, tx.party_a_sold, tx.party_b_fee_info,
        config_expiration, outputs, sig_flags.get(id(b)),
    )


def execute_transfer(state, tx: Transfer, config_expiration, outputs, sig_flags) -> None:
    """execute_transfer.cairo:30-261."""
    dex_assert(0 <= tx.amount < BALANCE_BOUND)
    dex_assert(0 <= tx.base.nonce < NONCE_BOUND)
    dex_assert(tx.base.expiration_timestamp >= config_expiration, "transfer expired")
    dex_assert(tx.base.expiration_timestamp < EXPIRATION_TIMESTAMP_BOUND)

    state.l2_vault_update_diff(
        -tx.amount, tx.base.public_key, tx.token, tx.sender_vault_id
    )
    state.l2_vault_update_diff(
        tx.amount, tx.receiver_public_key, tx.token, tx.receiver_vault_id
    )
    if tx.fee_info_user is not None:
        fee = tx.fee_info_exchange
        dex_assert(fee is not None, "missing exchange fee info")
        dex_assert(0 <= fee.fee_taken <= tx.fee_info_user.fee_limit < BALANCE_BOUND)
        state.l2_vault_update_diff(
            -fee.fee_taken, tx.base.public_key, tx.fee_info_user.token_id,
            tx.fee_info_user.source_vault_id,
        )
        state.l2_vault_update_diff(
            fee.fee_taken, fee.destination_stark_key, tx.fee_info_user.token_id,
            fee.destination_vault_id,
        )

    dex_assert(sig_flags.get(id(tx)), "bad transfer signature")
    order_id = transfer_message(tx)
    dex_assert(order_id < ORDER_ID_BOUND)
    # Transfers must be fresh (prev fulfilled == 0) and fill completely.
    # In the AIR the freshness is implied: update == full forces prev == 0.
    state.order_access_log.append((order_id, tx.amount, tx.amount, True))
    state.update_order(order_id, 0, tx.amount)
    if tx.condition != 0:
        outputs.conditional_transfers.append(tx.condition)


def execute_modification(state, tx: Modification, outputs) -> None:
    """execute_modification.cairo:30-119."""
    dex_assert(0 <= tx.balance_before < BALANCE_BOUND)
    dex_assert(0 <= tx.balance_after < BALANCE_BOUND)
    dex_assert(0 <= tx.vault_id < VAULT_SHIFT)
    if tx.is_full_withdrawal:
        dex_assert(tx.balance_after == 0, "full withdrawal must empty the vault")
    biased_diff = tx.balance_after - tx.balance_before + BALANCE_BOUND
    action = (
        (int(tx.is_full_withdrawal) * VAULT_SHIFT) + tx.vault_id
    ) * BALANCE_SHIFT + biased_diff
    state.l2_vault_update_balances(
        tx.balance_before, tx.balance_after, tx.stark_key, tx.token_id, tx.vault_id
    )
    outputs.modifications.append((tx.stark_key, tx.token_id, action))


def execute_false_full_withdrawal(state, tx: FalseFullWithdrawal, outputs) -> None:
    """execute_false_full_withdrawal.cairo:12-67."""
    vault = state.get_vault(tx.vault_id)
    action = tx.vault_id * BALANCE_SHIFT + BALANCE_BOUND + FULL_WITHDRAWAL_SHIFT
    state.l2_vault_update_balances(
        vault.balance, vault.balance, vault.stark_key, vault.token_id, tx.vault_id
    )
    dex_assert(
        tx.requester_stark_key != vault.stark_key,
        "false full withdrawal with matching key",
    )
    outputs.modifications.append((tx.requester_stark_key, 0, action))


def execute_mint(state, tx: Mint, config: DexGeneralConfig) -> None:
    """execute_offchain_minting.cairo:26-119 (mint amount is always 1)."""
    dex_assert(
        0 <= tx.token_id - MINTING_BIT < MINTABLE_ASSET_ID_BOUND,
        "not a mintable asset id",
    )
    if config.unique_minting_enforced == 1:
        index = fast_pedersen_hash(MINT_TREE_INDEX_SALT, tx.token_id)
        # update == full == 1 forces prev == 0 in the AIR: one mint per asset.
        state.order_access_log.append((index, 1, 1, False))
        state.update_order(index, 0, 1)  # prev must be 0: one mint per asset
    state.l2_vault_update_diff(1, tx.stark_key, tx.token_id, tx.vault_id)


# --- batch + commitment ----------------------------------------------------


def compute_l1_min_balances(txs: Sequence[Transaction]) -> Dict[Tuple[int, int, int], int]:
    """main_hint_functions.py:63-131: minimal initial balances preventing a
    temporary negative balance for every L1 vault."""
    running: Dict[Tuple[int, int, int], Tuple[int, int]] = {}

    def upd(key, diff):
        mn, cur = running.get(key, (0, 0))
        cur += diff
        running[key] = (min(mn, cur), cur)

    for tx in txs:
        if not isinstance(tx, Settlement):
            continue
        for order, sold, bought, fee in (
            (tx.party_a_order, tx.party_a_sold, tx.party_b_sold, tx.party_a_fee_info),
            (tx.party_b_order, tx.party_b_sold, tx.party_a_sold, tx.party_b_fee_info),
        ):
            if not order.is_l1:
                continue
            key = order.base.public_key
            upd((key, order.asset_id_sell, order.vault_sell), -sold)
            upd((key, order.asset_id_buy, order.vault_buy), bought)
            if fee is not None:
                upd((key, order.asset_id_fee, order.vault_fee), -fee.fee_taken)
    return {k: -mn for k, (mn, _cur) in running.items()}


def vault_leaf_hash(vault: L2VaultState, hash_function=fast_pedersen_hash) -> int:
    """vault_update.cairo:36-49: h(h(key, token), amount); empty = constant."""
    if vault.balance == 0:
        return ZERO_VAULT_HASH
    return hash_function(
        hash_function(vault.stark_key, vault.token_id), vault.balance
    )


class DexStateTrees:
    """Validium + rollup vault trees and the orders tree.

    Vault trees are dense-style sparse Merkle trees with the ZERO_VAULT_HASH
    default; the orders tree is a Patricia tree (cairo-lang `patricia_update`
    node encoding, empty root 0).
    """

    def __init__(self, config: DexGeneralConfig):
        self.validium = SparseMerkleTree(config.validium_tree_height, ZERO_VAULT_HASH)
        self.rollup = SparseMerkleTree(config.rollup_tree_height, ZERO_VAULT_HASH)
        self.orders = PatriciaTree(config.orders_tree_height)

    def load_vaults(self, vaults: Dict[int, L2VaultState]):
        val_updates, roll_updates = [], []
        for vid, vault in sorted(vaults.items()):
            if vid & ROLLUP_VAULT_BIT:
                roll_updates.append((vid - ROLLUP_VAULT_BIT, vault_leaf_hash(vault)))
            else:
                val_updates.append((vid, vault_leaf_hash(vault)))
        self.validium.update(val_updates)
        self.rollup.update(roll_updates)
        return self.validium.root, self.rollup.root

    def apply_vault_journal(self, journal):
        val_updates, roll_updates = [], []
        for vid, (prev, new) in sorted(journal.items()):
            if prev == new:
                continue
            if vid & ROLLUP_VAULT_BIT:
                roll_updates.append((vid - ROLLUP_VAULT_BIT, vault_leaf_hash(new)))
            else:
                val_updates.append((vid, vault_leaf_hash(new)))
        self.validium.update(val_updates)
        self.rollup.update(roll_updates)
        return self.validium.root, self.rollup.root

    def load_orders(self, orders: Dict[int, int]):
        self.orders.update(sorted(orders.items()))
        return self.orders.root

    def apply_order_journal(self, journal):
        self.orders.update(
            [(k, new) for k, (prev, new) in sorted(journal.items()) if prev != new]
        )
        return self.orders.root


@dataclass
class DexProgramInput:
    general_config: DexGeneralConfig
    global_expiration_timestamp: int
    txs: Tuple[Transaction, ...]
    vaults: Dict[int, L2VaultState]
    orders: Dict[int, int]


@dataclass
class DexRunResult:
    dex_output: List[int]
    outputs: DexOutputs
    l1_vault_outputs: List[Tuple[int, int, int]]
    volition_data: List[int]
    final_vaults: Dict[int, L2VaultState]
    final_orders: Dict[int, int]
    roots: Dict[str, int]
    # GPS page structure: volition (onchain) data split into pages hanging
    # off the main-output leaf (dex main splits its output the same way as
    # perpetual main.cairo:146-187).
    pages: Optional[List[List[int]]] = None
    fact_topology: Optional["FactTopology"] = None  # noqa: F821
    # Execution-ordered AIR feeds (see DexCarriedState) + squashed journals.
    vault_access_log: Optional[List[tuple]] = None
    order_access_log: Optional[List[tuple]] = None
    order_journal: Optional[Dict[int, Tuple[int, int]]] = None
    order_exec_log: Optional[List[object]] = None
    l1_min_balances: Optional[Dict[Tuple[int, int, int], int]] = None
    l1_final_balances: Optional[Dict[Tuple[int, int, int], int]] = None


def collect_signature_obligations(txs, hash_function=fast_pedersen_hash):
    """(key, msg, r, s, pub) for every L2 signature the batch must verify."""
    items = []
    keys = []
    for tx in txs:
        if isinstance(tx, Settlement):
            for order in (tx.party_a_order, tx.party_b_order):
                if not order.is_l1:
                    keys.append(id(order))
                    items.append(
                        (
                            limit_order_message(order, hash_function),
                            order.base.signature_r,
                            order.base.signature_s,
                            order.base.public_key,
                        )
                    )
        elif isinstance(tx, Transfer):
            keys.append(id(tx))
            items.append(
                (
                    transfer_message(tx, hash_function),
                    tx.base.signature_r,
                    tx.base.signature_s,
                    tx.base.public_key,
                )
            )
    return keys, items


def _prevalidate_signatures(txs) -> Dict[int, bool]:
    from stark_perpetual_tpu.ops.ecdsa import verify_ints

    keys, items = collect_signature_obligations(txs)
    if not items:
        return {}
    results = verify_ints(items)
    return dict(zip(keys, results))


def run_dex_program(program_input: DexProgramInput) -> DexRunResult:
    """main.cairo:39-369: execute, squash, commit, serialize."""
    config = program_input.general_config
    txs = program_input.txs
    sig_flags = _prevalidate_signatures(txs)

    state = DexCarriedState(
        vaults=program_input.vaults,
        orders=program_input.orders,
        l1_vault_min_balances=compute_l1_min_balances(txs),
    )
    outputs = DexOutputs()
    expiration = program_input.global_expiration_timestamp

    for tx in txs:
        if isinstance(tx, Settlement):
            execute_settlement(state, tx, expiration, outputs, sig_flags)
        elif isinstance(tx, Transfer):
            execute_transfer(state, tx, expiration, outputs, sig_flags)
        elif isinstance(tx, Mint):
            execute_mint(state, tx, config)
        elif isinstance(tx, FalseFullWithdrawal):
            execute_false_full_withdrawal(state, tx, outputs)
        elif isinstance(tx, Modification):
            execute_modification(state, tx, outputs)
        else:
            raise DexBatchError(f"Could not handle transaction: {tx}")

    trees = DexStateTrees(config)
    init_val_root, init_roll_root = trees.load_vaults(program_input.vaults)
    init_order_root = trees.load_orders(program_input.orders)
    final_val_root, final_roll_root = trees.apply_vault_journal(state.vault_journal)
    final_order_root = trees.apply_order_journal(state.order_journal)

    # L1 vault outputs (l1_vault_update.cairo:40-100).
    l1_outputs = []
    for key in state.l1_journal_order:
        eth_key, token_id, vault_index = key
        minimal = state.l1_min_balances.get(key, 0)
        final = state.l1_balances[key]
        dex_assert(0 <= minimal < BALANCE_BOUND and 0 <= final < BALANCE_BOUND)
        dex_assert(0 <= vault_index < L1_VAULT_INDEX_BOUND)
        action = (
            vault_index * BALANCE_SHIFT + minimal
        ) * BALANCE_SHIFT + (final - minimal + BALANCE_BOUND)
        l1_outputs.append((eth_key, token_id, action))

    volition = _volition_data(state.vault_journal)

    dex_output = [
        config.unique_minting_enforced,  # encoded general config
        init_val_root,
        final_val_root,
        init_roll_root,
        final_roll_root,
        init_order_root,
        final_order_root,
        expiration,
        config.validium_tree_height,
        config.rollup_tree_height,
        config.orders_tree_height,
        len(outputs.modifications),
        len(outputs.conditional_transfers),
        len(l1_outputs),
        len(outputs.l1_order_messages),
    ]

    from stark_perpetual_tpu.models.gps_output import build_fact_topology, split_pages

    da_pages = split_pages(volition, 3072) if volition else None
    return DexRunResult(
        dex_output=dex_output,
        outputs=outputs,
        l1_vault_outputs=l1_outputs,
        volition_data=volition,
        pages=da_pages,
        fact_topology=build_fact_topology(dex_output, da_pages),
        final_vaults=state.vaults,
        final_orders=state.orders,
        vault_access_log=list(state.vault_access_log),
        order_access_log=list(state.order_access_log),
        order_journal=dict(state.order_journal),
        order_exec_log=list(state.order_exec_log),
        l1_min_balances=dict(state.l1_min_balances),
        l1_final_balances=dict(state.l1_balances),
        roots=dict(
            initial_validium=init_val_root,
            final_validium=final_val_root,
            initial_rollup=init_roll_root,
            final_rollup=final_roll_root,
            initial_order=init_order_root,
            final_order=final_order_root,
        ),
    )


def _volition_data(vault_journal) -> List[int]:
    """volition.cairo:171-237: rollup vault changes as packed 124-bit records
    with deduplicating key/token tables, two records per output word."""
    changed = [
        (vid - ROLLUP_VAULT_BIT, new)
        for vid, (prev, new) in sorted(vault_journal.items())
        if vid & ROLLUP_VAULT_BIT and prev != new
    ]
    keys = sorted({v.stark_key for _i, v in changed})
    tokens = sorted({v.token_id for _i, v in changed})
    dex_assert(len(keys) < ONCHAIN_DATA_KEY_INDEX_BOUND)
    dex_assert(len(tokens) < ONCHAIN_DATA_TOKEN_INDEX_BOUND)
    key_idx = {k: i for i, k in enumerate(keys)}
    token_idx = {t: i for i, t in enumerate(tokens)}

    words = [len(keys)] + keys + [len(tokens)] + tokens
    encoded = []
    for vault_index, v in changed:
        e = vault_index
        e = e * BALANCE_BOUND + v.balance
        e = e * ONCHAIN_DATA_KEY_INDEX_BOUND + key_idx[v.stark_key]
        e = e * ONCHAIN_DATA_TOKEN_INDEX_BOUND + token_idx[v.token_id]
        encoded.append(e)
    shift = (
        2**31 * BALANCE_BOUND * ONCHAIN_DATA_KEY_INDEX_BOUND * ONCHAIN_DATA_TOKEN_INDEX_BOUND
    )
    for i in range(0, len(encoded) - 1, 2):
        words.append(encoded[i] * shift + encoded[i + 1])
    if len(encoded) % 2 == 1:
        words.append(encoded[-1] * shift + encoded[-1])
    return words
