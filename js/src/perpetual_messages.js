/**
 * Perpetual message hashing for wallets: the five signed message families,
 * mirroring stark_perpetual_tpu/public/perpetual_messages.py (capability
 * parity with the reference's js/perpetual_messages.js:49-339).
 */
"use strict";

const { pedersen, big } = require("./signature");

const LIMIT_ORDER_WITH_FEES = 3n;
const TRANSFER = 4n;
const CONDITIONAL_TRANSFER = 5n;
const WITHDRAWAL = 6n;
const WITHDRAWAL_TO_ADDRESS = 7n;

function checkRange(value, bits, name) {
  if (!(value >= 0n && value < 1n << BigInt(bits))) {
    throw new Error(`${name} out of range [0, 2^${bits})`);
  }
}

function packTransferWords(o, orderType) {
  let w0 = o.senderPositionId;
  w0 = w0 * 2n ** 64n + o.receiverPositionId;
  w0 = w0 * 2n ** 64n + o.srcFeePositionId;
  w0 = w0 * 2n ** 32n + o.nonce;
  let w1 = orderType;
  w1 = w1 * 2n ** 64n + o.amount;
  w1 = w1 * 2n ** 64n + o.maxAmountFee;
  w1 = w1 * 2n ** 32n + o.expirationTimestamp;
  w1 = w1 * 2n ** 81n; // padding
  return [w0, w1];
}

function normalizeTransfer(o) {
  const t = {
    assetId: big(o.assetId),
    assetIdFee: big(o.assetIdFee),
    receiverPublicKey: big(o.receiverPublicKey),
    senderPositionId: big(o.senderPositionId),
    receiverPositionId: big(o.receiverPositionId),
    srcFeePositionId: big(o.srcFeePositionId),
    nonce: big(o.nonce),
    amount: big(o.amount),
    maxAmountFee: big(o.maxAmountFee),
    expirationTimestamp: big(o.expirationTimestamp),
  };
  checkRange(t.amount, 64, "amount");
  checkRange(t.assetId, 250, "assetId");
  checkRange(t.assetIdFee, 250, "assetIdFee");
  checkRange(t.expirationTimestamp, 32, "expirationTimestamp");
  checkRange(t.maxAmountFee, 64, "maxAmountFee");
  checkRange(t.nonce, 32, "nonce");
  checkRange(t.receiverPositionId, 64, "receiverPositionId");
  checkRange(t.receiverPublicKey, 251, "receiverPublicKey");
  checkRange(t.senderPositionId, 64, "senderPositionId");
  checkRange(t.srcFeePositionId, 64, "srcFeePositionId");
  return t;
}

function getTransferMsg(o) {
  const t = normalizeTransfer(o);
  let msg = pedersen(t.assetId, t.assetIdFee);
  msg = pedersen(msg, t.receiverPublicKey);
  const [w0, w1] = packTransferWords(t, TRANSFER);
  return pedersen(pedersen(msg, w0), w1);
}

function getConditionalTransferMsg(o) {
  const t = normalizeTransfer(o);
  const condition = big(o.condition);
  checkRange(condition, 251, "condition");
  let msg = pedersen(t.assetId, t.assetIdFee);
  msg = pedersen(msg, t.receiverPublicKey);
  msg = pedersen(msg, condition);
  const [w0, w1] = packTransferWords(t, CONDITIONAL_TRANSFER);
  return pedersen(pedersen(msg, w0), w1);
}

function getLimitOrderMsg(o) {
  const v = {
    assetIdSynthetic: big(o.assetIdSynthetic),
    assetIdCollateral: big(o.assetIdCollateral),
    assetIdFee: big(o.assetIdFee),
    amountSynthetic: big(o.amountSynthetic),
    amountCollateral: big(o.amountCollateral),
    maxAmountFee: big(o.maxAmountFee),
    nonce: big(o.nonce),
    positionId: big(o.positionId),
    expirationTimestamp: big(o.expirationTimestamp),
  };
  checkRange(v.assetIdSynthetic, 128, "assetIdSynthetic");
  checkRange(v.assetIdCollateral, 250, "assetIdCollateral");
  checkRange(v.assetIdFee, 250, "assetIdFee");
  checkRange(v.amountSynthetic, 64, "amountSynthetic");
  checkRange(v.amountCollateral, 64, "amountCollateral");
  checkRange(v.maxAmountFee, 64, "maxAmountFee");
  checkRange(v.nonce, 32, "nonce");
  checkRange(v.positionId, 64, "positionId");
  checkRange(v.expirationTimestamp, 32, "expirationTimestamp");

  let assetIdSell, assetIdBuy, amountSell, amountBuy;
  if (o.isBuyingSynthetic) {
    assetIdSell = v.assetIdCollateral; assetIdBuy = v.assetIdSynthetic;
    amountSell = v.amountCollateral; amountBuy = v.amountSynthetic;
  } else {
    assetIdSell = v.assetIdSynthetic; assetIdBuy = v.assetIdCollateral;
    amountSell = v.amountSynthetic; amountBuy = v.amountCollateral;
  }
  let msg = pedersen(assetIdSell, assetIdBuy);
  msg = pedersen(msg, v.assetIdFee);
  let w0 = amountSell;
  w0 = w0 * 2n ** 64n + amountBuy;
  w0 = w0 * 2n ** 64n + v.maxAmountFee;
  w0 = w0 * 2n ** 32n + v.nonce;
  msg = pedersen(msg, w0);
  let w1 = LIMIT_ORDER_WITH_FEES;
  w1 = w1 * 2n ** 64n + v.positionId;
  w1 = w1 * 2n ** 64n + v.positionId;
  w1 = w1 * 2n ** 64n + v.positionId;
  w1 = w1 * 2n ** 32n + v.expirationTimestamp;
  w1 = w1 * 2n ** 17n; // padding
  return pedersen(msg, w1);
}

function getWithdrawalMsg(o) {
  const assetIdCollateral = big(o.assetIdCollateral);
  const positionId = big(o.positionId);
  const nonce = big(o.nonce);
  const expirationTimestamp = big(o.expirationTimestamp);
  const amount = big(o.amount);
  checkRange(assetIdCollateral, 250, "assetIdCollateral");
  checkRange(nonce, 32, "nonce");
  checkRange(positionId, 64, "positionId");
  checkRange(expirationTimestamp, 32, "expirationTimestamp");
  checkRange(amount, 64, "amount");
  let packed = WITHDRAWAL;
  packed = packed * 2n ** 64n + positionId;
  packed = packed * 2n ** 32n + nonce;
  packed = packed * 2n ** 64n + amount;
  packed = packed * 2n ** 32n + expirationTimestamp;
  packed = packed * 2n ** 49n; // padding
  return pedersen(assetIdCollateral, packed);
}

function getWithdrawalToAddressMsg(o) {
  const ethAddress = BigInt(o.ethAddress);
  checkRange(ethAddress, 160, "ethAddress");
  const assetIdCollateral = big(o.assetIdCollateral);
  const positionId = big(o.positionId);
  const nonce = big(o.nonce);
  const expirationTimestamp = big(o.expirationTimestamp);
  const amount = big(o.amount);
  checkRange(assetIdCollateral, 250, "assetIdCollateral");
  checkRange(nonce, 32, "nonce");
  checkRange(positionId, 64, "positionId");
  checkRange(expirationTimestamp, 32, "expirationTimestamp");
  checkRange(amount, 64, "amount");
  let packed = WITHDRAWAL_TO_ADDRESS;
  packed = packed * 2n ** 64n + positionId;
  packed = packed * 2n ** 32n + nonce;
  packed = packed * 2n ** 64n + amount;
  packed = packed * 2n ** 32n + expirationTimestamp;
  packed = packed * 2n ** 49n; // padding
  return pedersen(pedersen(assetIdCollateral, ethAddress), packed);
}

function getPriceMsg(o) {
  const oracleName = big(o.oracleName);
  const assetPair = big(o.assetPair);
  const timestamp = big(o.timestamp);
  const price = big(o.price);
  checkRange(oracleName, 40, "oracleName");
  checkRange(assetPair, 128, "assetPair");
  checkRange(timestamp, 32, "timestamp");
  checkRange(price, 120, "price");
  return pedersen((assetPair << 40n) + oracleName, (price << 32n) + timestamp);
}

module.exports = {
  getLimitOrderMsg,
  getTransferMsg,
  getConditionalTransferMsg,
  getWithdrawalMsg,
  getWithdrawalToAddressMsg,
  getPriceMsg,
};
