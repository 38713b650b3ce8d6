/**
 * StarkEx asset type / asset id derivation (keccak-based, the on-chain
 * token registration scheme). Mirrors the framework's Python module
 * (stark_perpetual_tpu/utils/assets.py); capability parity with the
 * reference's asset module (test/js/asset.spec.js fixtures).
 */
"use strict";

const { keccak256 } = require("./keccak");

const MASK_250 = (1n << 250n) - 1n;
const MASK_240 = (1n << 240n) - 1n;
const MINTABLE_ASSET_ID_FLAG = 1n << 250n;
const MINTABLE_FUNGIBLE_FLAGS = 0x7n << 248n;
const MINTABLE_ERC1155_FLAGS = 0x6n << 248n;

const SELECTORS = {
  ETH: "ETH()",
  ERC20: "ERC20Token(address)",
  ERC721: "ERC721Token(address,uint256)",
  MINTABLE_ERC20: "MintableERC20Token(address)",
  MINTABLE_ERC721: "MintableERC721Token(address,uint256)",
  MINTABLE_ERC1155: "MintableERC1155Token(address,uint256)",
};

function pad32(value) {
  const out = new Uint8Array(32);
  let v = BigInt(value);
  for (let i = 31; i >= 0; i--) {
    out[i] = Number(v & 0xffn);
    v >>= 8n;
  }
  return out;
}

function concat(...parts) {
  const out = new Uint8Array(parts.reduce((n, p) => n + p.length, 0));
  let off = 0;
  for (const p of parts) {
    out.set(p, off);
    off += p.length;
  }
  return out;
}

function fromBytes(bytes) {
  let v = 0n;
  for (const b of bytes) v = (v << 8n) | BigInt(b);
  return v;
}

function utf8(s) {
  return new TextEncoder().encode(s);
}

function getAssetType(asset) {
  const data = asset.data || {};
  let info = keccak256(utf8(SELECTORS[asset.type])).subarray(0, 4);
  if (data.tokenAddress !== undefined) {
    info = concat(info, pad32(BigInt(data.tokenAddress)));
  }
  const quantum =
    asset.type === "ETH" || asset.type === "ERC20"
      ? BigInt(data.quantum === undefined ? 1 : data.quantum)
      : 1n;
  return fromBytes(keccak256(concat(info, pad32(quantum)))) & MASK_250;
}

function getAssetId(asset) {
  const data = asset.data || {};
  const assetType = getAssetType(asset);
  if (asset.type === "ETH" || asset.type === "ERC20") return assetType;
  if (asset.type === "ERC721") {
    const digest = keccak256(
      concat(utf8("NFT:"), pad32(assetType), pad32(BigInt(data.tokenId)))
    );
    return fromBytes(digest) & MASK_250;
  }
  const blob = typeof data.blob === "string" ? utf8(data.blob) : Uint8Array.from(data.blob);
  const blobHash = keccak256(blob);
  const base =
    fromBytes(keccak256(concat(utf8("MINTABLE:"), pad32(assetType), blobHash))) &
    MASK_240;
  const flags = {
    MINTABLE_ERC20: MINTABLE_FUNGIBLE_FLAGS,
    MINTABLE_ERC721: MINTABLE_ASSET_ID_FLAG,
    MINTABLE_ERC1155: MINTABLE_ERC1155_FLAGS,
  }[asset.type];
  return base | flags;
}

module.exports = { getAssetType, getAssetId, keccak256 };
