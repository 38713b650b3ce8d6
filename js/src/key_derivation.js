/**
 * StarkEx wallet key derivation: BIP-39 mnemonic -> BIP-32 path on
 * secp256k1 -> SHA-256 key grinding onto the Stark curve order, plus the
 * eth-signature derivation used by browser wallets. Mirrors the
 * framework's Python implementation (stark_perpetual_tpu/crypto/
 * key_derivation.py); capability parity with the reference's
 * key_derivation.js exports (key_derivation.js:158-162).
 *
 * All functions are pure; BigInt in, BigInt out (hex strings accepted).
 */
"use strict";

const { sha256 } = require("./sha256");
const { hmacSha512, pbkdf2Sha512 } = require("./sha512");

// --- secp256k1 ---------------------------------------------------------------

const SECP_P = (1n << 256n) - (1n << 32n) - 977n;
const SECP_N = 0xfffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141n;
const SECP_G = [
  0x79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798n,
  0x483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8n,
];

function mod(a, m) {
  const r = a % m;
  return r < 0n ? r + m : r;
}

function inv(a, m) {
  let [t, newT, r, newR] = [0n, 1n, m, mod(a, m)];
  while (newR !== 0n) {
    const q = r / newR;
    [t, newT] = [newT, t - q * newT];
    [r, newR] = [newR, r - q * newR];
  }
  return mod(t, m);
}

function secpAdd(p1, p2) {
  if (p1 === null) return p2;
  if (p2 === null) return p1;
  const [x1, y1] = p1;
  const [x2, y2] = p2;
  let s;
  if (x1 === x2) {
    if (mod(y1 + y2, SECP_P) === 0n) return null;
    s = mod(3n * x1 * x1 * inv(2n * y1, SECP_P), SECP_P);
  } else {
    s = mod((y2 - y1) * inv(x2 - x1, SECP_P), SECP_P);
  }
  const x3 = mod(s * s - x1 - x2, SECP_P);
  return [x3, mod(s * (x1 - x3) - y1, SECP_P)];
}

function secpMult(k, point = SECP_G) {
  let acc = null;
  let add = point;
  for (let e = mod(k, SECP_N); e > 0n; e >>= 1n) {
    if (e & 1n) acc = secpAdd(acc, add);
    add = secpAdd(add, add);
  }
  return acc;
}

// --- byte helpers --------------------------------------------------------------

function toBytes(x, length) {
  const out = new Uint8Array(length);
  for (let i = length - 1; i >= 0; i--) {
    out[i] = Number(x & 0xffn);
    x >>= 8n;
  }
  return out;
}

function fromBytes(bytes) {
  let v = 0n;
  for (const b of bytes) v = (v << 8n) | BigInt(b);
  return v;
}

function utf8(s) {
  return new TextEncoder().encode(s.normalize("NFKD"));
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

// --- BIP-39 / BIP-32 -------------------------------------------------------------

function mnemonicToSeed(mnemonic, passphrase = "") {
  return pbkdf2Sha512(utf8(mnemonic), utf8("mnemonic" + passphrase), 2048, 64);
}

function serP(point) {
  return concat(new Uint8Array([Number(2n + (point[1] & 1n))]), toBytes(point[0], 32));
}

function derivePrivateKeyFromPath(seed, path) {
  const parts = path.split("/");
  if (parts[0] !== "m") throw new Error("path must start with m");
  const digest = hmacSha512(utf8("Bitcoin seed"), seed);
  let k = fromBytes(digest.subarray(0, 32));
  let chain = digest.subarray(32);
  for (const part of parts.slice(1)) {
    const hardened = part.endsWith("'");
    const index =
      BigInt(hardened ? part.slice(0, -1) : part) + (hardened ? 1n << 31n : 0n);
    const data = hardened
      ? concat(new Uint8Array([0]), toBytes(k, 32), toBytes(index, 4))
      : concat(serP(secpMult(k)), toBytes(index, 4));
    const d = hmacSha512(chain, data);
    k = mod(fromBytes(d.subarray(0, 32)) + k, SECP_N);
    chain = d.subarray(32);
  }
  return k;
}

// --- StarkEx grinding & paths ------------------------------------------------------

const EC_ORDER = 0x800000000000010ffffffffffffffffb781126dcae7b2321e66a241adc64d2fn;

function grindKeyFromBytes(seedBytes, limit = EC_ORDER) {
  // Full-width seed (leading zeros preserved), minimal-width index byte.
  const maxAllowed = (1n << 256n) - ((1n << 256n) % limit);
  for (let index = 0n; ; index++) {
    const idxBytes =
      index === 0n ? new Uint8Array([0]) : toBytes(index, (index.toString(2).length + 7) >> 3);
    const key = fromBytes(sha256(concat(seedBytes, idxBytes)));
    if (key < maxAllowed) return key % limit;
  }
}

function getAccountPath(layer, application, ethAddress, index) {
  // m/2645'/layer'/application'/eth1'/eth2'/index (31-bit hash slices).
  const low31 = (v, start) => (v >> BigInt(start)) & ((1n << 31n) - 1n);
  const layerInt = low31(fromBytes(sha256(utf8(layer))), 0);
  const appInt = low31(fromBytes(sha256(utf8(application))), 0);
  const addr = BigInt(ethAddress);
  return `m/2645'/${layerInt}'/${appInt}'/${low31(addr, 0)}'/${low31(addr, 31)}'/${index}`;
}

function getKeyPairFromPath(mnemonic, path) {
  const keySeed = derivePrivateKeyFromPath(mnemonicToSeed(mnemonic), path);
  return grindKeyFromBytes(toBytes(keySeed, 32));
}

function getPrivateKeyFromEthSignature(ethSignature) {
  const sig = ethSignature.replace(/^0x/, "");
  if (sig.length !== 130 || !/^[0-9a-fA-F]+$/.test(sig)) {
    throw new Error("need a 130-hex-char eth signature");
  }
  const r = new Uint8Array(32);
  for (let i = 0; i < 32; i++) r[i] = parseInt(sig.slice(2 * i, 2 * i + 2), 16);
  return grindKeyFromBytes(r);
}

module.exports = {
  mnemonicToSeed,
  derivePrivateKeyFromPath,
  grindKeyFromBytes,
  getAccountPath,
  getKeyPairFromPath,
  getPrivateKeyFromEthSignature,
  secpMult,
  SECP_N,
};
