/**
 * Stark-curve crypto for wallets: Pedersen hash, ECDSA sign/verify (the
 * AIR-mimicking variant), key utilities. Mirrors the framework's Python
 * implementation (stark_perpetual_tpu/crypto/signature.py), which is pinned
 * to the reference's published fixtures; capability parity with the
 * reference's signature.js exports (signature.js:539-544).
 *
 * All scalar inputs/outputs are BigInt (hex strings accepted via big()).
 */
"use strict";

const { sha256, hmacSha256 } = require("./sha256");
const C = require("./starkcurve");

const N_BITS = 251n;
const BOUND = 1n << N_BITS; // 2^251
const MINUS_SHIFT_POINT = [C.SHIFT_POINT[0], C.mod(-C.SHIFT_POINT[1], C.P)];

function big(v) {
  return typeof v === "bigint" ? v : BigInt(v);
}

// --- encoding helpers -------------------------------------------------------

function toBytes(x, length) {
  const out = new Uint8Array(length);
  for (let i = length - 1; i >= 0; i--) {
    out[i] = Number(x & 0xffn);
    x >>= 8n;
  }
  return out;
}

function toBytesNoPad(x) {
  // Minimal-length big-endian encoding; 0 encodes as b"" except a single
  // zero byte for index 0 compatibility -- matches the Python
  // to_bytes_no_pad used by grind_key.
  if (x === 0n) return new Uint8Array([0]);
  let n = 0n;
  let len = 0;
  for (n = x; n > 0n; n >>= 8n) len++;
  return toBytes(x, len);
}

function fromBytes(bytes) {
  let x = 0n;
  for (const b of bytes) x = (x << 8n) | BigInt(b);
  return x;
}

function bitLength(x) {
  let n = 0n;
  while (x > 0n) { x >>= 1n; n++; }
  return n;
}

// --- Pedersen hash ----------------------------------------------------------

function pedersen(a, b) {
  a = big(a); b = big(b);
  let point = C.SHIFT_POINT;
  [a, b].forEach((el, i) => {
    if (!(el >= 0n && el < C.P)) throw new Error("pedersen input out of range");
    let x = el;
    for (let bit = 0; bit < 252; bit++) {
      const pt = C.CONSTANT_POINTS[2 + i * 252 + bit];
      if (point[0] === pt[0]) throw new Error("Unhashable input.");
      if (x & 1n) point = C.ecAdd(point, pt);
      x >>= 1n;
    }
  });
  return point[0];
}

// --- keys --------------------------------------------------------------------

function privateToStarkKey(privKey) {
  privKey = big(privKey);
  if (!(privKey > 0n && privKey < C.EC_ORDER)) throw new Error("bad private key");
  return C.ecMult(privKey, C.EC_GEN)[0];
}

function getYCoordinate(x) {
  x = big(x);
  const y2 = C.mod(x * x * x + C.ALPHA * x + C.BETA, C.P);
  if (!C.isQuadResidue(y2, C.P)) throw new Error("invalid public key");
  return C.sqrtMod(y2, C.P);
}

function grindKey(keySeed, keyValueLimit) {
  keySeed = big(keySeed); keyValueLimit = big(keyValueLimit);
  const maxAllowed = (1n << 256n) - ((1n << 256n) % keyValueLimit);
  for (let index = 0n; ; index++) {
    const input = new Uint8Array([
      ...toBytesNoPad(keySeed), ...toBytesNoPad(index),
    ]);
    const key = fromBytes(sha256(input));
    if (key < maxAllowed) return key % keyValueLimit;
  }
}

// --- RFC 6979 deterministic nonce --------------------------------------------

function bits2int(data, qlen) {
  let x = fromBytes(data);
  const blen = BigInt(data.length * 8);
  if (blen > qlen) x >>= blen - qlen;
  return x;
}

function generateKRfc6979(msgHash, privKey, seed) {
  msgHash = big(msgHash); privKey = big(privKey);
  // elliptic.js compatibility: a hash one hex nibble short of 32 bytes is
  // padded by a left shift of 4 bits (signature.py:119-121 semantics).
  const mbits = bitLength(msgHash);
  if (mbits % 8n >= 1n && mbits % 8n <= 4n && mbits >= 248n) msgHash *= 16n;

  const order = C.EC_ORDER;
  const qlen = bitLength(order);
  const rolen = Number((qlen + 7n) / 8n);
  const data = toBytes(msgHash, Number((bitLength(msgHash) + 7n) / 8n));
  const extra = seed === undefined || seed === null ? new Uint8Array(0)
    : toBytes(big(seed), Number((bitLength(big(seed)) + 7n) / 8n));

  // bits2octets
  let z1 = bits2int(data, qlen);
  let z2 = z1 - order;
  if (z2 < 0n) z2 = z1;
  const seedBytes = new Uint8Array([
    ...toBytes(privKey, rolen), ...toBytes(z2, rolen), ...extra,
  ]);

  let v = new Uint8Array(32).fill(1);
  let k = new Uint8Array(32).fill(0);
  k = hmacSha256(k, new Uint8Array([...v, 0, ...seedBytes]));
  v = hmacSha256(k, v);
  k = hmacSha256(k, new Uint8Array([...v, 1, ...seedBytes]));
  v = hmacSha256(k, v);
  for (;;) {
    let t = new Uint8Array(0);
    while (t.length < rolen) {
      v = hmacSha256(k, v);
      t = new Uint8Array([...t, ...v]);
    }
    const secret = bits2int(t, qlen);
    if (secret >= 1n && secret < order) return secret;
    k = hmacSha256(k, new Uint8Array([...v, 0]));
    v = hmacSha256(k, v);
  }
}

// --- sign / verify ------------------------------------------------------------

function sign(msgHash, privKey, seed) {
  msgHash = big(msgHash); privKey = big(privKey);
  if (!(msgHash >= 0n && msgHash < BOUND)) throw new Error("Message not signable.");
  let s = seed === undefined ? null : seed;
  for (;;) {
    const k = generateKRfc6979(msgHash, privKey, s === null ? undefined : s);
    s = s === null ? 1n : big(s) + 1n;
    const x = C.ecMult(k, C.EC_GEN)[0];
    const r = x; // no mod-order reduction (signature.py:157-158)
    if (!(r >= 1n && r < BOUND)) continue;
    const denom = C.mod(msgHash + r * privKey, C.EC_ORDER);
    if (denom === 0n) continue;
    const w = C.mod(k * C.invMod(denom, C.EC_ORDER), C.EC_ORDER);
    if (!(w >= 1n && w < BOUND)) continue;
    return { r, s: C.invMod(w, C.EC_ORDER) };
  }
}

function mimicEcMultAir(m, point, shiftPoint) {
  if (!(m > 0n && m < BOUND)) throw new Error("mimic: scalar out of range");
  let partial = shiftPoint;
  for (let i = 0; i < 251; i++) {
    if (partial[0] === point[0]) throw new Error("mimic: x collision");
    if (m & 1n) partial = C.ecAdd(partial, point);
    point = C.ecDouble(point);
    m >>= 1n;
  }
  if (m !== 0n) throw new Error("mimic: residual scalar");
  return partial;
}

function isPointOnCurve(x, y) {
  return C.mod(y * y - (x * x * x + C.ALPHA * x + C.BETA), C.P) === 0n;
}

function verify(msgHash, r, s, publicKey) {
  msgHash = big(msgHash); r = big(r); s = big(s);
  if (!(s >= 1n && s < C.EC_ORDER)) throw new Error("s out of range");
  const w = C.invMod(s, C.EC_ORDER);
  if (!(r >= 1n && r < BOUND)) throw new Error("r out of range");
  if (!(w >= 1n && w < BOUND)) throw new Error("w out of range");
  if (!(msgHash >= 0n && msgHash < BOUND)) throw new Error("msg out of range");

  if (!Array.isArray(publicKey)) {
    let y;
    try {
      y = getYCoordinate(big(publicKey));
    } catch (e) {
      return false;
    }
    return (
      verify(msgHash, r, s, [big(publicKey), y]) ||
      verify(msgHash, r, s, [big(publicKey), C.mod(-y, C.P)])
    );
  }
  const q = [big(publicKey[0]), big(publicKey[1])];
  if (!isPointOnCurve(q[0], q[1])) throw new Error("public key not on curve");
  let x;
  try {
    const zG = mimicEcMultAir(msgHash, C.EC_GEN, MINUS_SHIFT_POINT);
    const rQ = mimicEcMultAir(r, q, C.SHIFT_POINT);
    const wB = mimicEcMultAir(w, C.ecAdd(zG, rQ), C.SHIFT_POINT);
    x = C.ecAdd(wB, MINUS_SHIFT_POINT)[0];
  } catch (e) {
    return false;
  }
  return r === x;
}

module.exports = {
  pedersen,
  sign,
  verify,
  privateToStarkKey,
  getYCoordinate,
  grindKey,
  generateKRfc6979,
  mimicEcMultAir,
  big,
  curve: C,
};
