/**
 * SHA-512 + HMAC-SHA512 + PBKDF2-HMAC-SHA512 on Uint8Array (FIPS 180-4 /
 * RFC 2104 / RFC 8018). BigInt 64-bit lanes; zero dependencies.
 *
 * The round constants are the fractional parts of the cube roots of the
 * first 80 primes and the IV the fractional parts of the square roots of
 * the first 8 primes — derived here at load time with integer Newton
 * iterations instead of being transcribed, so a typo is impossible.
 */
"use strict";

const M64 = (1n << 64n) - 1n;

function primes(count) {
  const out = [];
  for (let n = 2; out.length < count; n++) {
    let isPrime = true;
    for (const p of out) {
      if (p * p > n) break;
      if (n % p === 0) {
        isPrime = false;
        break;
      }
    }
    if (isPrime) out.push(n);
  }
  return out;
}

function iroot(x, k) {
  // Integer k-th root by Newton iteration.
  if (x === 0n) return 0n;
  let r = 1n << BigInt(Math.ceil(Number(x.toString(2).length) / k) + 1);
  for (;;) {
    const rk1 = r ** BigInt(k - 1);
    const next = ((BigInt(k - 1) * r * rk1 + x) / (BigInt(k) * rk1));
    if (next >= r) return r;
    r = next;
  }
}

const PRIMES80 = primes(80);
// frac(cbrt(p)) * 2^64 = cbrt(p * 2^192) mod 2^64
const K = PRIMES80.map((p) => iroot(BigInt(p) << 192n, 3) & M64);
// frac(sqrt(p)) * 2^64 = sqrt(p * 2^128) mod 2^64
const IV = PRIMES80.slice(0, 8).map((p) => iroot(BigInt(p) << 128n, 2) & M64);

function rotr(x, n) {
  return ((x >> BigInt(n)) | (x << BigInt(64 - n))) & M64;
}

function sha512(message) {
  const mlen = message.length;
  const padded = new Uint8Array(Math.ceil((mlen + 1 + 16) / 128) * 128);
  padded.set(message);
  padded[mlen] = 0x80;
  let bitLen = BigInt(mlen) * 8n;
  for (let i = padded.length - 1; i >= padded.length - 16 && bitLen > 0n; i--) {
    padded[i] = Number(bitLen & 0xffn);
    bitLen >>= 8n;
  }

  const h = IV.slice();
  const w = new Array(80);
  for (let off = 0; off < padded.length; off += 128) {
    for (let i = 0; i < 16; i++) {
      let v = 0n;
      for (let j = 0; j < 8; j++) v = (v << 8n) | BigInt(padded[off + 8 * i + j]);
      w[i] = v;
    }
    for (let i = 16; i < 80; i++) {
      const s0 = rotr(w[i - 15], 1) ^ rotr(w[i - 15], 8) ^ (w[i - 15] >> 7n);
      const s1 = rotr(w[i - 2], 19) ^ rotr(w[i - 2], 61) ^ (w[i - 2] >> 6n);
      w[i] = (w[i - 16] + s0 + w[i - 7] + s1) & M64;
    }
    let [a, b, c, d, e, f, g, hh] = h;
    for (let i = 0; i < 80; i++) {
      const S1 = rotr(e, 14) ^ rotr(e, 18) ^ rotr(e, 41);
      const ch = (e & f) ^ (~e & M64 & g);
      const t1 = (hh + S1 + ch + K[i] + w[i]) & M64;
      const S0 = rotr(a, 28) ^ rotr(a, 34) ^ rotr(a, 39);
      const maj = (a & b) ^ (a & c) ^ (b & c);
      const t2 = (S0 + maj) & M64;
      hh = g; g = f; f = e; e = (d + t1) & M64;
      d = c; c = b; b = a; a = (t1 + t2) & M64;
    }
    h[0] = (h[0] + a) & M64; h[1] = (h[1] + b) & M64;
    h[2] = (h[2] + c) & M64; h[3] = (h[3] + d) & M64;
    h[4] = (h[4] + e) & M64; h[5] = (h[5] + f) & M64;
    h[6] = (h[6] + g) & M64; h[7] = (h[7] + hh) & M64;
  }
  const out = new Uint8Array(64);
  for (let i = 0; i < 8; i++) {
    let v = h[i];
    for (let j = 7; j >= 0; j--) {
      out[8 * i + j] = Number(v & 0xffn);
      v >>= 8n;
    }
  }
  return out;
}

function hmacSha512(key, message) {
  if (key.length > 128) key = sha512(key);
  const ipad = new Uint8Array(128 + message.length);
  const opad = new Uint8Array(128 + 64);
  for (let i = 0; i < 128; i++) {
    const k = i < key.length ? key[i] : 0;
    ipad[i] = k ^ 0x36;
    opad[i] = k ^ 0x5c;
  }
  ipad.set(message, 128);
  opad.set(sha512(ipad), 128);
  return sha512(opad);
}

function pbkdf2Sha512(password, salt, iterations, dklen) {
  const out = new Uint8Array(dklen);
  const nBlocks = Math.ceil(dklen / 64);
  for (let block = 1; block <= nBlocks; block++) {
    const saltBlock = new Uint8Array(salt.length + 4);
    saltBlock.set(salt);
    saltBlock[salt.length] = (block >>> 24) & 0xff;
    saltBlock[salt.length + 1] = (block >>> 16) & 0xff;
    saltBlock[salt.length + 2] = (block >>> 8) & 0xff;
    saltBlock[salt.length + 3] = block & 0xff;
    let u = hmacSha512(password, saltBlock);
    const acc = u.slice();
    for (let i = 1; i < iterations; i++) {
      u = hmacSha512(password, u);
      for (let j = 0; j < 64; j++) acc[j] ^= u[j];
    }
    out.set(acc.subarray(0, Math.min(64, dklen - 64 * (block - 1))), 64 * (block - 1));
  }
  return out;
}

module.exports = { sha512, hmacSha512, pbkdf2Sha512 };
