/**
 * Stark curve math on native BigInt: y^2 = x^3 + ALPHA*x + BETA over the
 * 252-bit Stark prime. Parameters (including the 506 Pedersen constant
 * points derived from the digits of pi) load from pedersen_points.json,
 * the same public parameter set as the reference's pedersen_params.json.
 */
"use strict";

const params = require("./pedersen_points.json");

const P = BigInt(params.FIELD_PRIME);
const EC_ORDER = BigInt(params.EC_ORDER);
const ALPHA = BigInt(params.ALPHA);
const BETA = BigInt(params.BETA);
const CONSTANT_POINTS = params.CONSTANT_POINTS.map(([x, y]) => [BigInt(x), BigInt(y)]);
const SHIFT_POINT = CONSTANT_POINTS[0];
const EC_GEN = CONSTANT_POINTS[1];

function mod(a, m) {
  const r = a % m;
  return r < 0n ? r + m : r;
}

function powMod(base, exp, m) {
  base = mod(base, m);
  let result = 1n;
  while (exp > 0n) {
    if (exp & 1n) result = (result * base) % m;
    base = (base * base) % m;
    exp >>= 1n;
  }
  return result;
}

function invMod(a, m) {
  // Extended Euclid (m prime in our uses, but works for any gcd==1).
  let [old_r, r] = [mod(a, m), m];
  let [old_s, s] = [1n, 0n];
  while (r !== 0n) {
    const q = old_r / r;
    [old_r, r] = [r, old_r - q * r];
    [old_s, s] = [s, old_s - q * s];
  }
  if (old_r !== 1n) throw new Error("not invertible");
  return mod(old_s, m);
}

function isQuadResidue(a, p) {
  return powMod(a, (p - 1n) / 2n, p) === 1n;
}

function sqrtMod(a, p) {
  // Tonelli-Shanks (p odd prime, a a quadratic residue).
  a = mod(a, p);
  if (a === 0n) return 0n;
  let q = p - 1n;
  let s = 0n;
  while ((q & 1n) === 0n) { q >>= 1n; s += 1n; }
  if (s === 1n) return powMod(a, (p + 1n) / 4n, p);
  let z = 2n;
  while (isQuadResidue(z, p)) z += 1n;
  let m = s;
  let c = powMod(z, q, p);
  let t = powMod(a, q, p);
  let r = powMod(a, (q + 1n) / 2n, p);
  while (t !== 1n) {
    let i = 0n;
    let t2 = t;
    while (t2 !== 1n) { t2 = (t2 * t2) % p; i += 1n; }
    const b = powMod(c, 1n << (m - i - 1n), p);
    m = i;
    c = (b * b) % p;
    t = (t * c) % p;
    r = (r * b) % p;
  }
  return r;
}

function ecAdd(p1, p2) {
  if (mod(p1[0] - p2[0], P) === 0n) throw new Error("ecAdd: equal x coordinates");
  const slope = mod((p1[1] - p2[1]) * invMod(p1[0] - p2[0], P), P);
  const x = mod(slope * slope - p1[0] - p2[0], P);
  return [x, mod(slope * (p1[0] - x) - p1[1], P)];
}

function ecDouble(pt) {
  if (mod(pt[1], P) === 0n) throw new Error("ecDouble: y == 0");
  const slope = mod((3n * pt[0] * pt[0] + ALPHA) * invMod(2n * pt[1], P), P);
  const x = mod(slope * slope - 2n * pt[0], P);
  return [x, mod(slope * (pt[0] - x) - pt[1], P)];
}

function ecMult(m, pt) {
  // Double-and-add matching the reference's recursion (math_utils.py:88-100).
  if (m === 1n) return pt;
  if ((m & 1n) === 0n) return ecMult(m >> 1n, ecDouble(pt));
  return ecAdd(ecMult(m - 1n, pt), pt);
}

module.exports = {
  P, EC_ORDER, ALPHA, BETA, CONSTANT_POINTS, SHIFT_POINT, EC_GEN,
  mod, powMod, invMod, isQuadResidue, sqrtMod, ecAdd, ecDouble, ecMult,
};
