/*
 * starkcrypto: native host-side Stark-curve primitives.
 *
 * The TPU framework's host runtime analog of the reference's fastecdsa C
 * dependency (fast_pedersen_hash.py:1-15): 4x64-bit Montgomery field
 * arithmetic over p = 2^251 + 17*2^192 + 1, Jacobian curve ops, per-bit
 * Pedersen accumulation over the 506 constant points, and fixed-base
 * scalar multiplication for key derivation.
 *
 * Pure C99 + __int128; no Python dependency (bound via ctypes).
 * All felt buffers are 4x little-endian uint64 (32 bytes), standard domain
 * at the API boundary, Montgomery internally.
 */

#include <stdint.h>
#include <string.h>

typedef uint64_t u64;
typedef unsigned __int128 u128;

typedef struct { u64 v[4]; } felt;

/* p = 2^251 + 17*2^192 + 1 (little-endian 64-bit limbs) */
static const felt P = {{0x0000000000000001ULL, 0x0000000000000000ULL,
                        0x0000000000000000ULL, 0x0800000000000011ULL}};
/* -p^-1 mod 2^64 == 2^64 - 1 (p == 1 mod 2^64) */
static const u64 NPRIME = 0xffffffffffffffffULL;
/* R^2 mod p, R = 2^256 */
static const felt R2 = {{0xfffffd737e000401ULL, 0x00000001330fffffULL,
                         0xffffffffff6f8000ULL, 0x07ffd4ab5e008810ULL}};
/* 1 in Montgomery form: R mod p */
static const felt ONE_M = {{0xffffffffffffffe1ULL, 0xffffffffffffffffULL,
                            0xffffffffffffffffULL, 0x07fffffffffffdf0ULL}};
/* p - 2, big-endian bits processed LSB-first in pow */
static const felt P_MINUS_2 = {{0xffffffffffffffffULL, 0xffffffffffffffffULL,
                                0xffffffffffffffffULL, 0x0800000000000010ULL}};

static int felt_is_zero(const felt *a) {
    return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static int felt_eq(const felt *a, const felt *b) {
    return a->v[0] == b->v[0] && a->v[1] == b->v[1] && a->v[2] == b->v[2] &&
           a->v[3] == b->v[3];
}

static int felt_geq(const felt *a, const felt *b) {
    for (int i = 3; i >= 0; i--) {
        if (a->v[i] > b->v[i]) return 1;
        if (a->v[i] < b->v[i]) return 0;
    }
    return 1;
}

static void felt_sub_raw(felt *out, const felt *a, const felt *b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 d = (u128)a->v[i] - b->v[i] - borrow;
        out->v[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
}

static void felt_add_mod(felt *out, const felt *a, const felt *b) {
    u128 carry = 0;
    felt t;
    for (int i = 0; i < 4; i++) {
        u128 s = (u128)a->v[i] + b->v[i] + carry;
        t.v[i] = (u64)s;
        carry = s >> 64;
    }
    /* p < 2^252 so a+b < 2^253: at most one conditional subtract with the
       carry folded in. carry can only be 0 here since inputs < p < 2^252. */
    if (carry || felt_geq(&t, &P)) {
        felt_sub_raw(out, &t, &P);
    } else {
        *out = t;
    }
}

static void felt_sub_mod(felt *out, const felt *a, const felt *b) {
    if (felt_geq(a, b)) {
        felt_sub_raw(out, a, b);
    } else {
        felt t;
        felt_sub_raw(&t, b, a);
        felt_sub_raw(out, &P, &t);
    }
}

/* Montgomery product: out = a*b*R^-1 mod p (CIOS, 4x64). */
static void mont_mul(felt *out, const felt *a, const felt *b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s = (u128)t[j] + (u128)a->v[i] * b->v[j] + c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s = (u128)t[4] + c;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * NPRIME;
        c = 0;
        for (int j = 0; j < 4; j++) {
            u128 s2 = (u128)t[j] + (u128)m * P.v[j] + c;
            t[j] = (u64)s2;
            c = s2 >> 64;
        }
        s = (u128)t[4] + c;
        t[4] = (u64)s;
        t[5] += (u64)(s >> 64);

        t[0] = t[1]; t[1] = t[2]; t[2] = t[3]; t[3] = t[4]; t[4] = t[5]; t[5] = 0;
    }
    felt r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || felt_geq(&r, &P)) {
        felt_sub_raw(&r, &r, &P);
    }
    *out = r;
}

static void to_mont(felt *out, const felt *a) { mont_mul(out, a, &R2); }

static void from_mont(felt *out, const felt *a) {
    felt one = {{1, 0, 0, 0}};
    mont_mul(out, a, &one);
}

static void felt_inv(felt *out, const felt *a) {
    /* Fermat: a^(p-2), LSB-first square-and-multiply (Montgomery domain). */
    felt result = ONE_M;
    felt base = *a;
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = P_MINUS_2.v[limb];
        int top = (limb == 3) ? 60 : 64; /* p-2 < 2^252 */
        for (int i = 0; i < top; i++) {
            if (bits & 1) mont_mul(&result, &result, &base);
            mont_mul(&base, &base, &base);
            bits >>= 1;
        }
    }
    *out = result;
}

/* ----- Jacobian curve ops (alpha = 1), Montgomery coordinates ----- */

typedef struct { felt x, y, z; } jac;

static void jac_double(jac *out, const jac *p) {
    felt xx, yy, yyyy, zz, s, m, t, az4, e8, yz;
    mont_mul(&xx, &p->x, &p->x);
    mont_mul(&yy, &p->y, &p->y);
    mont_mul(&yyyy, &yy, &yy);
    mont_mul(&zz, &p->z, &p->z);
    felt_add_mod(&t, &p->x, &yy);
    mont_mul(&t, &t, &t);
    felt_sub_mod(&t, &t, &xx);
    felt_sub_mod(&s, &t, &yyyy);
    felt_add_mod(&s, &s, &s);
    felt_add_mod(&m, &xx, &xx);
    felt_add_mod(&m, &m, &xx);
    mont_mul(&az4, &zz, &zz);
    mont_mul(&az4, &az4, &ONE_M); /* alpha = 1 */
    felt_add_mod(&m, &m, &az4);
    mont_mul(&t, &m, &m);
    felt_add_mod(&e8, &s, &s);
    felt_sub_mod(&out->x, &t, &e8);
    felt_add_mod(&e8, &yyyy, &yyyy);
    felt_add_mod(&e8, &e8, &e8);
    felt_add_mod(&e8, &e8, &e8);
    felt_sub_mod(&t, &s, &out->x);
    mont_mul(&t, &m, &t);
    felt_sub_mod(&out->y, &t, &e8);
    felt_add_mod(&yz, &p->y, &p->z);
    mont_mul(&yz, &yz, &yz);
    felt_sub_mod(&yz, &yz, &yy);
    felt_sub_mod(&out->z, &yz, &zz);
}

/* Mixed add: p (Jacobian) + (x2, y2) affine. Returns 0 ok, 1 doubling case. */
static int jac_madd(jac *out, const jac *p, const felt *x2, const felt *y2) {
    if (felt_is_zero(&p->z)) {
        out->x = *x2;
        out->y = *y2;
        out->z = ONE_M;
        return 0;
    }
    felt z1z1, u2, s2, h, hh, i4, j, r, v, t, y1j, z1h;
    mont_mul(&z1z1, &p->z, &p->z);
    mont_mul(&u2, x2, &z1z1);
    mont_mul(&s2, &p->z, &z1z1);
    mont_mul(&s2, y2, &s2);
    felt_sub_mod(&h, &u2, &p->x);
    felt_sub_mod(&r, &s2, &p->y);
    if (felt_is_zero(&h)) {
        if (felt_is_zero(&r)) return 1; /* doubling case: caller handles */
        /* p == -q: result infinity */
        memset(out, 0, sizeof(*out));
        return 0;
    }
    felt_add_mod(&r, &r, &r);
    mont_mul(&hh, &h, &h);
    felt_add_mod(&i4, &hh, &hh);
    felt_add_mod(&i4, &i4, &i4);
    mont_mul(&j, &h, &i4);
    mont_mul(&v, &p->x, &i4);
    mont_mul(&t, &r, &r);
    felt_sub_mod(&t, &t, &j);
    felt_sub_mod(&out->x, &t, &v);
    felt_sub_mod(&out->x, &out->x, &v);
    mont_mul(&y1j, &p->y, &j);
    felt_sub_mod(&t, &v, &out->x);
    mont_mul(&t, &r, &t);
    felt_sub_mod(&out->y, &t, &y1j);
    felt_sub_mod(&out->y, &out->y, &y1j);
    felt_add_mod(&z1h, &p->z, &h);
    mont_mul(&z1h, &z1h, &z1h);
    felt_sub_mod(&z1h, &z1h, &z1z1);
    felt_sub_mod(&out->z, &z1h, &hh);
    return 0;
}

static void jac_to_affine(felt *x, felt *y, const jac *p) {
    felt zinv, zinv2, zinv3;
    felt_inv(&zinv, &p->z);
    mont_mul(&zinv2, &zinv, &zinv);
    mont_mul(&zinv3, &zinv2, &zinv);
    mont_mul(x, &p->x, &zinv2);
    mont_mul(y, &p->y, &zinv3);
}

/* ----- Pedersen tables ----- */

/* 506 constant points, affine standard-domain (x, y) 4x64 each; converted to
 * Montgomery at set time. Slot 0 = shift point, 1 = ec gen, 2.. = hash bits. */
#define N_POINTS 506
static felt TBL_X[N_POINTS];
static felt TBL_Y[N_POINTS];
/* Affine 2^k * G for the fixed-base keygen ladder. */
static felt GPOW_X[256];
static felt GPOW_Y[256];
static int TBL_READY = 0;

void stark_set_constant_points(const u64 *xy_interleaved) {
    for (int i = 0; i < N_POINTS; i++) {
        felt x, y;
        memcpy(x.v, xy_interleaved + i * 8, 32);
        memcpy(y.v, xy_interleaved + i * 8 + 4, 32);
        to_mont(&TBL_X[i], &x);
        to_mont(&TBL_Y[i], &y);
    }
    jac g = {TBL_X[1], TBL_Y[1], ONE_M};
    for (int k = 0; k < 256; k++) {
        jac_to_affine(&GPOW_X[k], &GPOW_Y[k], &g);
        jac_double(&g, &g);
    }
    TBL_READY = 1;
}

/* Pedersen hash of two 252-bit elements. Returns 0 ok, nonzero on error. */
int stark_pedersen_hash(const u64 *a_in, const u64 *b_in, u64 *out) {
    if (!TBL_READY) return 2;
    jac acc = {TBL_X[0], TBL_Y[0], ONE_M}; /* shift point */
    const u64 *elems[2] = {a_in, b_in};
    for (int e = 0; e < 2; e++) {
        for (int bit = 0; bit < 252; bit++) {
            int limb = bit >> 6, off = bit & 63;
            if ((elems[e][limb] >> off) & 1) {
                jac nxt;
                if (jac_madd(&nxt, &acc, &TBL_X[2 + e * 252 + bit],
                             &TBL_Y[2 + e * 252 + bit]))
                    return 1; /* astronomically-unlikely doubling case */
                acc = nxt;
            }
        }
    }
    felt xm, ym, x;
    jac_to_affine(&xm, &ym, &acc);
    from_mont(&x, &xm);
    memcpy(out, x.v, 32);
    return 0;
}

/* Batched Pedersen: n pairs, arrays of 4x64 felts. Returns 0 ok. */
int stark_pedersen_hash_batch(const u64 *a_in, const u64 *b_in, u64 *out, long n) {
    for (long i = 0; i < n; i++) {
        int rc = stark_pedersen_hash(a_in + 4 * i, b_in + 4 * i, out + 4 * i);
        if (rc) return rc;
    }
    return 0;
}

/* Fixed-base scalar mult: pub = priv * G (G = table slot 1). Affine out. */
int stark_private_to_public(const u64 *priv, u64 *out_x, u64 *out_y) {
    if (!TBL_READY) return 2;
    jac acc;
    memset(&acc, 0, sizeof(acc)); /* infinity */
    for (int bit = 0; bit < 256; bit++) {
        int limb = bit >> 6, off = bit & 63;
        if ((priv[limb] >> off) & 1) {
            jac nxt;
            if (jac_madd(&nxt, &acc, &GPOW_X[bit], &GPOW_Y[bit])) {
                jac_double(&nxt, &acc);
            }
            acc = nxt;
        }
    }
    felt xm, ym, x, y;
    jac_to_affine(&xm, &ym, &acc);
    from_mont(&x, &xm);
    from_mont(&y, &ym);
    memcpy(out_x, x.v, 32);
    memcpy(out_y, y.v, 32);
    return 0;
}
