// BLS12-381 ate pairing verification — native host component.
//
// The reference's only genuinely-C++ dependency is the herumi "mcl"
// pairing engine (SURVEY.md "Native components"); this is the TPU-native
// framework's equivalent: verification-side pairing products over a
// 6x64-limb Montgomery Fp, the Fp2/Fp6/Fp12 tower, an affine Miller loop
// over the untwisted G2 point and the full final exponentiation. The
// algorithm mirrors kzg_tpu/curve/pairing.py (the validated exact-Python
// oracle); inputs are affine big-endian coordinate blobs.
//
// Build: make -C native   ->  libkzgpair.so, loaded via ctypes with a
// pure-Python fallback (kzg_tpu/curve/pairing.py).

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------- Fp: 6x64 Montgomery ----------------
static const u64 Pmod[6] = {
    0xb9feffffffffaaabULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 R2[6] = {
    0xf4df1f341c341746ULL, 0x0a76e6a609d104f1ULL, 0x8de5476c4c95b6d5ULL,
    0x67eb88a9939d83c0ULL, 0x9a793e85b519952dULL, 0x11988fe592cae3aaULL};
static const u64 N0 = 0x89f3fffcfffcfffdULL;
static const u64 ONE_M[6] = {
    0x760900000002fffdULL, 0xebf4000bc40c0002ULL, 0x5f48985753c758baULL,
    0x77ce585370525745ULL, 0x5c071a97a256ec6dULL, 0x15f65ec3fa80e493ULL};
static const u64 PM2[6] = {  // p - 2 (Fermat inversion exponent)
    0xb9feffffffffaaa9ULL, 0x1eabfffeb153ffffULL, 0x6730d2a0f6b0f624ULL,
    0x64774b84f38512bfULL, 0x4b1ba7b6434bacd7ULL, 0x1a0111ea397fe69aULL};
static const u64 BLS_X_ABS = 0xd201000000010000ULL;  // |x|, x < 0

static const u64 FINAL_EXP[68] = {
    0xc0bcb9b55df57510ULL, 0x25f98630e68bfb24ULL, 0x4406fbc8fbd5f489ULL, 0x8e2f8491d12191a0ULL,
    0x3e9d71650a6f8069ULL, 0x226c2f011d4cab80ULL, 0x67f67c4717489119ULL, 0xaf3f881bd88592d7ULL,
    0x1a67e49eeed2161dULL, 0xe5b78c7869aeb218ULL, 0xf6539314043f7bbcULL, 0x73f62537f2701aaeULL,
    0xaff1c910e9622d2aULL, 0x6283313492caa9d4ULL, 0x2e2f3ec2bea83d19ULL, 0xa4c7e79fb02faa73ULL,
    0x6c49637fd7961be1ULL, 0x08e88adce8817745ULL, 0x35de3f7a36399917ULL, 0x9c1d9f7c31759c36ULL,
    0xfa9e13c24ea820b0ULL, 0x3fc56947a403577dULL, 0xa4c1b6dcfc5cceb7ULL, 0x1bbd81367066bca6ULL,
    0x0418a3ef0bc62775ULL, 0x49bf9b71a9f9e010ULL, 0x511291097db60b17ULL, 0x498345c6e5308f1cULL,
    0x6d8823b19dadd7c2ULL, 0x92004cedd556952cULL, 0x4c6bec3ec03ef195ULL, 0x0a1fad20044ce6adULL,
    0xc55d3109cd15948dULL, 0x334f46c02c3f0bd0ULL, 0x3b5a62eb34c05739ULL, 0x724538411d1676a5ULL,
    0x127a1b5ad0463434ULL, 0x61a474c5c85b0129ULL, 0x8dfc8e2886ef965eULL, 0x96532fef459f1243ULL,
    0x40ee7169cdc10412ULL, 0x9c40a68eb74bb22aULL, 0x25118790f4684d0bULL, 0x596bc293c8d4c01fULL,
    0x1064837f27611212ULL, 0x077ffb10bf24dde4ULL, 0xc49f570bcd2b01f3ULL, 0x1a0c5bf24c374693ULL,
    0x350da5359bc73ab6ULL, 0xd2670d93e4d7acddULL, 0xd39099b86e1ab656ULL, 0x19328148978e2b0dULL,
    0xb113f414386b0e88ULL, 0x07a0dce2630d9aa4ULL, 0xa927e7bb93753318ULL, 0xe347aa68ad49466fULL,
    0x1c0ad0d6106feaf4ULL, 0xc872ee83ff3a0f0fULL, 0x074e43b9a660835cULL, 0xc0aadff5e9cfee9aULL,
    0x30698e8cc7deada9ULL, 0xd1073776ab353f2cULL, 0x17848517badc3a43ULL, 0x7363baa13f8d14a9ULL,
    0xd4977b3f7d4507d0ULL, 0x496a1c0a89ee0193ULL, 0xdcc825b7e1bda9c0ULL, 0x0000000002ee1db5ULL};

struct Fp {
    u64 v[6];
};

static inline bool fp_is_zero(const Fp &a) {
    u64 acc = 0;
    for (int i = 0; i < 6; i++) acc |= a.v[i];
    return acc == 0;
}

static inline bool fp_eq(const Fp &a, const Fp &b) {
    u64 acc = 0;
    for (int i = 0; i < 6; i++) acc |= a.v[i] ^ b.v[i];
    return acc == 0;
}

static inline void fp_zero(Fp &a) { std::memset(a.v, 0, sizeof(a.v)); }

// a >= b on canonical limbs
static inline bool geq(const u64 *a, const u64 *b) {
    for (int i = 5; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

static inline void sub_p_if_needed(u64 *a) {
    if (geq(a, Pmod)) {
        u128 borrow = 0;
        for (int i = 0; i < 6; i++) {
            u128 d = (u128)a[i] - Pmod[i] - borrow;
            a[i] = (u64)d;
            borrow = (d >> 64) & 1;
        }
    }
}

static void fp_add(Fp &o, const Fp &a, const Fp &b) {
    u128 carry = 0;
    u64 t[6];
    for (int i = 0; i < 6; i++) {
        u128 s = (u128)a.v[i] + b.v[i] + carry;
        t[i] = (u64)s;
        carry = s >> 64;
    }
    // p < 2^382, so a+b < 2^383: no overflow past limb 5
    sub_p_if_needed(t);
    std::memcpy(o.v, t, sizeof(t));
}

static void fp_sub(Fp &o, const Fp &a, const Fp &b) {
    u128 borrow = 0;
    u64 t[6];
    for (int i = 0; i < 6; i++) {
        u128 d = (u128)a.v[i] - b.v[i] - borrow;
        t[i] = (u64)d;
        borrow = (d >> 64) & 1;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 6; i++) {
            u128 s = (u128)t[i] + Pmod[i] + carry;
            t[i] = (u64)s;
            carry = s >> 64;
        }
    }
    std::memcpy(o.v, t, sizeof(t));
}

static void fp_neg(Fp &o, const Fp &a) {
    if (fp_is_zero(a)) {
        o = a;
        return;
    }
    Fp p;
    std::memcpy(p.v, Pmod, sizeof(Pmod));
    fp_sub(o, p, a);
}

// CIOS Montgomery multiplication
static void fp_mul(Fp &o, const Fp &a, const Fp &b) {
    u64 t[8] = {0, 0, 0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 6; i++) {
        u128 carry = 0;
        for (int j = 0; j < 6; j++) {
            u128 s = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[6] + carry;
        t[6] = (u64)s;
        t[7] = (u64)(s >> 64);

        u64 m = t[0] * N0;
        carry = 0;
        {
            u128 s0 = (u128)t[0] + (u128)m * Pmod[0];
            carry = s0 >> 64;
        }
        for (int j = 1; j < 6; j++) {
            u128 s2 = (u128)t[j] + (u128)m * Pmod[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        u128 s3 = (u128)t[6] + carry;
        t[5] = (u64)s3;
        t[6] = t[7] + (u64)(s3 >> 64);
        t[7] = 0;
    }
    sub_p_if_needed(t);
    std::memcpy(o.v, t, 6 * sizeof(u64));
}

static void fp_sqr(Fp &o, const Fp &a) { fp_mul(o, a, a); }

static void fp_pow(Fp &o, const Fp &a, const u64 *e, int nwords) {
    Fp acc;
    std::memcpy(acc.v, ONE_M, sizeof(ONE_M));
    int top = nwords - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) {
        o = acc;
        return;
    }
    int bit = 63;
    while (bit >= 0 && !((e[top] >> bit) & 1)) bit--;
    for (int w = top; w >= 0; w--) {
        for (int b = (w == top ? bit : 63); b >= 0; b--) {
            fp_sqr(acc, acc);
            if ((e[w] >> b) & 1) fp_mul(acc, acc, a);
        }
    }
    o = acc;
}

static void fp_inv(Fp &o, const Fp &a) { fp_pow(o, a, PM2, 6); }

static void fp_from_be(Fp &o, const uint8_t *be48) {
    u64 c[6];
    for (int i = 0; i < 6; i++) {
        u64 w = 0;
        for (int j = 0; j < 8; j++) w = (w << 8) | be48[(5 - i) * 8 + j];
        c[i] = w;
    }
    Fp raw, r2;
    std::memcpy(raw.v, c, sizeof(c));
    std::memcpy(r2.v, R2, sizeof(R2));
    fp_mul(o, raw, r2);  // to Montgomery form
}

// ---------------- Fp2 = Fp[u]/(u^2+1) ----------------
struct F2 {
    Fp a, b;  // a + b*u
};

static void f2_add(F2 &o, const F2 &x, const F2 &y) {
    fp_add(o.a, x.a, y.a);
    fp_add(o.b, x.b, y.b);
}
static void f2_sub(F2 &o, const F2 &x, const F2 &y) {
    fp_sub(o.a, x.a, y.a);
    fp_sub(o.b, x.b, y.b);
}
static void f2_neg(F2 &o, const F2 &x) {
    fp_neg(o.a, x.a);
    fp_neg(o.b, x.b);
}
static void f2_mul(F2 &o, const F2 &x, const F2 &y) {
    Fp t0, t1, t2, sa, sb;
    fp_mul(t0, x.a, y.a);
    fp_mul(t1, x.b, y.b);
    fp_add(sa, x.a, x.b);
    fp_add(sb, y.a, y.b);
    fp_mul(t2, sa, sb);
    fp_sub(o.a, t0, t1);
    fp_sub(t2, t2, t0);
    fp_sub(o.b, t2, t1);
}
static void f2_sqr(F2 &o, const F2 &x) { f2_mul(o, x, x); }
static void f2_inv(F2 &o, const F2 &x) {
    Fp n, t, ninv;
    fp_sqr(n, x.a);
    fp_sqr(t, x.b);
    fp_add(n, n, t);
    fp_inv(ninv, n);
    fp_mul(o.a, x.a, ninv);
    Fp nb;
    fp_neg(nb, x.b);
    fp_mul(o.b, nb, ninv);
}
static void f2_mul_xi(F2 &o, const F2 &x) {  // * (u + 1)
    Fp a, b;
    fp_sub(a, x.a, x.b);
    fp_add(b, x.a, x.b);
    o.a = a;
    o.b = b;
}
static bool f2_is_zero(const F2 &x) { return fp_is_zero(x.a) && fp_is_zero(x.b); }
static bool f2_eq(const F2 &x, const F2 &y) { return fp_eq(x.a, y.a) && fp_eq(x.b, y.b); }
static void f2_zero(F2 &x) {
    fp_zero(x.a);
    fp_zero(x.b);
}
static void f2_one(F2 &x) {
    std::memcpy(x.a.v, ONE_M, sizeof(ONE_M));
    fp_zero(x.b);
}

// ---------------- Fp6 = Fp2[v]/(v^3 - (u+1)) ----------------
struct F6 {
    F2 c0, c1, c2;
};

static void f6_add(F6 &o, const F6 &x, const F6 &y) {
    f2_add(o.c0, x.c0, y.c0);
    f2_add(o.c1, x.c1, y.c1);
    f2_add(o.c2, x.c2, y.c2);
}
static void f6_sub(F6 &o, const F6 &x, const F6 &y) {
    f2_sub(o.c0, x.c0, y.c0);
    f2_sub(o.c1, x.c1, y.c1);
    f2_sub(o.c2, x.c2, y.c2);
}
static void f6_neg(F6 &o, const F6 &x) {
    f2_neg(o.c0, x.c0);
    f2_neg(o.c1, x.c1);
    f2_neg(o.c2, x.c2);
}
static void f6_mul(F6 &o, const F6 &x, const F6 &y) {
    F2 t0, t1, t2, s, t, u0;
    f2_mul(t0, x.c0, y.c0);
    f2_mul(t1, x.c1, y.c1);
    f2_mul(t2, x.c2, y.c2);
    // c0 = ((a1+a2)(b1+b2) - t1 - t2)*xi + t0
    f2_add(s, x.c1, x.c2);
    f2_add(t, y.c1, y.c2);
    f2_mul(u0, s, t);
    f2_sub(u0, u0, t1);
    f2_sub(u0, u0, t2);
    f2_mul_xi(u0, u0);
    F2 c0;
    f2_add(c0, u0, t0);
    // c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
    f2_add(s, x.c0, x.c1);
    f2_add(t, y.c0, y.c1);
    f2_mul(u0, s, t);
    f2_sub(u0, u0, t0);
    f2_sub(u0, u0, t1);
    F2 x2;
    f2_mul_xi(x2, t2);
    F2 c1;
    f2_add(c1, u0, x2);
    // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
    f2_add(s, x.c0, x.c2);
    f2_add(t, y.c0, y.c2);
    f2_mul(u0, s, t);
    f2_sub(u0, u0, t0);
    f2_sub(u0, u0, t2);
    F2 c2;
    f2_add(c2, u0, t1);
    o.c0 = c0;
    o.c1 = c1;
    o.c2 = c2;
}
static void f6_mul_v(F6 &o, const F6 &x) {  // (c0,c1,c2) -> (xi*c2, c0, c1)
    F2 t;
    f2_mul_xi(t, x.c2);
    F2 a = x.c0, b = x.c1;
    o.c0 = t;
    o.c1 = a;
    o.c2 = b;
}
static void f6_inv(F6 &o, const F6 &x) {
    F2 t0, t1, t2, tmp, denom, dinv;
    // t0 = a^2 - xi*(b*c)
    f2_sqr(t0, x.c0);
    f2_mul(tmp, x.c1, x.c2);
    f2_mul_xi(tmp, tmp);
    f2_sub(t0, t0, tmp);
    // t1 = xi*c^2 - a*b
    f2_sqr(t1, x.c2);
    f2_mul_xi(t1, t1);
    f2_mul(tmp, x.c0, x.c1);
    f2_sub(t1, t1, tmp);
    // t2 = b^2 - a*c
    f2_sqr(t2, x.c1);
    f2_mul(tmp, x.c0, x.c2);
    f2_sub(t2, t2, tmp);
    // denom = a*t0 + xi*(c*t1 + b*t2)
    F2 u1, u2;
    f2_mul(u1, x.c2, t1);
    f2_mul(u2, x.c1, t2);
    f2_add(u1, u1, u2);
    f2_mul_xi(u1, u1);
    f2_mul(denom, x.c0, t0);
    f2_add(denom, denom, u1);
    f2_inv(dinv, denom);
    f2_mul(o.c0, t0, dinv);
    f2_mul(o.c1, t1, dinv);
    f2_mul(o.c2, t2, dinv);
}
static bool f6_is_zero(const F6 &x) {
    return f2_is_zero(x.c0) && f2_is_zero(x.c1) && f2_is_zero(x.c2);
}
static bool f6_eq(const F6 &x, const F6 &y) {
    return f2_eq(x.c0, y.c0) && f2_eq(x.c1, y.c1) && f2_eq(x.c2, y.c2);
}
static void f6_zero(F6 &x) {
    f2_zero(x.c0);
    f2_zero(x.c1);
    f2_zero(x.c2);
}
static void f6_one(F6 &x) {
    f2_one(x.c0);
    f2_zero(x.c1);
    f2_zero(x.c2);
}

// ---------------- Fp12 = Fp6[w]/(w^2 - v) ----------------
struct F12 {
    F6 c0, c1;
};

static void f12_add(F12 &o, const F12 &x, const F12 &y) {
    f6_add(o.c0, x.c0, y.c0);
    f6_add(o.c1, x.c1, y.c1);
}
static void f12_sub(F12 &o, const F12 &x, const F12 &y) {
    f6_sub(o.c0, x.c0, y.c0);
    f6_sub(o.c1, x.c1, y.c1);
}
static void f12_mul(F12 &o, const F12 &x, const F12 &y) {
    F6 t0, t1, s, t, u0, vv;
    f6_mul(t0, x.c0, y.c0);
    f6_mul(t1, x.c1, y.c1);
    f6_mul_v(vv, t1);
    F6 c0;
    f6_add(c0, t0, vv);
    f6_add(s, x.c0, x.c1);
    f6_add(t, y.c0, y.c1);
    f6_mul(u0, s, t);
    f6_sub(u0, u0, t0);
    f6_sub(u0, u0, t1);
    o.c0 = c0;
    o.c1 = u0;
}
static void f12_sqr(F12 &o, const F12 &x) { f12_mul(o, x, x); }
static void f12_inv(F12 &o, const F12 &x) {
    F6 t0, t1, denom, dinv;
    f6_mul(t0, x.c0, x.c0);
    f6_mul(t1, x.c1, x.c1);
    f6_mul_v(t1, t1);
    f6_sub(denom, t0, t1);
    f6_inv(dinv, denom);
    f6_mul(o.c0, x.c0, dinv);
    F6 n;
    f6_neg(n, x.c1);
    f6_mul(o.c1, n, dinv);
}
static bool f12_eq(const F12 &x, const F12 &y) {
    return f6_eq(x.c0, y.c0) && f6_eq(x.c1, y.c1);
}
static void f12_one(F12 &x) {
    f6_one(x.c0);
    f6_zero(x.c1);
}
static bool f12_is_one(const F12 &x) {
    F12 one;
    f12_one(one);
    return f12_eq(x, one);
}
static void f12_pow(F12 &o, const F12 &x, const u64 *e, int nwords) {
    F12 acc;
    f12_one(acc);
    int top = nwords - 1;
    while (top >= 0 && e[top] == 0) top--;
    if (top < 0) {
        o = acc;
        return;
    }
    int bit = 63;
    while (bit >= 0 && !((e[top] >> bit) & 1)) bit--;
    for (int w = top; w >= 0; w--) {
        for (int b = (w == top ? bit : 63); b >= 0; b--) {
            f12_sqr(acc, acc);
            if ((e[w] >> b) & 1) f12_mul(acc, acc, x);
        }
    }
    o = acc;
}

// scalar embeddings
static void f12_from_fp(F12 &o, const Fp &x) {
    f6_zero(o.c0);
    f6_zero(o.c1);
    o.c0.c0.a = x;
    fp_zero(o.c0.c0.b);
}
static void f12_from_f2(F12 &o, const F2 &x) {
    f6_zero(o.c0);
    f6_zero(o.c1);
    o.c0.c0 = x;
}

// ---------------- curve over Fp12 (affine) ----------------
struct PtF12 {
    F12 x, y;
    bool inf;
};

static void f12_muli(F12 &o, const F12 &x, int k) {
    F12 acc = x;
    for (int i = 1; i < k; i++) f12_add(acc, acc, x);
    o = acc;
}

static void ec_double(PtF12 &o, const PtF12 &p) {
    if (p.inf) {
        o = p;
        return;
    }
    F12 m, t, d, x3, y3;
    f12_sqr(t, p.x);
    f12_muli(t, t, 3);
    f12_add(d, p.y, p.y);
    f12_inv(d, d);
    f12_mul(m, t, d);
    f12_sqr(x3, m);
    f12_add(t, p.x, p.x);
    f12_sub(x3, x3, t);
    f12_sub(t, p.x, x3);
    f12_mul(y3, m, t);
    f12_sub(y3, y3, p.y);
    o.x = x3;
    o.y = y3;
    o.inf = false;
}

static void ec_add(PtF12 &o, const PtF12 &p, const PtF12 &q) {
    if (p.inf) {
        o = q;
        return;
    }
    if (q.inf) {
        o = p;
        return;
    }
    if (f12_eq(p.x, q.x)) {
        if (f12_eq(p.y, q.y)) {
            ec_double(o, p);
        } else {
            o.inf = true;
        }
        return;
    }
    F12 m, t, d, x3, y3;
    f12_sub(t, q.y, p.y);
    f12_sub(d, q.x, p.x);
    f12_inv(d, d);
    f12_mul(m, t, d);
    f12_sqr(x3, m);
    f12_sub(x3, x3, p.x);
    f12_sub(x3, x3, q.x);
    f12_sub(t, p.x, x3);
    f12_mul(y3, m, t);
    f12_sub(y3, y3, p.y);
    o.x = x3;
    o.y = y3;
    o.inf = false;
}

// line through p1, p2 evaluated at t (all affine, non-infinite)
static void line_eval(F12 &o, const PtF12 &p1, const PtF12 &p2,
                      const PtF12 &t) {
    F12 m, num, den, tmp;
    if (f12_eq(p1.x, p2.x)) {
        if (f12_eq(p1.y, p2.y)) {
            f12_sqr(num, p1.x);
            f12_muli(num, num, 3);
            f12_add(den, p1.y, p1.y);
            f12_inv(den, den);
            f12_mul(m, num, den);
        } else {
            f12_sub(o, t.x, p1.x);  // vertical line
            return;
        }
    } else {
        f12_sub(num, p2.y, p1.y);
        f12_sub(den, p2.x, p1.x);
        f12_inv(den, den);
        f12_mul(m, num, den);
    }
    f12_sub(o, t.y, p1.y);
    f12_sub(tmp, t.x, p1.x);
    f12_mul(tmp, m, tmp);
    f12_sub(o, o, tmp);
}

// ---------------- untwist + Miller loop ----------------
// w^-2 and w^-3 as Fp12 constants, computed at runtime once
static void w_inv_powers(F12 &w2i, F12 &w3i) {
    F12 w;
    f6_zero(w.c0);
    f6_one(w.c1);
    F12 w2, w3;
    f12_mul(w2, w, w);
    f12_mul(w3, w2, w);
    f12_inv(w2i, w2);
    f12_inv(w3i, w3);
}

static void miller_loop(F12 &f, const PtF12 &q, const PtF12 &p, bool any_inf) {
    f12_one(f);
    if (any_inf) return;
    PtF12 t = q;
    F12 l;
    // bits of |x| from the second-highest down
    int top = 63;
    while (top >= 0 && !((BLS_X_ABS >> top) & 1)) top--;
    for (int b = top - 1; b >= 0; b--) {
        f12_sqr(f, f);
        line_eval(l, t, t, p);
        f12_mul(f, f, l);
        ec_double(t, t);
        if ((BLS_X_ABS >> b) & 1) {
            line_eval(l, t, q, p);
            f12_mul(f, f, l);
            ec_add(t, t, q);
        }
    }
    // x < 0: conjugate/invert
    F12 fi;
    f12_inv(fi, f);
    f = fi;
}

// Build the Fp12 embeddings of a G1 point (be96: x||y big-endian, 96
// bytes) and an untwisted G2 point (be192: x0||x1||y0||y1, 192 bytes).
static void load_g1(PtF12 &o, const uint8_t *be96, int inf_flag) {
    o.inf = inf_flag != 0;
    if (o.inf) return;
    Fp x, y;
    fp_from_be(x, be96);
    fp_from_be(y, be96 + 48);
    f12_from_fp(o.x, x);
    f12_from_fp(o.y, y);
}

static void load_g2_untwisted(PtF12 &o, const uint8_t *be192, int inf_flag) {
    o.inf = inf_flag != 0;
    if (o.inf) return;
    F2 x, y;
    fp_from_be(x.a, be192);
    fp_from_be(x.b, be192 + 48);
    fp_from_be(y.a, be192 + 96);
    fp_from_be(y.b, be192 + 144);
    F12 xe, ye, w2i, w3i;
    f12_from_f2(xe, x);
    f12_from_f2(ye, y);
    w_inv_powers(w2i, w3i);
    f12_mul(o.x, xe, w2i);
    f12_mul(o.y, ye, w3i);
}

extern "C" {

// e(a1, a2) * e(b1, b2) == 1 ?
// a1, b1: G1 affine big-endian x||y (96 bytes); a2, b2: G2 affine
// big-endian x0||x1||y0||y1 (192 bytes); *_inf flags mark infinity.
int kzg_pairings_verify(const uint8_t *a1, int a1_inf, const uint8_t *a2,
                        int a2_inf, const uint8_t *b1, int b1_inf,
                        const uint8_t *b2, int b2_inf) {
    PtF12 p1, q1, p2, q2;
    load_g1(p1, a1, a1_inf);
    load_g2_untwisted(q1, a2, a2_inf);
    load_g1(p2, b1, b1_inf);
    load_g2_untwisted(q2, b2, b2_inf);
    F12 f1, f2, f;
    miller_loop(f1, q1, p1, p1.inf || q1.inf);
    miller_loop(f2, q2, p2, p2.inf || q2.inf);
    f12_mul(f, f1, f2);
    F12 out;
    f12_pow(out, f, FINAL_EXP, 68);
    return f12_is_one(out) ? 1 : 0;
}

// e(p, q) raised to the final exponent; out = 1 iff pairing == identity.
int kzg_pairing_is_identity(const uint8_t *p, int p_inf, const uint8_t *q,
                            int q_inf) {
    PtF12 P, Q;
    load_g1(P, p, p_inf);
    load_g2_untwisted(Q, q, q_inf);
    F12 f, out;
    miller_loop(f, Q, P, P.inf || Q.inf);
    f12_pow(out, f, FINAL_EXP, 68);
    return f12_is_one(out) ? 1 : 0;
}

}  // extern "C"
