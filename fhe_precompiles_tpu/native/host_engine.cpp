// Native host engine: SEAL-class C++ implementation of the BFV ops.
//
// Role in the framework (SURVEY.md section 2.2): the reference delegates all
// FHE math to Microsoft SEAL (C++).  Our canonical semantics live in
// bfv/golden.py (numpy) and the accelerated path in ops/engine.py (JAX/TPU);
// this file is the third engine -- a from-scratch C++ mirror of the golden
// model for CPU validators, where numpy's emulated-u64 modular arithmetic
// leaves ~20-50x on the table.  Every function reproduces the corresponding
// golden.py method bit-for-bit (asserted by tests/test_native_engine.py).
//
// Design notes
//  * All moduli are < 2**37 (params.py validate()), so a*b < 2**74 fits
//    unsigned __int128 and a per-modulus Barrett reduction with shift
//    b = bitlen(p) is exact after <= 2 conditional subtractions.
//  * NTT: negacyclic Cooley-Tukey forward / Gentleman-Sande inverse with
//    twiddles in bit-reversed (Longa-Naehrig) layout and Shoup-precomputed
//    companions -- the same tables and stage indexing as bfv/ntt.py, so
//    "NTT form" arrays are interchangeable across engines.
//  * The context derives every BEHZ/CRT constant itself from
//    (n, t, q_mods, key_mods, B, m_sk, m_tilde) -- the same derivations as
//    BfvContext.__init__ (golden.py:89-151) -- rather than importing them,
//    so the library is a standalone native engine, not a Python wrapper.
//  * Decrypt's scale-and-round uses exact wide arithmetic (u128/u192),
//    matching golden._message_from_dot's bigint CRT exactly (including on
//    garbage ciphertexts, where the division-free t-gamma approximation
//    used by the TPU path could differ on ~2^-16 of coefficients).
//
// Bounds assumed (asserted at ctx creation): k <= 4 ciphertext limbs with
// q = prod(ct_moduli) < 2**122 and t*q < 2**160 (u192 headroom); all
// moduli < 2**37.

#include <cstdint>
#include <cstring>
#include <map>
#include <vector>

typedef uint64_t u64;
typedef int64_t i64;
typedef unsigned __int128 u128;
typedef __int128 i128;

namespace {

// ---------------------------------------------------------------------------
// scalar modular helpers
// ---------------------------------------------------------------------------

static inline u64 addmod(u64 a, u64 b, u64 p) {
    u64 s = a + b;                 // a,b < p < 2^37: no u64 overflow
    return s >= p ? s - p : s;
}

static inline u64 submod(u64 a, u64 b, u64 p) {
    return a >= b ? a - b : a + (p - b);
}

static inline u64 negmod(u64 a, u64 p) { return a == 0 ? 0 : p - a; }

static u64 powmod(u64 base, u64 exp, u64 p) {
    u128 acc = 1, b = base % p;
    while (exp) {
        if (exp & 1) acc = acc * b % p;
        b = b * b % p;
        exp >>= 1;
    }
    return (u64)acc;
}

// Modular inverse via extended Euclid (works for non-prime moduli too,
// e.g. inverses mod m_tilde = 2^16; golden.py uses pow(a, -1, p)).
static u64 invmod(u64 a, u64 p) {
    i128 t = 0, newt = 1;
    i128 r = (i128)p, newr = (i128)(a % p);
    while (newr != 0) {
        i128 q = r / newr;
        i128 tmp = t - q * newt; t = newt; newt = tmp;
        tmp = r - q * newr; r = newr; newr = tmp;
    }
    if (r != 1) return 0;  // not invertible; callers guarantee it is
    if (t < 0) t += p;
    return (u64)t;
}

// Floored modulus of a signed value (numpy np.mod semantics).
static inline u64 fmod_signed(i64 v, u64 p) {
    i64 m = v % (i64)p;
    if (m < 0) m += (i64)p;
    return (u64)m;
}

// Per-modulus Barrett state: exact (a*b) % p for a, b < p < 2^37, plus a
// full-u64 -> mod-p pre-reduction for cross-base residues (fastbconv feeds
// values < q_i into a *different* target modulus x, possibly q_i > x).
struct Barrett {
    u64 p = 0;
    unsigned b = 0;   // bitlen(p)
    u64 mu = 0;       // floor(2^(2b) / p) < 2^(b+1)
    u64 mu64 = 0;     // floor(2^64 / p)   (requires p >= 2^10 to be useful)

    void init(u64 p_) {
        p = p_;
        b = 64 - __builtin_clzll(p);
        mu = (u64)((((u128)1) << (2 * b)) / p);
        mu64 = (u64)(((u128)1 << 64) / p);
    }
    inline u64 reduce(u128 x) const {        // x < 2^(2b)
        u64 qhat = (u64)(((u128)(u64)(x >> b) * mu) >> b);
        u64 r = (u64)(x - (u128)qhat * p);
        while (r >= p) r -= p;
        return r;
    }
    inline u64 mul(u64 a, u64 c) const { return reduce((u128)a * c); }
    inline u64 reduce64(u64 y) const {       // any y < 2^64 -> y mod p
        u64 qhat = (u64)(((u128)y * mu64) >> 64);
        u64 r = y - qhat * p;                // error <= 2
        while (r >= p) r -= p;
        return r;
    }
};

// Shoup multiply: (x * w) % p with precomputed ws = floor(w * 2^64 / p).
static inline u64 shoup_mul(u64 x, u64 w, u64 ws, u64 p) {
    u64 qhat = (u64)(((u128)x * ws) >> 64);
    u64 r = x * w - qhat * p;     // in [0, 2p)
    return r >= p ? r - p : r;
}

static inline u64 shoup_precompute(u64 w, u64 p) {
    return (u64)((((u128)w) << 64) / p);
}

// ---------------------------------------------------------------------------
// u192 helpers (only used by decrypt's exact scale-and-round)
// ---------------------------------------------------------------------------

struct u192 { u64 w0, w1, w2; };   // w0 least significant

static inline u192 u192_from_u128(u128 x) {
    return {(u64)x, (u64)(x >> 64), 0};
}

static inline u192 u192_add(u192 a, u192 b) {
    u192 r;
    unsigned char c = 0;
    c = __builtin_add_overflow(a.w0, b.w0, &r.w0);
    u64 t;
    unsigned char c1 = __builtin_add_overflow(a.w1, b.w1, &t);
    unsigned char c2 = __builtin_add_overflow(t, (u64)c, &r.w1);
    r.w2 = a.w2 + b.w2 + (u64)(c1 | c2);
    return r;
}

static inline bool u192_geq(u192 a, u192 b) {
    if (a.w2 != b.w2) return a.w2 > b.w2;
    if (a.w1 != b.w1) return a.w1 > b.w1;
    return a.w0 >= b.w0;
}

static inline u192 u192_sub(u192 a, u192 b) {   // requires a >= b
    u192 r;
    unsigned char brw = __builtin_sub_overflow(a.w0, b.w0, &r.w0);
    u64 t;
    unsigned char b1 = __builtin_sub_overflow(a.w1, b.w1, &t);
    unsigned char b2 = __builtin_sub_overflow(t, (u64)brw, &r.w1);
    r.w2 = a.w2 - b.w2 - (u64)(b1 | b2);
    return r;
}

// small (< 2^40) * u128 -> u192
static inline u192 u192_mul_small(u64 s, u128 x) {
    u128 lo = (u128)s * (u64)x;
    u128 hi = (u128)s * (u64)(x >> 64);
    u192 r;
    r.w0 = (u64)lo;
    u128 mid = (lo >> 64) + (u64)hi;
    r.w1 = (u64)mid;
    r.w2 = (u64)(hi >> 64) + (u64)(mid >> 64);
    return r;
}

// floor(N / q) for quotient < 2^48: float estimate + exact correction.
static inline u64 u192_div_u128_small(u192 N, u128 q) {
    long double nf = (long double)N.w2 * 340282366920938463463374607431768211456.0L  /* 2^128 */
                   + (long double)N.w1 * 18446744073709551616.0L                      /* 2^64 */
                   + (long double)N.w0;
    long double qf = (long double)(u64)(q >> 64) * 18446744073709551616.0L
                   + (long double)(u64)q;
    u64 est = (u64)(nf / qf);
    // correct: find exact floor around the estimate
    u192 prod = u192_mul_small(est, q);
    while (!u192_geq(N, prod)) {            // est too big
        est--;
        prod = u192_mul_small(est, q);
    }
    u192 rem = u192_sub(N, prod);
    u192 qq = u192_from_u128(q);
    while (u192_geq(rem, qq)) {             // est too small
        est++;
        rem = u192_sub(rem, qq);
    }
    return est;
}

// ---------------------------------------------------------------------------
// NTT tables (bit-reversed Longa-Naehrig layout; golden bfv/modmath.py)
// ---------------------------------------------------------------------------

// Minimal primitive 2n-th root of unity mod p (SEAL convention;
// golden modmath.minimal_primitive_root).
static u64 minimal_primitive_root(u64 two_n, u64 p) {
    u64 exp = (p - 1) / two_n;
    u64 root = 0;
    for (u64 g = 2; g < 10000; ++g) {
        u64 r = powmod(g, exp, p);
        if (powmod(r, two_n / 2, p) != 1) { root = r; break; }
    }
    if (!root) return 0;
    // minimum over all odd powers of root
    u128 root_sq = (u128)root * root % p;
    u128 cur = root; u64 best = root;
    for (u64 i = 0; i < two_n / 2; ++i) {
        if ((u64)cur < best) best = (u64)cur;
        cur = cur * root_sq % p;
    }
    return best;
}

static u64 bit_reverse(u64 x, unsigned bits) {
    u64 r = 0;
    for (unsigned i = 0; i < bits; ++i) { r = (r << 1) | (x & 1); x >>= 1; }
    return r;
}

struct Table {
    u64 p = 0;
    Barrett br;
    u64 n = 0;
    unsigned logn = 0;
    std::vector<u64> w, ws;     // root_powers + Shoup companions
    std::vector<u64> iw, iws;   // inverse root powers + Shoup
    u64 n_inv = 0, n_inv_s = 0;

    bool init(u64 p_, u64 n_) {
        p = p_; n = n_;
        br.init(p);
        logn = (unsigned)(63 - __builtin_clzll(n));
        if ((p - 1) % (2 * n) != 0) return false;
        u64 psi = minimal_primitive_root(2 * n, p);
        if (!psi) return false;
        std::vector<u64> pows(n);
        u128 acc = 1;
        for (u64 i = 0; i < n; ++i) { pows[i] = (u64)acc; acc = acc * psi % p; }
        w.resize(n); ws.resize(n); iw.resize(n); iws.resize(n);
        for (u64 i = 0; i < n; ++i) {
            u64 v = pows[bit_reverse(i, logn)];
            w[i] = v;
            ws[i] = shoup_precompute(v, p);
            u64 vi = invmod(v, p);
            iw[i] = vi;
            iws[i] = shoup_precompute(vi, p);
        }
        n_inv = invmod(n % p, p);
        n_inv_s = shoup_precompute(n_inv, p);
        return true;
    }
};

// Forward negacyclic NTT, natural -> bit-reversed (golden bfv/ntt.py ntt()).
static void ntt_inplace(const Table& tb, u64* a) {
    const u64 p = tb.p, n = tb.n;
    u64 t = n;
    for (u64 m = 1; m < n; m <<= 1) {
        t >>= 1;
        for (u64 blk = 0; blk < m; ++blk) {
            const u64 wv = tb.w[m + blk], wsv = tb.ws[m + blk];
            u64* lo = a + blk * 2 * t;
            u64* hi = lo + t;
            for (u64 j = 0; j < t; ++j) {
                u64 x = lo[j];
                u64 y = shoup_mul(hi[j], wv, wsv, p);
                lo[j] = addmod(x, y, p);
                hi[j] = submod(x, y, p);
            }
        }
    }
}

// Inverse negacyclic NTT, bit-reversed -> natural (golden bfv/ntt.py intt()).
static void intt_inplace(const Table& tb, u64* a) {
    const u64 p = tb.p, n = tb.n;
    u64 t = 1;
    for (u64 m = n >> 1; m >= 1; m >>= 1) {
        for (u64 blk = 0; blk < m; ++blk) {
            const u64 wv = tb.iw[m + blk], wsv = tb.iws[m + blk];
            u64* lo = a + blk * 2 * t;
            u64* hi = lo + t;
            for (u64 j = 0; j < t; ++j) {
                u64 x = lo[j], y = hi[j];
                lo[j] = addmod(x, y, p);
                hi[j] = shoup_mul(submod(x, y, p), wv, wsv, p);
            }
        }
        t <<= 1;
    }
    for (u64 j = 0; j < n; ++j)
        a[j] = shoup_mul(a[j], tb.n_inv, tb.n_inv_s, p);
}

// ---------------------------------------------------------------------------
// Context: params + every derived constant (mirrors BfvContext.__init__)
// ---------------------------------------------------------------------------

struct Ctx {
    u64 n = 0, t = 0;
    std::vector<u64> qm;        // ct moduli (k)
    std::vector<u64> keym;      // key moduli (k_key)
    std::vector<u64> B;         // aux base
    std::vector<u64> bsk;       // B + [m_sk]
    u64 m_sk = 0, m_tilde = 0;
    size_t k = 0, k_key = 0, nB = 0;
    std::map<u64, Table> tables;
    std::map<u64, Barrett> brs;     // Barrett for every modulus incl. m_tilde

    // Δ-scaling
    std::vector<u64> delta_mod_q;
    u64 q_mod_t = 0;

    // CRT compose (decrypt)
    u128 q = 0;
    std::vector<u128> q_hat;
    std::vector<u64> q_hat_inv;

    // keyswitch
    bool has_special = false;
    u64 P = 0, P_half = 0;
    std::vector<u64> inv_P_mod_q, half_mod_q;

    // BEHZ
    std::map<u64, std::vector<u64>> q_hat_mod_x;  // x in bsk + {m_tilde}
    std::map<u64, u64> q_mod_x;                   // x in bsk
    std::vector<u64> mtilde_mod_q;
    u64 neg_inv_q_mod_mtilde = 0;
    std::map<u64, u64> inv_mtilde_mod_x, inv_q_mod_x;   // x in bsk
    std::vector<u64> b_hat_inv;
    std::map<u64, std::vector<u64>> b_hat_mod_x;  // x in qm + {m_sk}
    std::vector<u64> prod_B_mod_q;
    u64 inv_prod_B_mod_msk = 0;

    const Table& tab(u64 p) const { return tables.at(p); }
    const Barrett& bar(u64 p) const { return brs.at(p); }
};

static u64 prod_mod(const std::vector<u64>& ms, u64 x, size_t skip = SIZE_MAX) {
    u128 acc = 1 % x;
    for (size_t i = 0; i < ms.size(); ++i) {
        if (i == skip) continue;
        acc = acc * (ms[i] % x) % x;
    }
    return (u64)acc;
}

}  // namespace

extern "C" {

// Returns NULL if parameters are unsupported (caller falls back to golden).
void* he_ctx_new(u64 n, u64 t,
                 const u64* q_mods, u64 k,
                 const u64* key_mods, u64 k_key,
                 const u64* aux, u64 n_aux,
                 u64 m_sk, u64 m_tilde) {
    if (k == 0 || k > 4 || n < 8 || (n & (n - 1)) || t < 2) return nullptr;
    Ctx* c = new Ctx();
    c->n = n; c->t = t;
    c->qm.assign(q_mods, q_mods + k);
    c->keym.assign(key_mods, key_mods + k_key);
    c->B.assign(aux, aux + n_aux);
    c->m_sk = m_sk; c->m_tilde = m_tilde;
    c->bsk = c->B; c->bsk.push_back(m_sk);
    c->k = k; c->k_key = k_key; c->nB = n_aux;

    // q and CRT hats must fit u128 with headroom (q < 2^122, k*q < 2^125)
    u128 q = 1;
    for (u64 i = 0; i < k; ++i) {
        if (q_mods[i] >= (1ULL << 37)) { delete c; return nullptr; }
        if (q > (((u128)1) << 122) / q_mods[i]) { delete c; return nullptr; }
        q *= q_mods[i];
    }
    c->q = q;

    // NTT tables for every NTT-bearing modulus
    std::vector<u64> all_p(c->keym);
    for (u64 b : c->bsk) all_p.push_back(b);
    for (u64 p : all_p) {
        if (p >= (1ULL << 37)) { delete c; return nullptr; }
        if (!c->tables.count(p)) {
            Table tb;
            if (!tb.init(p, n)) { delete c; return nullptr; }
            c->tables.emplace(p, std::move(tb));
        }
        if (!c->brs.count(p)) { Barrett b; b.init(p); c->brs.emplace(p, b); }
    }
    { Barrett b; b.init(m_tilde); c->brs.emplace(m_tilde, b); }

    // Δ constants (golden.py:103-108)
    u128 delta = q / t;
    for (u64 i = 0; i < k; ++i)
        c->delta_mod_q.push_back((u64)(delta % q_mods[i]));
    c->q_mod_t = (u64)(q % t);

    // CRT compose (golden.py:111-113)
    for (u64 i = 0; i < k; ++i) {
        u128 hat = 1;
        for (u64 j = 0; j < k; ++j) if (j != i) hat *= q_mods[j];
        c->q_hat.push_back(hat);
        c->q_hat_inv.push_back(invmod((u64)(hat % q_mods[i]), q_mods[i]));
    }

    // keyswitch constants (golden.py:116-121)
    if (k_key > k) {
        c->has_special = true;
        c->P = key_mods[k_key - 1];
        c->P_half = c->P >> 1;
        for (u64 i = 0; i < k; ++i) {
            c->inv_P_mod_q.push_back(invmod(c->P % q_mods[i], q_mods[i]));
            c->half_mod_q.push_back(c->P_half % q_mods[i]);
        }
    }

    // BEHZ constants (golden.py:123-151)
    u64 mt = m_tilde;
    std::vector<u64> targets = c->bsk; targets.push_back(mt);
    for (u64 x : targets) {
        std::vector<u64> hats(k);
        for (u64 i = 0; i < k; ++i) hats[i] = (u64)(c->q_hat[i] % x);
        c->q_hat_mod_x[x] = hats;
    }
    for (u64 x : c->bsk) {
        c->q_mod_x[x] = (u64)(q % x);
        c->inv_mtilde_mod_x[x] = invmod(mt % x, x);
        c->inv_q_mod_x[x] = invmod((u64)(q % x), x);
    }
    for (u64 i = 0; i < k; ++i) c->mtilde_mod_q.push_back(mt % q_mods[i]);
    c->neg_inv_q_mod_mtilde = (mt - invmod((u64)(q % mt), mt)) % mt;

    for (size_t i = 0; i < c->nB; ++i)
        c->b_hat_inv.push_back(
            invmod(prod_mod(c->B, c->B[i], i), c->B[i]));
    std::vector<u64> bx(c->qm); bx.push_back(m_sk);
    for (u64 x : bx) {
        std::vector<u64> hats(c->nB);
        for (size_t i = 0; i < c->nB; ++i) hats[i] = prod_mod(c->B, x, i);
        c->b_hat_mod_x[x] = hats;
    }
    for (u64 i = 0; i < k; ++i)
        c->prod_B_mod_q.push_back(prod_mod(c->B, q_mods[i]));
    c->inv_prod_B_mod_msk = invmod(prod_mod(c->B, m_sk), m_sk);
    return c;
}

void he_ctx_free(void* h) { delete (Ctx*)h; }

}  // extern "C"

namespace {

// ---------------------------------------------------------------------------
// internal op helpers (array layouts match golden.py numpy arrays)
// ---------------------------------------------------------------------------

// round(q*m/t) mod each q_j: (n,) mod-t -> (k, n)   (golden._scale_plain)
static void scale_plain(const Ctx& c, const u64* m, u64* out) {
    const u64 n = c.n, t = c.t, t2 = t / 2;
    for (size_t j = 0; j < c.k; ++j) {
        const u64 p = c.qm[j];
        const Barrett& br = c.bar(p);
        const u64 d = c.delta_mod_q[j];
        u64* o = out + j * n;
        for (u64 i = 0; i < n; ++i) {
            u64 fix = (c.q_mod_t * m[i] + t2) / t;   // < t (exact identity)
            o[i] = addmod(br.mul(d, m[i] % p), fix % p, p);
        }
    }
}

// FastBconv q -> targets (golden._fastbconv_q).  poly (k, n), out (|tg|, n).
static void fastbconv_q(const Ctx& c, const u64* poly,
                        const std::vector<u64>& targets, u64* out) {
    const u64 n = c.n;
    const size_t k = c.k;
    std::vector<u64> ys(k * n);
    for (size_t i = 0; i < k; ++i) {
        const Barrett& br = c.bar(c.qm[i]);
        const u64 qi = c.q_hat_inv[i];
        const u64* src = poly + i * n;
        u64* dst = ys.data() + i * n;
        for (u64 j = 0; j < n; ++j) dst[j] = br.mul(src[j], qi);
    }
    for (size_t xi = 0; xi < targets.size(); ++xi) {
        const u64 x = targets[xi];
        const Barrett& br = c.bar(x);
        const std::vector<u64>& hats = c.q_hat_mod_x.at(x);
        u64* o = out + xi * n;
        std::memset(o, 0, n * sizeof(u64));
        for (size_t i = 0; i < k; ++i) {
            const u64 h = hats[i];
            const u64* y = ys.data() + i * n;
            // y values live mod q_i which may exceed x: pre-reduce
            for (u64 j = 0; j < n; ++j)
                o[j] = addmod(o[j], br.mul(br.reduce64(y[j]), h), x);
        }
    }
}

// base-q poly -> Bsk residues via m_tilde Montgomery lift (golden._to_bsk).
static void to_bsk(const Ctx& c, const u64* poly, u64* out) {
    const u64 n = c.n, mt = c.m_tilde;
    const size_t k = c.k, nbsk = c.bsk.size();
    std::vector<u64> scaled(k * n);
    for (size_t i = 0; i < k; ++i) {
        const Barrett& br = c.bar(c.qm[i]);
        const u64 mtq = c.mtilde_mod_q[i];
        const u64* src = poly + i * n;
        u64* dst = scaled.data() + i * n;
        for (u64 j = 0; j < n; ++j) dst[j] = br.mul(src[j], mtq);
    }
    std::vector<u64> targets = c.bsk; targets.push_back(mt);
    std::vector<u64> conv((nbsk + 1) * n);
    fastbconv_q(c, scaled.data(), targets, conv.data());
    const u64* c_mt = conv.data() + nbsk * n;
    const Barrett& brmt = c.bar(mt);
    std::vector<i64> r_c(n);
    for (u64 j = 0; j < n; ++j) {
        u64 r = brmt.mul(c_mt[j], c.neg_inv_q_mod_mtilde);
        r_c[j] = (i64)r > (i64)(mt / 2) ? (i64)r - (i64)mt : (i64)r;
    }
    for (size_t xi = 0; xi < nbsk; ++xi) {
        const u64 x = c.bsk[xi];
        const Barrett& br = c.bar(x);
        const u64 qmx = c.q_mod_x.at(x), imt = c.inv_mtilde_mod_x.at(x);
        const u64* cv = conv.data() + xi * n;
        u64* o = out + xi * n;
        for (u64 j = 0; j < n; ++j) {
            u64 rm = fmod_signed(r_c[j], x);
            u64 num = addmod(cv[j], br.mul(qmx, rm), x);
            o[j] = br.mul(num, imt);
        }
    }
}

// Shenoy-Kumaresan exact Bsk -> q (golden._fastbconv_sk). in (nbsk, n).
static void fastbconv_sk(const Ctx& c, const u64* poly, u64* out) {
    const u64 n = c.n, msk = c.m_sk;
    const size_t nB = c.nB, k = c.k;
    std::vector<u64> ys(nB * n);
    for (size_t i = 0; i < nB; ++i) {
        const Barrett& br = c.bar(c.B[i]);
        const u64 bi = c.b_hat_inv[i];
        const u64* src = poly + i * n;
        u64* dst = ys.data() + i * n;
        for (u64 j = 0; j < n; ++j) dst[j] = br.mul(src[j], bi);
    }
    // alpha via m_sk
    const Barrett& brm = c.bar(msk);
    const std::vector<u64>& hm = c.b_hat_mod_x.at(msk);
    std::vector<i64> alpha_c(n);
    {
        std::vector<u64> acc(n, 0);
        for (size_t i = 0; i < nB; ++i) {
            const u64 h = hm[i];
            const u64* y = ys.data() + i * n;
            for (u64 j = 0; j < n; ++j)
                acc[j] = addmod(acc[j], brm.mul(brm.reduce64(y[j]), h), msk);
        }
        const u64* pmsk = poly + nB * n;
        for (u64 j = 0; j < n; ++j) {
            u64 a = brm.mul(submod(acc[j], pmsk[j], msk),
                            c.inv_prod_B_mod_msk);
            alpha_c[j] = (i64)a > (i64)(msk / 2) ? (i64)a - (i64)msk : (i64)a;
        }
    }
    for (size_t qi = 0; qi < k; ++qi) {
        const u64 p = c.qm[qi];
        const Barrett& br = c.bar(p);
        const std::vector<u64>& hats = c.b_hat_mod_x.at(p);
        const u64 pbq = c.prod_B_mod_q[qi];
        u64* o = out + qi * n;
        std::memset(o, 0, n * sizeof(u64));
        for (size_t i = 0; i < nB; ++i) {
            const u64 h = hats[i];
            const u64* y = ys.data() + i * n;
            for (u64 j = 0; j < n; ++j)
                o[j] = addmod(o[j], br.mul(br.reduce64(y[j]), h), p);
        }
        for (u64 j = 0; j < n; ++j) {
            u64 corr = br.mul(fmod_signed(alpha_c[j], p), pbq);
            o[j] = submod(o[j], corr, p);
        }
    }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// elementwise ciphertext ops.  ct arrays: (size, k, n) contiguous u64.
// ---------------------------------------------------------------------------

void he_add(void* h, const u64* a, const u64* b, u64 size, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    for (u64 s = 0; s < size; ++s)
        for (size_t j = 0; j < c.k; ++j) {
            const u64 p = c.qm[j];
            const u64* pa = a + (s * c.k + j) * c.n;
            const u64* pb = b + (s * c.k + j) * c.n;
            u64* po = out + (s * c.k + j) * c.n;
            for (u64 i = 0; i < c.n; ++i) po[i] = addmod(pa[i], pb[i], p);
        }
}

void he_sub(void* h, const u64* a, const u64* b, u64 size, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    for (u64 s = 0; s < size; ++s)
        for (size_t j = 0; j < c.k; ++j) {
            const u64 p = c.qm[j];
            const u64* pa = a + (s * c.k + j) * c.n;
            const u64* pb = b + (s * c.k + j) * c.n;
            u64* po = out + (s * c.k + j) * c.n;
            for (u64 i = 0; i < c.n; ++i) po[i] = submod(pa[i], pb[i], p);
        }
}

void he_neg(void* h, const u64* a, u64 size, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    for (u64 s = 0; s < size; ++s)
        for (size_t j = 0; j < c.k; ++j) {
            const u64 p = c.qm[j];
            const u64* pa = a + (s * c.k + j) * c.n;
            u64* po = out + (s * c.k + j) * c.n;
            for (u64 i = 0; i < c.n; ++i) po[i] = negmod(pa[i], p);
        }
}

// out = a with round(q*m/t) added to / subtracted from component 0.
// mode 0: add_plain, 1: sub_plain, 2: plain_sub (= -(a - m)).
void he_plain_affine(void* h, const u64* a, u64 size, const u64* m,
                     int mode, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    std::memcpy(out, a, size * c.k * n * sizeof(u64));
    std::vector<u64> dm(c.k * n);
    scale_plain(c, m, dm.data());
    for (size_t j = 0; j < c.k; ++j) {
        const u64 p = c.qm[j];
        u64* o = out + j * n;
        const u64* d = dm.data() + j * n;
        for (u64 i = 0; i < n; ++i)
            o[i] = mode == 0 ? addmod(o[i], d[i], p) : submod(o[i], d[i], p);
    }
    if (mode == 2)
        he_neg(h, out, size, out);
}

// ct * plain: negacyclic product of every component with the plain poly.
void he_mul_plain(void* h, const u64* a, u64 size, const u64* m, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    std::vector<u64> m_ntt(n), comp(n);
    for (size_t j = 0; j < c.k; ++j) {
        const u64 p = c.qm[j];
        const Table& tb = c.tab(p);
        const Barrett& br = c.bar(p);
        for (u64 i = 0; i < n; ++i) m_ntt[i] = m[i] % p;
        ntt_inplace(tb, m_ntt.data());
        for (u64 s = 0; s < size; ++s) {
            const u64* src = a + (s * c.k + j) * n;
            std::memcpy(comp.data(), src, n * sizeof(u64));
            ntt_inplace(tb, comp.data());
            for (u64 i = 0; i < n; ++i) comp[i] = br.mul(comp[i], m_ntt[i]);
            intt_inplace(tb, comp.data());
            std::memcpy(out + (s * c.k + j) * n, comp.data(), n * sizeof(u64));
        }
    }
}

// ---------------------------------------------------------------------------
// encryption: caller-supplied randomness (golden.encrypt_with_randomness)
// m: (n,) mod t; u/e0/e1: (n,) signed; pk: (2, k_key, n) NTT form.
// out: (2, k, n) coefficient form.
// ---------------------------------------------------------------------------

void he_encrypt(void* h, const u64* m, const i64* u, const i64* e0,
                const i64* e1, const u64* pk, u64 k_key_stride, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    std::vector<u64> dm(c.k * n), u_ntt(n), c0(n), c1(n);
    scale_plain(c, m, dm.data());
    for (size_t j = 0; j < c.k; ++j) {
        const u64 p = c.qm[j];
        const Table& tb = c.tab(p);
        const Barrett& br = c.bar(p);
        for (u64 i = 0; i < n; ++i) u_ntt[i] = fmod_signed(u[i], p);
        ntt_inplace(tb, u_ntt.data());
        const u64* pk0 = pk + (0 * k_key_stride + j) * n;
        const u64* pk1 = pk + (1 * k_key_stride + j) * n;
        for (u64 i = 0; i < n; ++i) {
            c0[i] = br.mul(u_ntt[i], pk0[i]);
            c1[i] = br.mul(u_ntt[i], pk1[i]);
        }
        intt_inplace(tb, c0.data());
        intt_inplace(tb, c1.data());
        u64* o0 = out + j * n;
        u64* o1 = out + (c.k + j) * n;
        const u64* d = dm.data() + j * n;
        for (u64 i = 0; i < n; ++i) {
            o0[i] = addmod(addmod(c0[i], fmod_signed(e0[i], p), p), d[i], p);
            o1[i] = addmod(c1[i], fmod_signed(e1[i], p), p);
        }
    }
}

// ---------------------------------------------------------------------------
// decryption (golden._dot_with_secret + exact _message_from_dot)
// ct: (size, k, n); s_ntt: (k, n) NTT form (first k limbs of the secret key).
// out: (n,) plaintext mod t.
// ---------------------------------------------------------------------------

void he_decrypt(void* h, const u64* ct, u64 size, const u64* s_ntt, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    std::vector<u64> dot(c.k * n);
    std::vector<u64> acc(n), term(n), cur(n);
    for (size_t j = 0; j < c.k; ++j) {
        const u64 p = c.qm[j];
        const Table& tb = c.tab(p);
        const Barrett& br = c.bar(p);
        const u64* s = s_ntt + j * n;
        std::memcpy(cur.data(), s, n * sizeof(u64));
        std::memset(acc.data(), 0, n * sizeof(u64));
        for (u64 comp = 1; comp < size; ++comp) {
            std::memcpy(term.data(), ct + (comp * c.k + j) * n,
                        n * sizeof(u64));
            ntt_inplace(tb, term.data());
            for (u64 i = 0; i < n; ++i)
                acc[i] = addmod(acc[i], br.mul(term[i], cur[i]), p);
            if (comp + 1 < size)
                for (u64 i = 0; i < n; ++i) cur[i] = br.mul(cur[i], s[i]);
        }
        intt_inplace(tb, acc.data());
        const u64* c0 = ct + j * n;
        u64* d = dot.data() + j * n;
        for (u64 i = 0; i < n; ++i) d[i] = addmod(c0[i], acc[i], p);
    }
    // exact CRT compose + round(t*x/q) mod t (golden._message_from_dot)
    const u128 q = c.q;
    const u128 q_half = q >> 1;
    for (u64 i = 0; i < n; ++i) {
        u128 S = 0;
        for (size_t j = 0; j < c.k; ++j) {
            const Barrett& br = c.bar(c.qm[j]);
            u64 y = br.mul(dot[j * n + i], c.q_hat_inv[j]);
            S += c.q_hat[j] * y;           // < k*q <= 4q < 2^124
        }
        while (S >= q) S -= q;             // <= k-1 subtractions
        // m = floor((t*S + q/2) / q) % t, exact in u192
        u192 N = u192_add(u192_mul_small(c.t, S), u192_from_u128(q_half));
        u64 mraw = u192_div_u128_small(N, q);
        out[i] = mraw % c.t;
    }
}

// ---------------------------------------------------------------------------
// BEHZ multiply (golden.multiply): (2,k,n) x (2,k,n) -> (3,k,n)
// ---------------------------------------------------------------------------

void he_multiply(void* h, const u64* a, const u64* b, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    const size_t k = c.k, nbsk = c.bsk.size(), nb = k + nbsk;
    std::vector<u64> bases(c.qm);
    for (u64 x : c.bsk) bases.push_back(x);

    // extend both operands into q + Bsk residues (golden.multiply extend())
    std::vector<u64> ea(2 * nb * n), eb(2 * nb * n);
    for (int comp = 0; comp < 2; ++comp) {
        std::memcpy(ea.data() + comp * nb * n, a + comp * k * n,
                    k * n * sizeof(u64));
        std::memcpy(eb.data() + comp * nb * n, b + comp * k * n,
                    k * n * sizeof(u64));
        to_bsk(c, a + comp * k * n, ea.data() + (comp * nb + k) * n);
        to_bsk(c, b + comp * k * n, eb.data() + (comp * nb + k) * n);
    }

    // tensor products per base, NTT domain (schoolbook, as golden)
    std::vector<u64> prod(3 * nb * n);
    {
        std::vector<u64> a0(n), a1(n), b0(n), b1(n), tmp(n);
        for (size_t xi = 0; xi < nb; ++xi) {
            const u64 p = bases[xi];
            const Table& tb = c.tab(p);
            const Barrett& br = c.bar(p);
            std::memcpy(a0.data(), ea.data() + (0 * nb + xi) * n, n * 8);
            std::memcpy(a1.data(), ea.data() + (1 * nb + xi) * n, n * 8);
            std::memcpy(b0.data(), eb.data() + (0 * nb + xi) * n, n * 8);
            std::memcpy(b1.data(), eb.data() + (1 * nb + xi) * n, n * 8);
            ntt_inplace(tb, a0.data());
            ntt_inplace(tb, a1.data());
            ntt_inplace(tb, b0.data());
            ntt_inplace(tb, b1.data());
            u64* p0 = prod.data() + (0 * nb + xi) * n;
            u64* p1 = prod.data() + (1 * nb + xi) * n;
            u64* p2 = prod.data() + (2 * nb + xi) * n;
            for (u64 i = 0; i < n; ++i) {
                p0[i] = br.mul(a0[i], b0[i]);
                p1[i] = addmod(br.mul(a0[i], b1[i]), br.mul(a1[i], b0[i]), p);
                p2[i] = br.mul(a1[i], b1[i]);
            }
            intt_inplace(tb, p0);
            intt_inplace(tb, p1);
            intt_inplace(tb, p2);
        }
    }

    // FastFloor + Shenoy-Kumaresan per component
    std::vector<u64> tq(nb * n), conv(nbsk * n), floor_bsk(nbsk * n);
    for (int comp = 0; comp < 3; ++comp) {
        for (size_t xi = 0; xi < nb; ++xi) {
            const u64 p = bases[xi];
            const Barrett& br = c.bar(p);
            const u64* src = prod.data() + (comp * nb + xi) * n;
            u64* dst = tq.data() + xi * n;
            const u64 tmod = c.t % p;
            for (u64 i = 0; i < n; ++i) dst[i] = br.mul(src[i], tmod);
        }
        fastbconv_q(c, tq.data(), c.bsk, conv.data());
        for (size_t xi = 0; xi < nbsk; ++xi) {
            const u64 x = c.bsk[xi];
            const Barrett& br = c.bar(x);
            const u64 iq = c.inv_q_mod_x.at(x);
            const u64* tqx = tq.data() + (k + xi) * n;
            const u64* cv = conv.data() + xi * n;
            u64* fb = floor_bsk.data() + xi * n;
            for (u64 i = 0; i < n; ++i)
                fb[i] = br.mul(submod(tqx[i], cv[i], x), iq);
        }
        fastbconv_sk(c, floor_bsk.data(), out + comp * k * n);
    }
}

// ---------------------------------------------------------------------------
// relinearization (golden.relinearize): (3,k,n) + rk (k,2,k_key,n) -> (2,k,n)
// ---------------------------------------------------------------------------

void he_relinearize(void* h, const u64* ct, const u64* rk, u64* out) {
    const Ctx& c = *(const Ctx*)h;
    const u64 n = c.n;
    const size_t k = c.k, kk = c.k_key;
    std::vector<u64> acc(2 * kk * n, 0), dji(n);
    for (size_t j = 0; j < k; ++j) {
        const u64* dj = ct + (2 * k + j) * n;
        for (size_t i = 0; i < kk; ++i) {
            const u64 p = c.keym[i];
            const Table& tb = c.tab(p);
            const Barrett& br = c.bar(p);
            for (u64 x = 0; x < n; ++x) dji[x] = br.reduce64(dj[x]);
            ntt_inplace(tb, dji.data());
            const u64* rk0 = rk + ((j * 2 + 0) * kk + i) * n;
            const u64* rk1 = rk + ((j * 2 + 1) * kk + i) * n;
            u64* a0 = acc.data() + (0 * kk + i) * n;
            u64* a1 = acc.data() + (1 * kk + i) * n;
            for (u64 x = 0; x < n; ++x) {
                a0[x] = addmod(a0[x], br.mul(dji[x], rk0[x]), p);
                a1[x] = addmod(a1[x], br.mul(dji[x], rk1[x]), p);
            }
        }
    }
    for (size_t i = 0; i < kk; ++i) {
        const Table& tb = c.tab(c.keym[i]);
        intt_inplace(tb, acc.data() + (0 * kk + i) * n);
        intt_inplace(tb, acc.data() + (1 * kk + i) * n);
    }
    // divide by the special prime P with rounding (golden.relinearize)
    const u64 P = c.P, half = c.P_half;
    for (int comp = 0; comp < 2; ++comp) {
        const u64* xP = acc.data() + (comp * kk + (kk - 1)) * n;
        for (size_t i = 0; i < k; ++i) {
            const u64 p = c.qm[i];
            const Barrett& br = c.bar(p);
            const u64 halfp = c.half_mod_q[i];
            const u64 ipq = c.inv_P_mod_q[i];
            const u64* ai = acc.data() + (comp * kk + i) * n;
            const u64* cti = ct + (comp * k + i) * n;
            u64* o = out + (comp * k + i) * n;
            for (u64 x = 0; x < n; ++x) {
                u64 xph = addmod(xP[x], half, P);
                u64 corr = submod(xph % p, halfp, p);
                u64 ti = submod(ai[x], corr, p);
                o[x] = addmod(cti[x], br.mul(ti, ipq), p);
            }
        }
    }
}

}  // extern "C"
