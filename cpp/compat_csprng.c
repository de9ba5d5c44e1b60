/* Native host compatibility kernel: the deterministic CSPRNG.
 *
 * C twin of compat/csprng.py (which is the executable specification and
 * stays the fallback).  The reference keeps this path in native code
 * (3rd-party/miracl-core/rand.cpp, hash.cpp HASH256) and so do we: bulk
 * stream generation for large batched protocol runs is host-side work in
 * the TPU design, and Python-per-byte is too slow at scale.
 *
 * Independent implementation of the published algorithms:
 *   - SHA-256 (FIPS 180-4)
 *   - Marsaglia-Zaman subtract-with-borrow lagged Fibonacci (NK=21, NJ=6,
 *     NV=8, 10,000-step warm-up per stir)
 *   - byte pool = SHA-256 of the low bytes of 128 generator words,
 *     re-hashed every 32 bytes
 *
 * Exposed as a tiny C ABI for ctypes (compat/csprng.py native path).
 */

#include <stdint.h>
#include <string.h>

/* ----------------------------------------------------------- SHA-256 -- */

typedef struct {
    uint32_t h[8];
    uint64_t len;
    uint8_t buf[64];
} sha256_t;

static const uint32_t K256[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

#define ROR(x, n) (((x) >> (n)) | ((x) << (32 - (n))))

static void sha256_init(sha256_t* s) {
    static const uint32_t h0[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372,
                                   0xa54ff53a, 0x510e527f, 0x9b05688c,
                                   0x1f83d9ab, 0x5be0cd19};
    memcpy(s->h, h0, sizeof h0);
    s->len = 0;
}

static void sha256_block(sha256_t* s, const uint8_t* p) {
    uint32_t w[64], a, b, c, d, e, f, g, h;
    int i;
    for (i = 0; i < 16; i++)
        w[i] = ((uint32_t)p[4 * i] << 24) | ((uint32_t)p[4 * i + 1] << 16) |
               ((uint32_t)p[4 * i + 2] << 8) | p[4 * i + 3];
    for (; i < 64; i++) {
        uint32_t s0 = ROR(w[i - 15], 7) ^ ROR(w[i - 15], 18) ^ (w[i - 15] >> 3);
        uint32_t s1 = ROR(w[i - 2], 17) ^ ROR(w[i - 2], 19) ^ (w[i - 2] >> 10);
        w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    a = s->h[0]; b = s->h[1]; c = s->h[2]; d = s->h[3];
    e = s->h[4]; f = s->h[5]; g = s->h[6]; h = s->h[7];
    for (i = 0; i < 64; i++) {
        uint32_t S1 = ROR(e, 6) ^ ROR(e, 11) ^ ROR(e, 25);
        uint32_t ch = (e & f) ^ (~e & g);
        uint32_t t1 = h + S1 + ch + K256[i] + w[i];
        uint32_t S0 = ROR(a, 2) ^ ROR(a, 13) ^ ROR(a, 22);
        uint32_t mj = (a & b) ^ (a & c) ^ (b & c);
        uint32_t t2 = S0 + mj;
        h = g; g = f; f = e; e = d + t1;
        d = c; c = b; b = a; a = t1 + t2;
    }
    s->h[0] += a; s->h[1] += b; s->h[2] += c; s->h[3] += d;
    s->h[4] += e; s->h[5] += f; s->h[6] += g; s->h[7] += h;
}

static void sha256_update(sha256_t* s, const uint8_t* p, uint64_t n) {
    uint64_t have = s->len % 64;
    s->len += n;
    if (have) {
        uint64_t need = 64 - have;
        if (n < need) {
            memcpy(s->buf + have, p, n);
            return;
        }
        memcpy(s->buf + have, p, need);
        sha256_block(s, s->buf);
        p += need;
        n -= need;
    }
    while (n >= 64) {
        sha256_block(s, p);
        p += 64;
        n -= 64;
    }
    if (n) memcpy(s->buf, p, n);
}

static void sha256_final(sha256_t* s, uint8_t out[32]) {
    uint64_t bits = s->len * 8;
    uint8_t pad = 0x80, z = 0;
    sha256_update(s, &pad, 1);
    while (s->len % 64 != 56) sha256_update(s, &z, 1);
    uint8_t lb[8];
    for (int i = 0; i < 8; i++) lb[i] = (uint8_t)(bits >> (56 - 8 * i));
    sha256_update(s, lb, 8);
    for (int i = 0; i < 8; i++) {
        out[4 * i] = (uint8_t)(s->h[i] >> 24);
        out[4 * i + 1] = (uint8_t)(s->h[i] >> 16);
        out[4 * i + 2] = (uint8_t)(s->h[i] >> 8);
        out[4 * i + 3] = (uint8_t)(s->h[i]);
    }
}

/* ------------------------------------------------ Marsaglia generator -- */

#define NK 21
#define NJ 6
#define NV 8

typedef struct {
    uint32_t ira[NK];
    int rndptr;
    uint32_t borrow;
    uint8_t pool[32];
    int pool_ptr;
} csprng_t;

static uint32_t sbrand(csprng_t* r) {
    int i, k;
    r->rndptr++;
    if (r->rndptr < NK) return r->ira[r->rndptr];
    r->rndptr = 0;
    for (i = 0, k = NK - NJ; i < NK; i++, k++) {
        if (k == NK) k = 0;
        uint32_t t = r->ira[k];
        uint32_t pdiff = t - r->ira[i] - r->borrow;
        if (pdiff < t) r->borrow = 0;
        if (pdiff > t) r->borrow = 1;
        r->ira[i] = pdiff;
    }
    return r->ira[0];
}

static void sirand(csprng_t* r, uint32_t seed) {
    int i;
    uint32_t t, m = 1;
    r->borrow = 0;
    r->rndptr = 0;
    r->ira[0] ^= seed;
    for (i = 1; i < NK; i++) {
        int in = (NV * i) % NK;
        r->ira[in] ^= m;
        t = m;
        m = seed - m;
        seed = t;
    }
    for (i = 0; i < 10000; i++) sbrand(r);
}

static void fill_pool(csprng_t* r) {
    sha256_t sh;
    sha256_init(&sh);
    for (int i = 0; i < 128; i++) {
        uint8_t b = (uint8_t)(sbrand(r) & 0xff);
        sha256_update(&sh, &b, 1);
    }
    sha256_final(&sh, r->pool);
    r->pool_ptr = 0;
}

/* ------------------------------------------------------------ C ABI --- */

int crypto12381_csprng_size(void) { return (int)sizeof(csprng_t); }

void crypto12381_csprng_seed(void* state, const uint8_t* raw, int rawlen) {
    csprng_t* r = (csprng_t*)state;
    memset(r, 0, sizeof *r);
    if (rawlen > 0) {
        uint8_t digest[32];
        sha256_t sh;
        sha256_init(&sh);
        sha256_update(&sh, raw, (uint64_t)rawlen);
        sha256_final(&sh, digest);
        for (int i = 0; i < 8; i++) {
            uint32_t w = (uint32_t)digest[4 * i] |
                         ((uint32_t)digest[4 * i + 1] << 8) |
                         ((uint32_t)digest[4 * i + 2] << 16) |
                         ((uint32_t)digest[4 * i + 3] << 24);
            sirand(r, w);
        }
    }
    fill_pool(r);
}

void crypto12381_csprng_bytes(void* state, uint8_t* out, long n) {
    csprng_t* r = (csprng_t*)state;
    for (long i = 0; i < n; i++) {
        out[i] = r->pool[r->pool_ptr++];
        if (r->pool_ptr >= 32) fill_pool(r);
    }
}
