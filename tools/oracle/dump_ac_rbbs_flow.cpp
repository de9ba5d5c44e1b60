// Oracle for the AC-rbbs redactable-credential flow
// (examples/AC-rbbs/test.cpp: seed "seed", n=32, I={0,3}, message = 1-byte
// NUL span): wrapper algorithm + draw order from
// examples/AC-rbbs/src/{keygen,generate_attributes,issue,redact,pres,verify}.cpp.
// Notable quirks replicated: Y[n] is never written by keygen's recursive
// ladder (stays 49 zero bytes), and the q-challenge hash feeds the loop
// index i as a raw little-endian size_t.
#include "oracle_util.hpp"

struct Hasher {
    sha3 sh;
    Hasher() { SHA3_init(&sh, SHA3_HASH512); }
    void bytes(const char* d, int n) {
        for (int i = 0; i < n; i++) SHA3_process(&sh, d[i]);
    }
    void g1(ECP* p) {
        char buf[100];
        octet W{0, sizeof(buf), buf};
        ECP_toOctet(&W, p, true);
        bytes(W.val, W.len);
    }
    void zp(BIG v) {
        char b[48];
        BIG_toBytes(b, v);
        bytes(b, 48);
    }
    void to_zp(BIG out) {
        char dig[64];
        SHA3_hash(&sh, dig);
        DBIG dm;
        BIG_dfromBytesLen(dm, dig, 64);
        BIG r;
        BIG_rcopy(r, CURVE_Order);
        BIG_ctdmod(out, dm, r, 64 * 8 - 255);
    }
};

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t N = 32;
    const size_t I[2] = {0, 3};
    const size_t N_I = 2;

    // ---- keygen(32): g, tilde_g, [x, y] plain Zp^2; Y/tilde_Y ladders ----
    ECP g;
    ECP2 tg;
    rand_g1(&g, &rng);
    rand_g2(&tg, &rng);
    BIG x, y;
    rand_zp(x, &rng);
    rand_zp(y, &rng);
    ECP2 tX;
    ECP2_copy(&tX, &tg);
    PAIR_G2mul(&tX, x);

    // Y[i] = g^(y^(i+1)) for i != n; tilde_Y[i] = tg^(y^(i+1)) for i < n
    std::vector<std::string> Yhex(2 * N), tYhex(N);
    ECP Y[2 * N];
    ECP2 tY[N];
    bool Yset[2 * N] = {false};
    BIG yn;
    BIG_copy(yn, y);
    for (size_t i = 0; i < 2 * N; i++) {
        if (i < N) {
            ECP2_copy(&tY[i], &tg);
            PAIR_G2mul(&tY[i], yn);
            tYhex[i] = ser_g2(&tY[i]);
        }
        if (i != N) {
            ECP_copy(&Y[i], &g);
            PAIR_G1mul(&Y[i], yn);
            Yset[i] = true;
            Yhex[i] = ser_g1(&Y[i]);
        } else {
            Yhex[i] = std::string(98, '0');  // untouched zero bytes
        }
        BIG t;
        zp_mul(t, yn, y);
        BIG_copy(yn, t);
    }

    printf("{\n");
    printf("\"sk\": \"%s%s\",\n", ser_zp(x).c_str(), ser_zp(y).c_str());
    printf("\"pk_fixed\": \"%s%s%s\",\n", ser_g1(&g).c_str(),
           ser_g2(&tg).c_str(), ser_g2(&tX).c_str());
    printf("\"Y\": [");
    for (size_t i = 0; i < 2 * N; i++)
        printf("\"%s\"%s", Yhex[i].c_str(), i + 1 < 2 * N ? ", " : "");
    printf("],\n\"tilde_Y\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", tYhex[i].c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- generate_attributes: 32 plain draws ----
    Big a[N];
    for (size_t i = 0; i < N; i++) rand_zp(a[i].v, &rng);
    printf("\"attr\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_zp(a[i].v).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- issue: w (*Zp), A = (g * prod_{i<n} Y_i^a_i)^(1/(x+w)) ----
    BIG w;
    rand_nonzero(w, &rng);
    ECP base, t;
    ECP_copy(&base, &g);
    for (size_t i = 0; i < N; i++) {
        ECP_copy(&t, &Y[i]);
        PAIR_G1mul(&t, a[i].v);
        ECP_add(&base, &t);
    }
    BIG xw, xwi;
    zp_add(xw, x, w);
    zp_inv(xwi, xw);
    ECP A;
    ECP_copy(&A, &base);
    PAIR_G1mul(&A, xwi);
    printf("\"sig_A\": \"%s\",\n", ser_g1(&A).c_str());
    printf("\"sig_w\": \"%s\",\n", ser_zp(w).c_str());

    // ---- redact(I={0,3}) ----
    ECP CI, CJ, B;
    ECP_copy(&CI, &g);
    for (size_t k = 0; k < N_I; k++) {
        ECP_copy(&t, &Y[I[k]]);
        PAIR_G1mul(&t, a[I[k]].v);
        ECP_add(&CI, &t);
    }
    BIG nw;
    zp_neg(nw, w);
    ECP_copy(&B, &A);
    PAIR_G1mul(&B, nw);
    ECP_add(&B, &CI);
    ECP_inf(&CJ);
    bool inJ[N];
    for (size_t i = 0; i < N; i++)
        inJ[i] = (i != I[0] && i != I[1]);
    for (size_t j = 0; j < N; j++) {
        if (!inJ[j]) continue;
        ECP_copy(&t, &Y[j]);
        PAIR_G1mul(&t, a[j].v);
        ECP_add(&CJ, &t);
    }

    // q[i] = hash(a[I[0]], a[I[1]], i).to(Zp)
    Big q[N];
    for (size_t i = 0; i < N; i++) {
        Hasher H;
        for (size_t k = 0; k < N_I; k++) H.zp(a[I[k]].v);
        size_t iv = i;
        H.bytes((const char*)&iv, sizeof(iv));   // raw LE size_t
        H.to_zp(q[i].v);
    }

    // D = prod over k of Y_k^(sum_{i in I, k-n+i in J} q[i]*a[k-n+i])
    ECP D;
    ECP_inf(&D);
    for (size_t k = 0; k < 2 * N; k++) {
        BIG acc;
        BIG_zero(acc);
        bool any = false;
        for (size_t ki = 0; ki < N_I; ki++) {
            size_t i = I[ki];
            size_t idx = k + i;                  // k - n + i, guarded
            if (idx < N) continue;               // k-n+i < 0
            idx -= N;
            if (idx >= N || !inJ[idx]) continue;
            BIG term;
            zp_mul(term, q[i].v, a[idx].v);
            zp_add(acc, acc, term);
            any = true;
        }
        if (!any) continue;
        ECP_copy(&t, &Y[k]);
        PAIR_G1mul(&t, acc);
        ECP_add(&D, &t);
    }
    printf("\"redact\": \"%s%s%s%s\",\n", ser_g1(&CI).c_str(),
           ser_g1(&CJ).c_str(), ser_g1(&B).c_str(), ser_g1(&D).c_str());

    // ---- pres(m = 1-byte NUL) ----
    const char msg[] = "";
    const int mlen = 1;
    BIG r_;
    rand_zp(r_, &rng);
    ECP A_, B_, CJ_, D_;
    ECP_copy(&A_, &A);
    PAIR_G1mul(&A_, r_);
    ECP_copy(&B_, &B);
    PAIR_G1mul(&B_, r_);
    ECP_copy(&CJ_, &CJ);
    PAIR_G1mul(&CJ_, r_);
    ECP_copy(&D_, &D);
    PAIR_G1mul(&D_, r_);
    BIG al, be;
    rand_zp(al, &rng);
    rand_zp(be, &rng);
    ECP U;
    ECP_copy(&U, &CI);
    PAIR_G1mul(&U, al);
    ECP_copy(&t, &A_);
    PAIR_G1mul(&t, be);
    ECP_add(&U, &t);

    BIG c;
    {
        Hasher H;
        H.bytes(msg, mlen);
        H.g1(&A_);
        H.g1(&B_);
        H.g1(&CJ_);
        H.g1(&D_);
        H.g1(&U);
        H.to_zp(c);
    }
    BIG rc, s, tb, tmp;
    zp_mul(rc, r_, c);
    zp_add(s, al, rc);
    zp_mul(tmp, nw, c);
    zp_add(tb, be, tmp);
    printf("\"pres\": \"%s%s%s%s%s%s%s\",\n", ser_g1(&A_).c_str(),
           ser_g1(&B_).c_str(), ser_g1(&CJ_).c_str(), ser_g1(&D_).c_str(),
           ser_g1(&U).c_str(), ser_zp(s).c_str(), ser_zp(tb).c_str());

    // ---- verify (3 conditions) ----
    FP12 l, rgt;
    ECP cb;
    ECP_copy(&cb, &CJ_);
    ECP_add(&cb, &B_);
    ate(&l, &A_, &tX);
    ate(&rgt, &cb, &tg);
    int ok1 = FP12_equals(&l, &rgt);

    ECP L, R;
    ECP_copy(&L, &B_);
    PAIR_G1mul(&L, c);
    ECP_add(&L, &U);
    ECP_copy(&R, &CI);
    PAIR_G1mul(&R, s);
    ECP_copy(&t, &A_);
    PAIR_G1mul(&t, tb);
    ECP_add(&R, &t);
    int ok2 = ECP_equals(&L, &R);

    // pair(C_J_, prod_{i in I} tilde_Y[n-1-i]^q[i]) == pair(D_, tilde_g)
    ECP2 acc2, t2;
    ECP2_inf(&acc2);
    for (size_t ki = 0; ki < N_I; ki++) {
        size_t i = I[ki];
        ECP2_copy(&t2, &tY[N - 1 - i]);
        PAIR_G2mul(&t2, q[i].v);
        ECP2_add(&acc2, &t2);
    }
    FP12 l3, r3;
    ate(&l3, &CJ_, &acc2);
    ate(&r3, &D_, &tg);
    int ok3 = FP12_equals(&l3, &r3);

    printf("\"verify\": %s\n", (ok1 && ok2 && ok3) ? "true" : "false");
    printf("}\n");
    return 0;
}
