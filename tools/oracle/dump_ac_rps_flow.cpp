// Oracle for the AC-rps redactable-PS flow at the reference test's EXACT
// parameters (examples/AC-rps/test.cpp: seed "seed", n=64, I={0,1,3},
// message = 1-byte NUL span): wrapper algorithm + draw order from
// examples/AC-rps/src/{keygen,generate_attributes,issue,redact,pres,verify}.cpp.
//
// Evidence note: pres computes its q-challenges as
//   q[i] = hash(A_, B_, tilde_C_J_, i)          (pres.cpp:26)
// while verify recomputes them as
//   q[i] = hash(a[j] for j in I, i)             (verify.cpp:17)
// — different transcripts, so verify's condition t2 is expected to FAIL on
// the prover's own presentation.  This dump records t1/t2 separately to
// settle that question with the reference's own arithmetic.
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
    void g2(ECP2* p) {
        char buf[200];
        octet W{0, sizeof(buf), buf};
        ECP2_toOctet(&W, p, true);
        bytes(W.val, W.len);
    }
    void gt(FP12* f) {
        char buf[600];
        octet W{0, sizeof(buf), buf};
        FP12_toOctet(&W, f);
        bytes(W.val, W.len);
    }
    void zp(BIG v) {
        char b[48];
        BIG_toBytes(b, v);
        bytes(b, 48);
    }
    void idx(size_t i) { bytes((const char*)&i, sizeof(i)); }
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

    const size_t N = 64;
    const size_t I[3] = {0, 1, 3};
    const size_t N_I = 3;

    // ---- keygen(64): same ladder as AC-rbbs (Y[n] never written) ----
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

    std::vector<std::string> Yhex(2 * N), tYhex(N);
    static ECP Y[2 * N];
    static ECP2 tY[N];
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
            Yhex[i] = ser_g1(&Y[i]);
        } else {
            Yhex[i] = std::string(98, '0');
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

    // ---- generate_attributes: 64 plain draws ----
    static Big a[N];
    for (size_t i = 0; i < N; i++) rand_zp(a[i].v, &rng);
    printf("\"attr\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_zp(a[i].v).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- issue: sigma1 = *G1 draw; ym = sum a[i] y^(i+1); sigma2 ----
    ECP s1;
    rand_g1(&s1, &rng);
    BIG ym, ynn;
    BIG_zero(ym);
    BIG_copy(ynn, y);
    for (size_t i = 0; i < N; i++) {
        BIG term;
        zp_mul(term, a[i].v, ynn);
        zp_add(ym, ym, term);
        BIG t;
        zp_mul(t, ynn, y);
        BIG_copy(ynn, t);
    }
    BIG xym, xymi;
    zp_add(xym, x, ym);
    zp_inv(xymi, xym);
    ECP s2;
    ECP_copy(&s2, &s1);
    PAIR_G1mul(&s2, xymi);
    printf("\"sig\": \"%s%s\",\n", ser_g1(&s1).c_str(), ser_g1(&s2).c_str());

    // ---- redact: tilde_C_J = prod_{j in J, j != 0} tY[j]^a[j] ----
    bool inJ[N];
    for (size_t i = 0; i < N; i++)
        inJ[i] = (i != I[0] && i != I[1] && i != I[2]);
    ECP2 tCJ, t2;
    ECP2_inf(&tCJ);
    for (size_t j = 1; j < N; j++) {   // except(0): value 0 excluded
        if (!inJ[j]) continue;
        ECP2_copy(&t2, &tY[j]);
        PAIR_G2mul(&t2, a[j].v);
        ECP2_add(&tCJ, &t2);
    }
    printf("\"redact\": \"%s\",\n", ser_g2(&tCJ).c_str());

    // ---- pres: [k, r, t] = Zp^3 plain draws ----
    const char msg[] = "";
    const int mlen = 1;
    BIG kk, r_, tt;
    rand_zp(kk, &rng);
    rand_zp(r_, &rng);
    rand_zp(tt, &rng);

    ECP A_, B_, t1p;
    ECP_copy(&A_, &s1);
    PAIR_G1mul(&A_, r_);
    ECP_copy(&B_, &s2);
    PAIR_G1mul(&B_, r_);
    ECP_copy(&t1p, &A_);
    PAIR_G1mul(&t1p, tt);
    ECP_add(&B_, &t1p);
    ECP2 tCJ_;
    ECP2_copy(&tCJ_, &tg);
    PAIR_G2mul(&tCJ_, tt);
    ECP2_add(&tCJ_, &tCJ);

    // q[i] = hash(A_, B_, tCJ_, i).to(Zp)   (pres transcript)
    static Big qp[N];
    for (size_t i = 0; i < N; i++) {
        Hasher H;
        H.g1(&A_);
        H.g1(&B_);
        H.g2(&tCJ_);
        H.idx(i);
        H.to_zp(qp[i].v);
    }

    // D_ = prod Y_k^((t if n-1-k in I) + sum_{i in I, k-n+i in J} q[i] a[k-n+i])
    ECP D_, tp;
    ECP_inf(&D_);
    for (size_t k = 0; k < 2 * N; k++) {
        BIG acc;
        BIG_zero(acc);
        bool any = false;
        for (size_t ki = 0; ki < N_I; ki++) {
            size_t i = I[ki];
            size_t idx = k + i;
            if (idx < N) continue;
            idx -= N;
            if (idx >= N || !inJ[idx]) continue;
            BIG term;
            zp_mul(term, qp[i].v, a[idx].v);
            zp_add(acc, acc, term);
            any = true;
        }
        bool has_t = (k <= N - 1) &&
                     (N - 1 - k == I[0] || N - 1 - k == I[1] || N - 1 - k == I[2]);
        if (has_t) {
            zp_add(acc, acc, tt);
            any = true;
        }
        if (!any) continue;
        ECP_copy(&tp, &Y[k]);
        PAIR_G1mul(&tp, acc);
        ECP_add(&D_, &tp);
    }

    // U = e(A, tY[0]^k)
    ECP2 ty0k;
    ECP2_copy(&ty0k, &tY[0]);
    PAIR_G2mul(&ty0k, kk);
    FP12 U;
    ate(&U, &s1, &ty0k);

    BIG c;
    {
        Hasher H;
        H.bytes(msg, mlen);
        H.g1(&A_);
        H.g1(&B_);
        H.g2(&tCJ_);
        H.g1(&D_);
        H.gt(&U);
        H.to_zp(c);
    }
    BIG s, tmp;
    zp_mul(tmp, a[0].v, c);
    zp_add(s, kk, tmp);

    printf("\"pres\": \"%s%s%s%s%s%s\",\n", ser_g1(&A_).c_str(),
           ser_g1(&B_).c_str(), ser_g1(&D_).c_str(), ser_g2(&tCJ_).c_str(),
           ser_gt(&U).c_str(), ser_zp(s).c_str());

    // ---- verify ----
    BIG c2;
    {
        Hasher H;
        H.bytes(msg, mlen);
        H.g1(&A_);
        H.g1(&B_);
        H.g2(&tCJ_);
        H.g1(&D_);
        H.gt(&U);
        H.to_zp(c2);
    }
    // verify's q: hash(a[j] j in I, i)
    static Big qv[N];
    for (size_t i = 0; i < N; i++) {
        Hasher H;
        for (size_t ki = 0; ki < N_I; ki++) H.zp(a[I[ki]].v);
        H.idx(i);
        H.to_zp(qv[i].v);
    }
    printf("\"q_pres_0\": \"%s\",\n", ser_zp(qp[0].v).c_str());
    printf("\"q_verify_0\": \"%s\",\n", ser_zp(qv[0].v).c_str());

    // t1: e(A_, tY0^s) * U^-1 == (e(-A_, tX * tCJ_ * prod_{i in I,i!=0} tY_i^a_i) * e(B_, tg))^c
    ECP2 ty0s;
    ECP2_copy(&ty0s, &tY[0]);
    PAIR_G2mul(&ty0s, s);
    FP12 L1, Uinv;
    ate(&L1, &A_, &ty0s);
    FP12_copy(&Uinv, &U);
    FP12_inv(&Uinv, &Uinv);
    FP12_mul(&L1, &Uinv);

    ECP2 mix;
    ECP2_copy(&mix, &tX);
    ECP2_add(&mix, &tCJ_);
    for (size_t ki = 0; ki < N_I; ki++) {
        size_t i = I[ki];
        if (i == 0) continue;          // except(0)
        ECP2_copy(&t2, &tY[i]);
        PAIR_G2mul(&t2, a[i].v);
        ECP2_add(&mix, &t2);
    }
    ECP nA;
    ECP_copy(&nA, &A_);
    ECP_neg(&nA);
    FP12 R1, e2;
    ate(&R1, &nA, &mix);
    ate(&e2, &B_, &tg);
    FP12_mul(&R1, &e2);
    PAIR_GTpow(&R1, c2);
    int ok1 = FP12_equals(&L1, &R1);

    // t2: e(prod_{i in I} Y[n-1-i]^qv[i], tCJ_) == e(D_, tg)
    ECP agg;
    ECP_inf(&agg);
    for (size_t ki = 0; ki < N_I; ki++) {
        size_t i = I[ki];
        ECP_copy(&tp, &Y[N - 1 - i]);
        PAIR_G1mul(&tp, qv[i].v);
        ECP_add(&agg, &tp);
    }
    FP12 L2, R2;
    ate(&L2, &agg, &tCJ_);
    ate(&R2, &D_, &tg);
    int ok2 = FP12_equals(&L2, &R2);

    printf("\"verify_t1\": %s,\n", ok1 ? "true" : "false");
    printf("\"verify_t2\": %s,\n", ok2 ? "true" : "false");
    printf("\"verify\": %s\n", (ok1 && ok2) ? "true" : "false");
    printf("}\n");
    return 0;
}
