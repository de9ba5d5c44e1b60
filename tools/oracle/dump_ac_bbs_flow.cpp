// Oracle for the AC-bbs selective-disclosure credential flow
// (examples/AC-bbs/test.cpp: seed "seed", n=32, I={0,3}, message = the
// 1-byte span of "" i.e. a single NUL): wrapper algorithm + draw order from
// examples/AC-bbs/src/{keygen,generate_attributes,issue,pres,verify}.cpp.
#include "oracle_util.hpp"

static void hash_to_zp_g1s(const char* m, int mlen, ECP* a, ECP* b, ECP* u,
                           BIG out) {
    sha3 sh;
    SHA3_init(&sh, SHA3_HASH512);
    for (int i = 0; i < mlen; i++) SHA3_process(&sh, m[i]);
    char buf[100];
    for (ECP* p : {a, b, u}) {
        octet W{0, sizeof(buf), buf};
        ECP_toOctet(&W, p, true);
        for (int i = 0; i < W.len; i++) SHA3_process(&sh, W.val[i]);
    }
    char dig[64];
    SHA3_hash(&sh, dig);
    DBIG dm;
    BIG_dfromBytesLen(dm, dig, 64);
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_ctdmod(out, dm, r, 64 * 8 - 255);
}

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t N = 32;
    const size_t I[2] = {0, 3};
    const size_t N_I = 2, N_J = N - N_I;

    // ---- keygen(32): g (*G1), tilde_g (*G2), x (plain Zp), Y[32] ----
    ECP g;
    ECP2 tg;
    rand_g1(&g, &rng);
    rand_g2(&tg, &rng);
    BIG x;
    rand_zp(x, &rng);
    ECP2 tX;
    ECP2_copy(&tX, &tg);
    PAIR_G2mul(&tX, x);
    ECP Y[N];
    for (size_t i = 0; i < N; i++) rand_g1(&Y[i], &rng);

    printf("{\n");
    printf("\"sk\": \"%s\",\n", ser_zp(x).c_str());
    printf("\"pk_fixed\": \"%s%s%s\",\n", ser_g1(&g).c_str(),
           ser_g2(&tg).c_str(), ser_g2(&tX).c_str());
    printf("\"Y\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_g1(&Y[i]).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- generate_attributes: 32 plain-Zp draws ----
    Big a[N];
    for (size_t i = 0; i < N; i++) rand_zp(a[i].v, &rng);
    printf("\"attr\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_zp(a[i].v).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- issue: w (*Zp), A = (g * prod Y_i^a_i)^(1/(x+w)) ----
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

    // ---- pres(message="" span incl NUL, I={0,3}) ----
    const char msg[] = "";
    const int mlen = 1;
    // C_I = g * prod_{i in I} Y_i^a_i ; C_J = prod_{j in J} Y_j^a_j
    ECP CI, CJ;
    ECP_copy(&CI, &g);
    for (size_t k = 0; k < N_I; k++) {
        ECP_copy(&t, &Y[I[k]]);
        PAIR_G1mul(&t, a[I[k]].v);
        ECP_add(&CI, &t);
    }
    size_t J[N_J];
    {
        size_t jj = 0;
        for (size_t i = 0; i < N; i++)
            if (i != I[0] && i != I[1]) J[jj++] = i;
    }
    ECP_inf(&CJ);
    for (size_t k = 0; k < N_J; k++) {
        ECP_copy(&t, &Y[J[k]]);
        PAIR_G1mul(&t, a[J[k]].v);
        ECP_add(&CJ, &t);
    }

    BIG r_;
    rand_zp(r_, &rng);
    ECP A_;
    ECP_copy(&A_, &A);
    PAIR_G1mul(&A_, r_);
    // B_ = (C_I * C_J)^r * A_^-w
    ECP B_;
    ECP_copy(&B_, &CI);
    ECP_add(&B_, &CJ);
    PAIR_G1mul(&B_, r_);
    BIG nw;
    zp_neg(nw, w);
    ECP_copy(&t, &A_);
    PAIR_G1mul(&t, nw);
    ECP_add(&B_, &t);

    BIG al, be;
    rand_zp(al, &rng);
    rand_zp(be, &rng);
    Big de[N_J];
    for (size_t k = 0; k < N_J; k++) rand_zp(de[k].v, &rng);

    // U = C_I^al * A_^be * prod Y_{J[j]}^de_j
    ECP U;
    ECP_copy(&U, &CI);
    PAIR_G1mul(&U, al);
    ECP_copy(&t, &A_);
    PAIR_G1mul(&t, be);
    ECP_add(&U, &t);
    for (size_t k = 0; k < N_J; k++) {
        ECP_copy(&t, &Y[J[k]]);
        PAIR_G1mul(&t, de[k].v);
        ECP_add(&U, &t);
    }

    BIG c;
    hash_to_zp_g1s(msg, mlen, &A_, &B_, &U, c);

    // s = al + r*c ; tt = be - w*c ; u_j = de_j + r*c*a_{J[j]}
    BIG rc, s, tb, tmp;
    zp_mul(rc, r_, c);
    zp_add(s, al, rc);
    zp_mul(tmp, nw, c);
    zp_add(tb, be, tmp);
    Big uj[N_J];
    for (size_t k = 0; k < N_J; k++) {
        zp_mul(tmp, rc, a[J[k]].v);
        zp_add(uj[k].v, de[k].v, tmp);
    }

    printf("\"pres_fixed\": \"%s%s%s%s%s\",\n", ser_g1(&A_).c_str(),
           ser_g1(&B_).c_str(), ser_g1(&U).c_str(), ser_zp(s).c_str(),
           ser_zp(tb).c_str());
    printf("\"pres_u\": [");
    for (size_t k = 0; k < N_J; k++)
        printf("\"%s\"%s", ser_zp(uj[k].v).c_str(), k + 1 < N_J ? ", " : "");
    printf("],\n");

    // ---- verify ----
    BIG c2;
    hash_to_zp_g1s(msg, mlen, &A_, &B_, &U, c2);
    FP12 lhs, rhs;
    ate(&lhs, &A_, &tX);
    ate(&rhs, &B_, &tg);
    int ok1 = FP12_equals(&lhs, &rhs);
    // U * B_^c == C_I^s * A_^t * prod Y_{J[j]}^{u_j}
    ECP L, R;
    ECP_copy(&L, &B_);
    PAIR_G1mul(&L, c2);
    ECP_add(&L, &U);
    ECP_copy(&R, &CI);
    PAIR_G1mul(&R, s);
    ECP_copy(&t, &A_);
    PAIR_G1mul(&t, tb);
    ECP_add(&R, &t);
    for (size_t k = 0; k < N_J; k++) {
        ECP_copy(&t, &Y[J[k]]);
        PAIR_G1mul(&t, uj[k].v);
        ECP_add(&R, &t);
    }
    int ok2 = ECP_equals(&L, &R);
    printf("\"verify\": %s\n", (ok1 && ok2) ? "true" : "false");
    printf("}\n");
    return 0;
}
