// Oracle for the MHAC-BBS threshold-credential flow
// (examples/MHAC-bbs/test.cpp: seed "seed", iss_setup(4), Prv={0,2},
// Pub={1,3}, generate_attributes(t=3, n=6), S={0,2,5}, Rev={1}):
// wrapper algorithm + draw order from examples/MHAC-bbs/src/*.cpp.
// Share vectors are party-major ([party][prv_attr]), matching the
// reference's own a_share[S[k]][ii] indexing in cred_pres.cpp.
#include "oracle_util.hpp"

struct Hasher {
    sha3 sh;
    Hasher() { SHA3_init(&sh, SHA3_HASH512); }
    void g1(ECP* p) {
        char buf[100];
        octet W{0, sizeof(buf), buf};
        ECP_toOctet(&W, p, true);
        for (int i = 0; i < W.len; i++) SHA3_process(&sh, W.val[i]);
    }
    void zp(BIG v) {
        char b[48];
        BIG_toBytes(b, v);
        for (int i = 0; i < 48; i++) SHA3_process(&sh, b[i]);
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

// Lagrange-at-0 coefficients for integer nodes xs[0..t)
static void lagrange(const int* xs, size_t t, Big* lam) {
    for (size_t k = 0; k < t; k++) {
        BIG acc;
        BIG_zero(acc);
        BIG_inc(acc, 1);
        BIG_norm(acc);
        for (size_t y2 = 0; y2 < t; y2++) {
            if (y2 == k) continue;
            BIG xy, xk, num, den, deninv, fac;
            BIG_zero(xy); BIG_inc(xy, xs[y2]); BIG_norm(xy);
            BIG_zero(xk); BIG_inc(xk, xs[k]); BIG_norm(xk);
            zp_neg(num, xy);
            zp_sub(den, xk, xy);
            zp_inv(deninv, den);
            zp_mul(fac, num, deninv);
            zp_mul(acc, acc, fac);
        }
        BIG_copy(lam[k].v, acc);
    }
}

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t M = 4, T = 3, NP = 6;
    const size_t Prv[2] = {0, 2}, Pub[2] = {1, 3};
    const size_t S[3] = {0, 2, 5};
    const size_t Rev[1] = {1};

    // ---- iss_setup(4): bbs::setup(4) + key_gen ----
    ECP g1;
    ECP2 g2;
    ECP h[M];
    rand_g1(&g1, &rng);
    rand_g2(&g2, &rng);
    for (size_t i = 0; i < M; i++) rand_g1(&h[i], &rng);
    BIG gamma;
    rand_nonzero(gamma, &rng);
    ECP2 w;
    ECP2_copy(&w, &g2);
    PAIR_G2mul(&w, gamma);

    printf("{\n");
    printf("\"g1g2\": \"%s%s\",\n", ser_g1(&g1).c_str(), ser_g2(&g2).c_str());
    printf("\"h\": [");
    for (size_t i = 0; i < M; i++)
        printf("\"%s\"%s", ser_g1(&h[i]).c_str(), i + 1 < M ? ", " : "");
    printf("],\n");
    printf("\"sk\": \"%s\",\n", ser_zp(gamma).c_str());
    printf("\"pk\": \"%s\",\n", ser_g2(&w).c_str());

    // ---- generate_attributes(t=3, n=6, Prv={0,2}) ----
    Big attr[M];
    for (size_t i = 0; i < M; i++) rand_zp(attr[i].v, &rng);
    Big ash[4];                       // Prv.size() * (t-1) = 4 poly coeffs
    for (size_t i = 0; i < 4; i++) rand_zp(ash[i].v, &rng);

    // shares[ii][k] = attr[Prv[ii]] + sum_i a[ii*(t-1)+i] * (k+1)^(i+1)
    Big shares[2][NP];
    for (size_t ii = 0; ii < 2; ii++) {
        for (size_t k = 0; k < NP; k++) {
            BIG acc;
            BIG_copy(acc, attr[Prv[ii]].v);
            unsigned long long xp = 1;
            for (size_t i = 0; i < T - 1; i++) {
                xp *= (k + 1);
                BIG xb, term;
                BIG_zero(xb);
                BIG_inc(xb, (int)xp);
                BIG_norm(xb);
                zp_mul(term, ash[ii * (T - 1) + i].v, xb);
                zp_add(acc, acc, term);
            }
            BIG_copy(shares[ii][k].v, acc);
        }
    }
    // C[k] = prod_ii h[Prv[ii]]^shares[ii][k]
    ECP C[NP], t1;
    for (size_t k = 0; k < NP; k++) {
        ECP_inf(&C[k]);
        for (size_t ii = 0; ii < 2; ii++) {
            ECP_copy(&t1, &h[Prv[ii]]);
            PAIR_G1mul(&t1, shares[ii][k].v);
            ECP_add(&C[k], &t1);
        }
    }

    printf("\"pub_attrs\": [\"%s\", \"%s\"],\n",
           ser_zp(attr[Pub[0]].v).c_str(), ser_zp(attr[Pub[1]].v).c_str());
    printf("\"shares\": [");      // party-major: [party][prv_attr]
    for (size_t k = 0; k < NP; k++) {
        printf("[\"%s\", \"%s\"]%s", ser_zp(shares[0][k].v).c_str(),
               ser_zp(shares[1][k].v).c_str(), k + 1 < NP ? ", " : "");
    }
    printf("],\n\"C\": [");
    for (size_t k = 0; k < NP; k++)
        printf("\"%s\"%s", ser_g1(&C[k]).c_str(), k + 1 < NP ? ", " : "");
    printf("],\n");

    // ---- cred_iss(t=3, C, Pub, pub_attrs) ----
    // C_a = g1 * prod_{i<t} C[i]^lam_i (nodes 1..t) * prod h[Pub]^pub_a
    int nodes123[3] = {1, 2, 3};
    Big lamt[3];
    lagrange(nodes123, T, lamt);
    ECP Ca;
    ECP_copy(&Ca, &g1);
    for (size_t i = 0; i < T; i++) {
        ECP_copy(&t1, &C[i]);
        PAIR_G1mul(&t1, lamt[i].v);
        ECP_add(&Ca, &t1);
    }
    for (size_t ii = 0; ii < 2; ii++) {
        ECP_copy(&t1, &h[Pub[ii]]);
        PAIR_G1mul(&t1, attr[Pub[ii]].v);
        ECP_add(&Ca, &t1);
    }
    BIG e;
    rand_zp(e, &rng);
    BIG ge, gei;
    zp_add(ge, gamma, e);
    zp_inv(gei, ge);
    ECP A;
    ECP_copy(&A, &Ca);
    PAIR_G1mul(&A, gei);

    Big esh_coef[T - 1];
    for (size_t i = 0; i < T - 1; i++) rand_zp(esh_coef[i].v, &rng);
    Big e_share[NP];
    for (size_t k = 0; k < NP; k++) {
        BIG acc;
        BIG_copy(acc, e);
        unsigned long long xp = 1;
        for (size_t i = 0; i < T - 1; i++) {
            xp *= (k + 1);
            BIG xb, term;
            BIG_zero(xb);
            BIG_inc(xb, (int)xp);
            BIG_norm(xb);
            zp_mul(term, esh_coef[i].v, xb);
            zp_add(acc, acc, term);
        }
        BIG_copy(e_share[k].v, acc);
    }
    ECP D[NP];
    for (size_t k = 0; k < NP; k++) {
        BIG ne;
        zp_neg(ne, e_share[k].v);
        ECP_copy(&D[k], &A);
        PAIR_G1mul(&D[k], ne);
        ECP_add(&D[k], &C[k]);
    }

    printf("\"cred_A\": \"%s\",\n", ser_g1(&A).c_str());
    printf("\"e_share\": [");
    for (size_t k = 0; k < NP; k++)
        printf("\"%s\"%s", ser_zp(e_share[k].v).c_str(), k + 1 < NP ? ", " : "");
    printf("],\n\"D\": [");
    for (size_t k = 0; k < NP; k++)
        printf("\"%s\"%s", ser_g1(&D[k]).c_str(), k + 1 < NP ? ", " : "");
    printf("],\n");

    // ---- make_pres_group(S={0,2,5}): nodes S[k]+1 = {1,3,6} ----
    int nodesS[3] = {1, 3, 6};
    Big lamS[3];
    lagrange(nodesS, T, lamS);
    ECP Dg;
    ECP_inf(&Dg);
    for (size_t k = 0; k < T; k++) {
        ECP_copy(&t1, &D[S[k]]);
        PAIR_G1mul(&t1, lamS[k].v);
        ECP_add(&Dg, &t1);
    }
    printf("\"group_lam\": [\"%s\", \"%s\", \"%s\"],\n",
           ser_zp(lamS[0].v).c_str(), ser_zp(lamS[1].v).c_str(),
           ser_zp(lamS[2].v).c_str());
    printf("\"group_D\": \"%s\",\n", ser_g1(&Dg).c_str());

    // ---- make_pres_type(Rev={1}, Prv={0,2}) ----
    // Pub={1,3}; Hid={0,2,3}; I_Pub_in_Rev={0}; I_Pub_in_Hid={1}
    ECP Crev, Cpub;
    ECP_copy(&Crev, &g1);
    ECP_copy(&t1, &h[Pub[0]]);
    PAIR_G1mul(&t1, attr[Pub[0]].v);
    ECP_add(&Crev, &t1);
    ECP_copy(&Cpub, &Crev);
    ECP_copy(&t1, &h[Pub[1]]);
    PAIR_G1mul(&t1, attr[Pub[1]].v);
    ECP_add(&Cpub, &t1);
    printf("\"C_rev\": \"%s\",\n", ser_g1(&Crev).c_str());
    printf("\"C_pub\": \"%s\",\n", ser_g1(&Cpub).c_str());

    // ---- cred_pres: draws r, alpha, beta_share(4), beta_share_j(3),
    //      gamma_share(3); aggregator j = 0 ----
    const size_t Hid[3] = {0, 2, 3};     // m \ Rev
    const size_t HidPub[1] = {3};        // Hid \ Prv
    BIG r_;
    rand_zp(r_, &rng);
    ECP A_;
    ECP_copy(&A_, &A);
    PAIR_G1mul(&A_, r_);
    ECP B_;
    ECP_copy(&B_, &Cpub);
    ECP_add(&B_, &Dg);
    PAIR_G1mul(&B_, r_);

    BIG alpha;
    rand_zp(alpha, &rng);
    Big beta_share[4];
    for (size_t i = 0; i < 4; i++) rand_zp(beta_share[i].v, &rng);
    Big beta_j[3];
    for (size_t i = 0; i < 3; i++) rand_zp(beta_j[i].v, &rng);
    Big gam[3];
    for (size_t i = 0; i < 3; i++) rand_zp(gam[i].v, &rng);

    // Uj = C_rev^alpha * prod h[Hid[ii]]^beta_j[ii] * A_^gam[0]
    ECP U;
    ECP_copy(&U, &Crev);
    PAIR_G1mul(&U, alpha);
    for (size_t ii = 0; ii < 3; ii++) {
        ECP_copy(&t1, &h[Hid[ii]]);
        PAIR_G1mul(&t1, beta_j[ii].v);
        ECP_add(&U, &t1);
    }
    ECP_copy(&t1, &A_);
    PAIR_G1mul(&t1, gam[0].v);
    ECP_add(&U, &t1);
    // Uk for k = 1, 2: prod h[Prv[ii]]^beta_share[(k-1)*2+ii] * A_^gam[k]
    for (size_t k = 1; k < T; k++) {
        for (size_t ii = 0; ii < 2; ii++) {
            ECP_copy(&t1, &h[Prv[ii]]);
            PAIR_G1mul(&t1, beta_share[(k - 1) * 2 + ii].v);
            ECP_add(&U, &t1);
        }
        ECP_copy(&t1, &A_);
        PAIR_G1mul(&t1, gam[k].v);
        ECP_add(&U, &t1);
    }

    // ch = hash(U, A_, B_, pub_a[I_Pub_in_Rev={0}]).to(Zp)
    BIG ch;
    {
        Hasher H;
        H.g1(&U);
        H.g1(&A_);
        H.g1(&B_);
        H.zp(attr[Pub[0]].v);
        H.to_zp(ch);
    }

    // z[ii] = beta_j[ii] + ch*r*a_share[S[0]][ii]*lam[0]
    //       + sum_{k=1,2} beta_share[(k-1)*2+ii] + ch*r*a_share[S[k]][ii]*lam[k]
    Big z[2];
    for (size_t ii = 0; ii < 2; ii++) {
        BIG acc, term, tmp;
        BIG_copy(acc, beta_j[ii].v);
        zp_mul(tmp, r_, shares[ii][S[0]].v);
        zp_mul(tmp, tmp, lamS[0].v);
        zp_mul(term, ch, tmp);
        zp_add(acc, acc, term);
        for (size_t k = 1; k < T; k++) {
            zp_add(acc, acc, beta_share[(k - 1) * 2 + ii].v);
            zp_mul(tmp, r_, shares[ii][S[k]].v);
            zp_mul(tmp, tmp, lamS[k].v);
            zp_mul(term, ch, tmp);
            zp_add(acc, acc, term);
        }
        BIG_copy(z[ii].v, acc);
    }
    // ze = sum_k gam[k] + ch*(-e_share[S[k]]*lam[k])
    BIG ze;
    BIG_zero(ze);
    for (size_t k = 0; k < T; k++) {
        BIG term, tmp, nes;
        zp_neg(nes, e_share[S[k]].v);
        zp_mul(tmp, nes, lamS[k].v);
        zp_mul(term, ch, tmp);
        zp_add(ze, ze, gam[k].v);
        zp_add(ze, ze, term);
    }
    BIG zr, tmp2;
    zp_mul(tmp2, ch, r_);
    zp_add(zr, alpha, tmp2);
    // z_hid_pub: HidPub={3}; I_Hid_in_HidPub={2} (Hid[2]=3);
    // I_Pub_in_HidPub={1} (Pub[1]=3)
    Big zhp[1];
    {
        BIG term, tmp;
        zp_mul(tmp, attr[Pub[1]].v, r_);
        zp_mul(term, ch, tmp);
        zp_add(zhp[0].v, beta_j[2].v, term);
    }

    printf("\"pres_fixed\": \"%s%s%s%s%s\",\n", ser_g1(&A_).c_str(),
           ser_g1(&B_).c_str(), ser_zp(ch).c_str(), ser_zp(zr).c_str(),
           ser_zp(ze).c_str());
    printf("\"pres_z\": [\"%s\", \"%s\"],\n", ser_zp(z[0].v).c_str(),
           ser_zp(z[1].v).c_str());
    printf("\"pres_z_hid_pub\": [\"%s\"],\n", ser_zp(zhp[0].v).c_str());

    // ---- verify_pres ----
    // C_hid = prod h[Prv[ii]]^z[ii] * prod h[HidPub[ii]]^zhp[ii]
    ECP Chid;
    ECP_inf(&Chid);
    for (size_t ii = 0; ii < 2; ii++) {
        ECP_copy(&t1, &h[Prv[ii]]);
        PAIR_G1mul(&t1, z[ii].v);
        ECP_add(&Chid, &t1);
    }
    ECP_copy(&t1, &h[HidPub[0]]);
    PAIR_G1mul(&t1, zhp[0].v);
    ECP_add(&Chid, &t1);
    // U' = B_^-ch * C_rev^zr * C_hid * A_^ze
    BIG nch;
    zp_neg(nch, ch);
    ECP Uv;
    ECP_copy(&Uv, &B_);
    PAIR_G1mul(&Uv, nch);
    ECP_copy(&t1, &Crev);
    PAIR_G1mul(&t1, zr);
    ECP_add(&Uv, &t1);
    ECP_add(&Uv, &Chid);
    ECP_copy(&t1, &A_);
    PAIR_G1mul(&t1, ze);
    ECP_add(&Uv, &t1);

    BIG ch2;
    {
        Hasher H;
        H.g1(&Uv);
        H.g1(&A_);
        H.g1(&B_);
        H.zp(attr[Pub[0]].v);
        H.to_zp(ch2);
    }
    FP12 l, rgt;
    ate(&l, &A_, &w);
    ate(&rgt, &B_, &g2);
    int ok = (BIG_comp(ch, ch2) == 0) && FP12_equals(&l, &rgt);
    printf("\"verify\": %s\n", ok ? "true" : "false");
    printf("}\n");
    return 0;
}
