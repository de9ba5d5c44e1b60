// Oracle for the Shamir-secret-sharing flow
// (examples/shamir-secret-sharing/test.cpp: seed "seed", 4-of-6, subset
// {1,3,4,6}): wrapper algorithm + draw order from src/sss.cpp:6-21.
#include "oracle_util.hpp"

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t T = 4, N = 6;

    // secret = select_in<Zp> (test.cpp draws it before share())
    BIG secret;
    rand_zp(secret, &rng);

    // share(): a = select_in<Zp>(t-1)
    BIG a[T - 1];
    for (size_t i = 0; i < T - 1; i++) rand_zp(a[i], &rng);

    // shares_x = s + sum a[i] * x^(i+1), x in 1..6
    BIG shares[N];
    for (size_t xi = 1; xi <= N; xi++) {
        BIG acc;
        BIG_copy(acc, secret);
        unsigned long long xp = 1;
        for (size_t i = 0; i < T - 1; i++) {
            xp *= xi;                     // x^(i+1), exact for x<=6, i<=2
            BIG xb, term;
            BIG_zero(xb);
            BIG_inc(xb, (int)xp);
            BIG_norm(xb);
            zp_mul(term, a[i], xb);
            zp_add(acc, acc, term);
        }
        BIG_copy(shares[xi - 1], acc);
    }

    printf("{\n");
    printf("\"secret\": \"%s\",\n", ser_zp(secret).c_str());
    printf("\"shares\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_zp(shares[i]).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // reconstruct with indexes {1,3,4,6}
    size_t idx[T] = {1, 3, 4, 6};
    BIG rec;
    BIG_zero(rec);
    for (size_t i = 0; i < T; i++) {
        BIG lam;
        BIG_zero(lam);
        BIG_inc(lam, 1);
        BIG_norm(lam);
        for (size_t j = 0; j < T; j++) {
            if (j == i) continue;
            BIG xi_b, xj_b, num, den, deninv, fac;
            BIG_zero(xi_b); BIG_inc(xi_b, (int)idx[i]); BIG_norm(xi_b);
            BIG_zero(xj_b); BIG_inc(xj_b, (int)idx[j]); BIG_norm(xj_b);
            zp_neg(num, xj_b);
            zp_sub(den, xi_b, xj_b);
            zp_inv(deninv, den);
            zp_mul(fac, num, deninv);
            zp_mul(lam, lam, fac);
        }
        BIG term;
        zp_mul(term, shares[idx[i] - 1], lam);
        zp_add(rec, rec, term);
    }
    printf("\"reconstructed\": \"%s\",\n", ser_zp(rec).c_str());
    printf("\"match\": %s\n", BIG_comp(rec, secret) == 0 ? "true" : "false");
    printf("}\n");
    return 0;
}
