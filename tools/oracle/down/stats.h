/* Minimal stand-in for huishenlab/utils stats.h. The formulas here are the
 * SAME re-derivations used by biscuit_tpu/pileup/stats.py (binomial
 * allele-count likelihoods with sequencing error + contamination): the
 * external utils library is not available offline, so both the oracle and
 * the framework share this defined behavior for GL/GQ/SS/SC; everything
 * else in the pileup output byte-diffs against the unmodified reference
 * logic. Test tooling only. */
#ifndef ORACLE_SHIM_STATS_H
#define ORACLE_SHIM_STATS_H

#include <math.h>

#define HOMOREF 0
#define HET 1
#define HOMOVAR 2

static inline double genotype_lnlik(int genotype, int cref, int altsupp,
                                    double error, double contam) {
    double p_alt;
    if (genotype == HOMOREF) p_alt = error + contam;
    else if (genotype == HET) p_alt = 0.5;
    else p_alt = 1.0 - error - contam;
    if (p_alt < 1e-12) p_alt = 1e-12;
    if (p_alt > 1 - 1e-12) p_alt = 1 - 1e-12;
    return cref * log(1.0 - p_alt) + altsupp * log(p_alt);
}

static inline double ln_sum3(double a, double b, double c) {
    double m = a > b ? (a > c ? a : c) : (b > c ? b : c);
    return m + log(exp(a - m) + exp(b - m) + exp(c - m));
}

static inline double pval2qual(double p) {
    if (p <= 0.0) return 255.0;
    double q = -10.0 * log10(p);
    return q > 0.0 ? q : 0.0;
}

static inline double somatic_posterior(int cref_t, int altcnt_t, int cref_n,
                                       int altcnt_n, double error, double mu,
                                       double mu_somatic, double contam) {
    double lm = mu > 1e-300 ? mu : 1e-300;
    double lms = mu_somatic > 1e-300 ? mu_somatic : 1e-300;
    double lw = 1.0 - mu - mu_somatic;
    if (lw < 1e-300) lw = 1e-300;
    double ln_som = genotype_lnlik(HET, cref_t, altcnt_t, error, contam)
        + genotype_lnlik(HOMOREF, cref_n, altcnt_n, error, contam) + log(lms);
    double ln_germ = genotype_lnlik(HET, cref_t, altcnt_t, error, contam)
        + genotype_lnlik(HET, cref_n, altcnt_n, error, contam) + log(lm);
    double ln_wild = genotype_lnlik(HOMOREF, cref_t, altcnt_t, error, contam)
        + genotype_lnlik(HOMOREF, cref_n, altcnt_n, error, contam) + log(lw);
    double total = ln_sum3(ln_som, ln_germ, ln_wild);
    double p_not_somatic = 1.0 - exp(ln_som - total);
    return p_not_somatic > 0.0 ? p_not_somatic : 0.0;
}

static inline double shim_lchoose(double n, double k) {
    return lgamma(n + 1) - lgamma(k + 1) - lgamma(n - k + 1);
}

/* 2x2 Fisher exact test: left, right and two-sided tail p-values
 * (hypergeometric, two-sided = sum of tables at most as probable as the
 * observed one — the conventional kt_fisher_exact contract). */
static inline double fisher_exact(int n11, int n12, int n21, int n22,
                                  double *left, double *right, double *two) {
    int r1 = n11 + n12, r2 = n21 + n22;
    int c1 = n11 + n21;
    int n = r1 + r2;
    int lo = c1 - r2 > 0 ? c1 - r2 : 0;
    int hi = c1 < r1 ? c1 : r1;
    double p_obs = shim_lchoose(r1, n11) + shim_lchoose(r2, c1 - n11) - shim_lchoose(n, c1);
    double pl = 0.0, pr = 0.0, pt = 0.0;
    int k;
    for (k = lo; k <= hi; ++k) {
        double lv = shim_lchoose(r1, k) + shim_lchoose(r2, c1 - k) - shim_lchoose(n, c1);
        double v = exp(lv);
        if (k <= n11) pl += v;
        if (k >= n11) pr += v;
        if (lv <= p_obs + 1e-12) pt += v;
    }
    if (pl > 1.0) pl = 1.0;
    if (pr > 1.0) pr = 1.0;
    if (pt > 1.0) pt = 1.0;
    if (left) *left = pl;
    if (right) *right = pr;
    if (two) *two = pt;
    return pt;
}

static inline double two_by_two_chisq(double n11, double n12, double n21, double n22) {
    double n = n11 + n12 + n21 + n22;
    if (n == 0) return 0.0;
    double r1 = n11 + n12, r2 = n21 + n22;
    double c1 = n11 + n21, c2 = n12 + n22;
    if (!(r1 && r2 && c1 && c2)) return 0.0;
    double stat = 0.0;
    double e;
    e = r1 * c1 / n; stat += (n11 - e) * (n11 - e) / e;
    e = r1 * c2 / n; stat += (n12 - e) * (n12 - e) / e;
    e = r2 * c1 / n; stat += (n21 - e) * (n21 - e) / e;
    e = r2 * c2 / n; stat += (n22 - e) * (n22 - e) / e;
    return stat;
}

#endif
