"""Independent re-derivation of the genotyping statistics (VERDICT r2 #6).

pileup/stats.py and the down-oracle's stats.h shim share one re-derivation,
so byte-diffing GL/GQ/SS/SC verified that code against itself. This module
is a SECOND implementation written from the probability model alone, by a
deliberately different route:

  * full binomial log-PMF (with the C(n,k) coefficient) in probability
    space, posteriors via np.logaddexp — the coefficient cancels in every
    posterior, so agreement of the posteriors (not the raw lnliks) checks
    the MODEL, not the code transcription;
  * the somatic three-hypothesis mixture enumerated as an explicit
    normalized categorical over (tumor_gt, normal_gt) pairs restricted to
    the model's support, instead of three hand-added log terms.

Grid-diffed against pileup/stats.py over a dense parameter sweep, plus
property tests (posterior normalization, GQ monotonicity in depth, somatic
posterior limits). Reference call sites: /root/reference/src/pileup.c:393-409
(GT/GL1/GQ) and :498-517 (SS/SC).
"""
import math

import numpy as np
import pytest

from biscuit_tpu.pileup import stats

HOMOREF, HET, HOMOVAR = 0, 1, 2


# ---------------------------------------------------------------- independent
def _p_alt(genotype, error, contam):
    """Per-read alt probability under each genotype. HOMOREF reads are alt
    only through error or contamination; HET is a fair coin; HOMOVAR reads
    are ref only through error or contamination."""
    p = {HOMOREF: error + contam,
         HET: 0.5,
         HOMOVAR: 1.0 - error - contam}[genotype]
    return float(np.clip(p, 1e-12, 1 - 1e-12))


def binom_logpmf(k, n, p):
    """Full binomial log-PMF, coefficient included (stats.py omits the
    coefficient because it cancels in posterior ratios)."""
    return (math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)
            + k * math.log(p) + (n - k) * math.log1p(-p))


def genotype_posteriors_ind(cref, altsupp, error, contam, priors):
    """P(genotype | data) over the three genotypes, via logaddexp."""
    n = cref + altsupp
    lp = np.array([
        math.log(priors[g]) + binom_logpmf(altsupp, n, _p_alt(g, error, contam))
        for g in (HOMOREF, HET, HOMOVAR)])
    return np.exp(lp - np.logaddexp.reduce(lp))


def somatic_posterior_ind(cref_t, alt_t, cref_n, alt_n, error, mu,
                          mu_somatic, contam):
    """P(not somatic | data): enumerate the model's (tumor, normal) genotype
    support {somatic: (HET, HOMOREF), germline: (HET, HET),
    wildtype: (HOMOREF, HOMOREF)} as a normalized categorical."""
    support = {
        "somatic": ((HET, HOMOREF), mu_somatic),
        "germline": ((HET, HET), mu),
        "wildtype": ((HOMOREF, HOMOREF), 1.0 - mu - mu_somatic),
    }
    names, lps = [], []
    for name, ((gt, gn), prior) in support.items():
        lp = (math.log(max(prior, 1e-300))
              + binom_logpmf(alt_t, cref_t + alt_t, _p_alt(gt, error, contam))
              + binom_logpmf(alt_n, cref_n + alt_n, _p_alt(gn, error, contam)))
        names.append(name)
        lps.append(lp)
    lps = np.array(lps)
    post = np.exp(lps - np.logaddexp.reduce(lps))
    return max(1.0 - post[names.index("somatic")], 0.0)


def pval2qual_ind(p):
    return 255.0 if p <= 0.0 else max(-10.0 * math.log10(p), 0.0)


# ---------------------------------------------------------------- grid diffs
PRIORS = (0.995, 0.33, 0.17)  # shapes only matter relatively
ERRORS = [0.001, 0.01, 0.05]
CONTAMS = [0.0, 0.01, 0.1]


def production_posteriors(cref, altsupp, error, contam, priors):
    gls = [math.log(priors[g])
           + stats.genotype_lnlik(g, cref, altsupp, error, contam)
           for g in (HOMOREF, HET, HOMOVAR)]
    tot = stats.ln_sum3(*gls)
    return np.exp(np.array(gls) - tot)


@pytest.mark.parametrize("error", ERRORS)
@pytest.mark.parametrize("contam", CONTAMS)
def test_genotype_posterior_grid(error, contam):
    """Posteriors agree to 1e-9 across a dense (cref, alt) grid even though
    the two implementations use different likelihood normalizations."""
    for cref in [0, 1, 2, 5, 13, 40, 100, 400]:
        for alt in [0, 1, 2, 3, 7, 20, 60, 150]:
            a = production_posteriors(cref, alt, error, contam, PRIORS)
            b = genotype_posteriors_ind(cref, alt, error, contam, PRIORS)
            assert np.allclose(a, b, atol=1e-9), (cref, alt, a, b)


@pytest.mark.parametrize("error", ERRORS)
def test_somatic_posterior_grid(error):
    mu, mus, contam = 0.001, 0.0005, 0.01
    for ct, at_, cn, an in [(10, 0, 10, 0), (10, 5, 10, 0), (10, 5, 10, 5),
                            (30, 15, 30, 0), (30, 15, 30, 15), (5, 5, 8, 0),
                            (0, 10, 10, 0), (100, 50, 100, 1), (1, 0, 0, 1),
                            (50, 2, 50, 2), (200, 100, 200, 0)]:
        a = stats.somatic_posterior(ct, at_, cn, an, error, mu, mus, contam)
        b = somatic_posterior_ind(ct, at_, cn, an, error, mu, mus, contam)
        assert abs(a - b) < 1e-9, (ct, at_, cn, an, a, b)


def test_pval2qual_grid():
    for p in [0.0, 1e-30, 1e-10, 0.001, 0.05, 0.5, 0.999, 1.0, 2.0]:
        assert abs(stats.pval2qual(p) - pval2qual_ind(p)) < 1e-12


# ---------------------------------------------------------------- properties
def test_posterior_normalization():
    for cref, alt in [(0, 0), (3, 1), (50, 25), (7, 30)]:
        post = production_posteriors(cref, alt, 0.01, 0.02, PRIORS)
        assert abs(post.sum() - 1.0) < 1e-12


def test_gq_monotone_in_depth():
    """Data perfectly consistent with a genotype: GQ (phred of 1-posterior)
    is non-decreasing as depth scales, for all three genotypes."""
    def gq(gt, cref, alt):
        post = production_posteriors(cref, alt, 0.01, 0.0, PRIORS)
        return stats.pval2qual(1.0 - post[gt])

    last = -1.0
    for d in [2, 4, 8, 16, 32, 64]:
        q = gq(HET, d, d)
        assert q >= last - 1e-9
        last = q
    last = -1.0
    for d in [2, 4, 8, 16, 32, 64]:
        q = gq(HOMOREF, d, 0)
        assert q >= last - 1e-9
        last = q
    last = -1.0
    for d in [2, 4, 8, 16, 32, 64]:
        q = gq(HOMOVAR, 0, d)
        assert q >= last - 1e-9
        last = q


def test_somatic_limits():
    """Strong tumor-only alt support drives P(not somatic) toward 0; shared
    support drives it toward 1 (germline); no support anywhere -> ~1."""
    err, mu, mus, cont = 0.001, 0.001, 0.0005, 0.0
    assert stats.somatic_posterior(50, 50, 100, 0, err, mu, mus, cont) < 0.01
    assert stats.somatic_posterior(50, 50, 50, 50, err, mu, mus, cont) > 0.99
    assert stats.somatic_posterior(50, 0, 50, 0, err, mu, mus, cont) > 0.99


def test_lnlik_monotone_in_error_for_homref_with_alts():
    """With alt reads present under HOMOREF, a higher error rate must make
    the data MORE likely (the only way to explain the alts)."""
    l1 = stats.genotype_lnlik(HOMOREF, 20, 5, 0.001, 0.0)
    l2 = stats.genotype_lnlik(HOMOREF, 20, 5, 0.01, 0.0)
    l3 = stats.genotype_lnlik(HOMOREF, 20, 5, 0.05, 0.0)
    assert l1 < l2 < l3
