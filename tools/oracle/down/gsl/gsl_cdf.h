/* Minimal stand-in for the sgsl (GSL subset) gsl_cdf.h used by the reference
 * asm subcommand: only gsl_cdf_chisq_Q with nu=1 is called
 * (/root/reference/src/asm_pairwise.c:78). Survival function of chi-square
 * with 1 df = erfc(sqrt(x/2)) — the same formula as
 * biscuit_tpu/pileup/stats.py:chisq_sf_1df. Test tooling only. */
#ifndef ORACLE_SHIM_GSL_CDF_H
#define ORACLE_SHIM_GSL_CDF_H

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

static inline double gsl_cdf_chisq_Q(double x, double nu) {
    if (nu != 1.0) {
        fprintf(stderr, "[shim] gsl_cdf_chisq_Q only supports nu=1\n");
        exit(1);
    }
    if (x <= 0) return 1.0;
    return erfc(sqrt(x / 2.0));
}

#endif
