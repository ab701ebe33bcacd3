/* Minimal htslib-API shim (faidx.h surface), written from scratch for the
 * local downstream test oracle. Loads the whole FASTA into memory (test
 * genomes are small); coordinates follow the htslib contract (0-based,
 * inclusive, end clamped). Test tooling only. */
#ifndef ORACLE_SHIM_FAIDX_H
#define ORACLE_SHIM_FAIDX_H

#ifdef __cplusplus
extern "C" {
#endif

typedef struct faidx_t faidx_t;

faidx_t *fai_load(const char *fn);
void fai_destroy(faidx_t *fai);
char *faidx_fetch_seq(const faidx_t *fai, const char *c_name, int p_beg_i, int p_end_i, int *len);
char *fai_fetch(const faidx_t *fai, const char *reg, int *len);
int faidx_seq_len(const faidx_t *fai, const char *seq);
int faidx_has_seq(const faidx_t *fai, const char *seq);
int faidx_nseq(const faidx_t *fai);
const char *faidx_iseq(const faidx_t *fai, int i);

#ifdef __cplusplus
}
#endif

#endif
