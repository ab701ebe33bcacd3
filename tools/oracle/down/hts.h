/* Minimal htslib-API shim (hts.h surface) written from scratch against the
 * public htslib API documentation, so the reference BAM-downstream
 * subcommands (/root/reference/src) can be compiled locally as golden-output
 * TEST ORACLES without network access. Backed by zlib (BGZF is concatenated
 * gzip members, which gzread handles transparently). Test tooling only — not
 * part of the biscuit_tpu framework.
 */
#ifndef ORACLE_SHIM_HTS_H
#define ORACLE_SHIM_HTS_H

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <limits.h>
#include "kstring.h"   /* real htslib hts.h exposes kstring_t; lib/aln's copy */

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t hts_pos_t;
#define PRIhts_pos PRId64

struct shim_bgzf;          /* opaque zlib-backed stream */

typedef struct htsFile {
    struct shim_bgzf *fp;  /* input/output stream */
    char *fn;
    int is_write;
    int is_bin;            /* BAM vs SAM text */
    void *hdr_keep;        /* header captured for SAM text writing */
    struct kstring_shim { size_t l, m; char *s; } line; /* SAM text read buf */
} htsFile;
typedef htsFile samFile;

typedef struct hts_idx_t hts_idx_t;      /* defined in sam_shim.c */
typedef struct hts_itr_t hts_itr_t;

#define HTS_IDX_NOCOOR (-2)
#define HTS_IDX_START  (-3)
#define HTS_IDX_REST   (-4)
#define HTS_IDX_NONE   (-5)

htsFile *hts_open(const char *fn, const char *mode);
int hts_close(htsFile *fp);

/* Parse "chr:beg-end"; returns pointer past the reference name (the colon)
 * or NULL if there is no range part. *beg is 0-based, *end exclusive. */
const char *hts_parse_reg(const char *str, int *beg, int *end);

void hts_idx_destroy(hts_idx_t *idx);
void hts_itr_destroy(hts_itr_t *itr);

/* modBAM (MM/ML): real single-mod parser in hts_shim.c (epiread -M) */
typedef struct hts_base_mod {
    int modified_base;
    int canonical_base;
    int strand;
    int qual;
} hts_base_mod;
typedef struct hts_base_mod_state hts_base_mod_state;
#define HTS_MOD_REPORT_UNCHECKED 1

hts_base_mod_state *hts_base_mod_state_alloc(void);
void hts_base_mod_state_free(hts_base_mod_state *st);

#ifdef __cplusplus
}
#endif

#endif
