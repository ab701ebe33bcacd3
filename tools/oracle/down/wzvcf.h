/* Minimal stand-in for huishenlab/utils wzvcf.h (streaming VCF reader with
 * sample-column indexing), reconstructed from the call sites in
 * /root/reference/src/vcf2bed.c. Test tooling only — not part of the
 * biscuit_tpu framework. */
#ifndef ORACLE_SHIM_WZVCF_H
#define ORACLE_SHIM_WZVCF_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>
#include "wzmisc.h"
#include "wzbed.h"   /* target_v + shim_gz_readline + line_get_fields */

typedef struct vcf_file_t {
    gzFile fh;
    char *line;            /* current raw data line (for error messages) */
    size_t line_cap;
    target_v *targets;
    char **samples;        /* all samples from the #CHROM line */
    int n_samples;
    int *tsample_indices;  /* target samples selected by index_vcf_samples */
    int n_tsamples;
} vcf_file_t;

typedef struct vcf_record_t {
    int64_t tid;
    int64_t pos;           /* 1-based, as in the VCF text */
    char *ref;
    char *alt;
    char *info;
    char *fmt;             /* "FORMAT\tsample1\t...\tsampleN" tail of the line */
} vcf_record_t;

static inline vcf_file_t *init_vcf_file(const char *fn) {
    vcf_file_t *vcf = (vcf_file_t*)calloc(1, sizeof(vcf_file_t));
    vcf->fh = (strcmp(fn, "-") == 0) ? gzdopen(0, "rb") : gzopen(fn, "rb");
    if (!vcf->fh) wzfatal("Cannot open VCF file %s\n", fn);
    vcf->targets = init_target_v(4);
    /* consume the header; remember the sample names from #CHROM */
    for (;;) {
        long mark = gztell(vcf->fh);
        if (!shim_gz_readline(vcf->fh, &vcf->line, &vcf->line_cap)) break;
        if (vcf->line[0] == '#') {
            if (strncmp(vcf->line, "#CHROM", 6) == 0) {
                char **fields; int nfields;
                line_get_fields(vcf->line, "\t", &fields, &nfields);
                int i;
                for (i = 9; i < nfields; ++i) {
                    vcf->samples = (char**)realloc(vcf->samples, (vcf->n_samples + 1) * sizeof(char*));
                    vcf->samples[vcf->n_samples++] = strdup(fields[i]);
                }
                free_char_array(fields, nfields);
            }
            continue;
        }
        /* first data line: rewind so vcf_read_record sees it */
        gzseek(vcf->fh, mark, SEEK_SET);
        break;
    }
    return vcf;
}

static inline void index_vcf_samples(vcf_file_t *vcf, const char *target_samples) {
    int i;
    free(vcf->tsample_indices);
    vcf->tsample_indices = 0; vcf->n_tsamples = 0;
    if (strcmp(target_samples, "ALL") == 0) {
        vcf->n_tsamples = vcf->n_samples;
        vcf->tsample_indices = (int*)malloc(vcf->n_samples * sizeof(int));
        for (i = 0; i < vcf->n_samples; ++i) vcf->tsample_indices[i] = i;
    } else if (strcmp(target_samples, "FIRST") == 0) {
        if (vcf->n_samples > 0) {
            vcf->n_tsamples = 1;
            vcf->tsample_indices = (int*)malloc(sizeof(int));
            vcf->tsample_indices[0] = 0;
        }
    } else if (strcmp(target_samples, "LAST") == 0) {
        if (vcf->n_samples > 0) {
            vcf->n_tsamples = 1;
            vcf->tsample_indices = (int*)malloc(sizeof(int));
            vcf->tsample_indices[0] = vcf->n_samples - 1;
        }
    } else {
        char **names; int n_names;
        line_get_fields(target_samples, ",", &names, &n_names);
        vcf->tsample_indices = (int*)malloc(n_names * sizeof(int));
        for (i = 0; i < n_names; ++i) {
            int j, found = -1;
            for (j = 0; j < vcf->n_samples; ++j)
                if (strcmp(vcf->samples[j], names[i]) == 0) { found = j; break; }
            if (found < 0) wzfatal("Sample %s not found in VCF.\n", names[i]);
            vcf->tsample_indices[vcf->n_tsamples++] = found;
        }
        free_char_array(names, n_names);
    }
}

static inline vcf_record_t *init_vcf_record(void) {
    return (vcf_record_t*)calloc(1, sizeof(vcf_record_t));
}

static inline void free_vcf_record(vcf_record_t *rec) {
    if (!rec) return;
    free(rec->ref); free(rec->alt); free(rec->info); free(rec->fmt);
    free(rec);
}

/* returns 1 and fills rec on success, 0 at EOF */
static inline int vcf_read_record(vcf_file_t *vcf, vcf_record_t *rec) {
    for (;;) {
        if (!shim_gz_readline(vcf->fh, &vcf->line, &vcf->line_cap)) return 0;
        if (vcf->line[0] == 0 || vcf->line[0] == '#') continue;
        char **fields; int nfields;
        line_get_fields(vcf->line, "\t", &fields, &nfields);
        if (nfields < 8) { free_char_array(fields, nfields); continue; }
        rec->tid = locate_or_insert_target(vcf->targets, fields[0]);
        rec->pos = atoll(fields[1]);
        free(rec->ref); rec->ref = strdup(fields[3]);
        free(rec->alt); rec->alt = strdup(fields[4]);
        free(rec->info); rec->info = strdup(fields[7]);
        free(rec->fmt); rec->fmt = 0;
        if (nfields > 8) {
            size_t tot = 0;
            int i;
            for (i = 8; i < nfields; ++i) tot += strlen(fields[i]) + 1;
            rec->fmt = (char*)malloc(tot);
            char *p = rec->fmt;
            for (i = 8; i < nfields; ++i) {
                size_t l = strlen(fields[i]);
                memcpy(p, fields[i], l); p += l;
                *p++ = (i + 1 < nfields) ? '\t' : 0;
            }
        }
        free_char_array(fields, nfields);
        return 1;
    }
}

/* INFO "KEY=value" lookup; returns a malloc'd copy of value, or NULL */
static inline char *get_vcf_record_info(const char *key, const char *info) {
    if (!info) return 0;
    size_t kl = strlen(key);
    const char *p = info;
    while (*p) {
        const char *e = p;
        while (*e && *e != ';') ++e;
        if ((size_t)(e - p) > kl && strncmp(p, key, kl) == 0 && p[kl] == '=') {
            char *v = (char*)malloc(e - p - kl);
            memcpy(v, p + kl + 1, e - p - kl - 1);
            v[e - p - kl - 1] = 0;
            return v;
        }
        p = *e ? e + 1 : e;
    }
    return 0;
}

/* FORMAT lookup: per-target-sample values for `key`. On key miss sets
 * (*afields, *n) = (NULL, 0). Caller frees with free_char_array. */
static inline void get_vcf_record_fmt(const char *key, const char *fmt,
                                      vcf_file_t *vcf, char ***afields, int *n) {
    *afields = 0; *n = 0;
    if (!fmt) return;
    char **cols; int ncols;
    line_get_fields(fmt, "\t", &cols, &ncols);
    if (ncols < 1) { free_char_array(cols, ncols); return; }
    /* find key position in the colon-separated FORMAT column */
    char **keys; int nkeys;
    line_get_fields(cols[0], ":", &keys, &nkeys);
    int ki = -1, i;
    for (i = 0; i < nkeys; ++i)
        if (strcmp(keys[i], key) == 0) { ki = i; break; }
    free_char_array(keys, nkeys);
    if (ki < 0) { free_char_array(cols, ncols); return; }
    char **out = (char**)malloc((vcf->n_tsamples ? vcf->n_tsamples : 1) * sizeof(char*));
    int nout = 0;
    for (i = 0; i < vcf->n_tsamples; ++i) {
        int si = vcf->tsample_indices[i] + 1;  /* sample columns follow FORMAT */
        if (si >= ncols) { out[nout++] = strdup("."); continue; }
        char **vals; int nvals;
        line_get_fields(cols[si], ":", &vals, &nvals);
        out[nout++] = (ki < nvals) ? strdup(vals[ki]) : strdup(".");
        free_char_array(vals, nvals);
    }
    free_char_array(cols, ncols);
    *afields = out; *n = nout;
}

static inline void free_vcf_file(vcf_file_t *vcf) {
    int i;
    if (!vcf) return;
    if (vcf->fh) gzclose(vcf->fh);
    free(vcf->line);
    free_target_v(vcf->targets);
    for (i = 0; i < vcf->n_samples; ++i) free(vcf->samples[i]);
    free(vcf->samples);
    free(vcf->tsample_indices);
    free(vcf);
}

#endif
