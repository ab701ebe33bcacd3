/* Minimal stand-in for huishenlab/utils wzbed.h (streaming BED reader with
 * a grow-on-demand chromosome name table), reconstructed from the call
 * sites in /root/reference/src (mergecg.c, vcf2bed.c). Test tooling only —
 * not part of the biscuit_tpu framework. */
#ifndef ORACLE_SHIM_WZBED_H
#define ORACLE_SHIM_WZBED_H

#include <stdint.h>
#include <inttypes.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>
#include "wzmisc.h"

/* ---- chromosome-name <-> tid table shared by wzbed and wzvcf ---- */
typedef struct target_v {
    int n, cap;
    char **names;
} target_v;

static inline target_v *init_target_v(int cap) {
    target_v *t = (target_v*)calloc(1, sizeof(target_v));
    t->cap = cap > 0 ? cap : 4;
    t->names = (char**)malloc(t->cap * sizeof(char*));
    return t;
}

static inline void free_target_v(target_v *t) {
    int i;
    if (!t) return;
    for (i = 0; i < t->n; ++i) free(t->names[i]);
    free(t->names); free(t);
}

static inline int locate_or_insert_target(target_v *t, const char *name) {
    int i;
    for (i = 0; i < t->n; ++i)
        if (strcmp(t->names[i], name) == 0) return i;
    if (t->n == t->cap) {
        t->cap <<= 1;
        t->names = (char**)realloc(t->names, t->cap * sizeof(char*));
    }
    t->names[t->n] = strdup(name);
    return t->n++;
}

static inline char *target_name(target_v *t, int64_t tid) { return t->names[tid]; }
#define tid2name(targets, tid) target_name((targets), (tid))

/* ---- bed record ---- */
typedef struct bed1_t {
    int64_t tid;
    int64_t beg, end;
    void *data;
} bed1_t;

typedef void (*init_data_f)(bed1_t *b, void *aux_data);
typedef void (*free_data_f)(void *data);
typedef void (*parse_data_f)(bed1_t *b, char **fields, int nfields);

static inline bed1_t *init_bed1(init_data_f init_data, void *aux_data) {
    bed1_t *b = (bed1_t*)calloc(1, sizeof(bed1_t));
    b->tid = -1;
    if (init_data) init_data(b, aux_data);
    return b;
}

static inline void free_bed1(bed1_t *b, free_data_f free_data) {
    if (!b) return;
    if (free_data && b->data) free_data(b->data);
    else free(b->data);
    free(b);
}

/* ---- bed file ---- */
typedef struct bed_file_t {
    gzFile fh;
    char *line;           /* current raw line */
    size_t line_cap;
    target_v *targets;
} bed_file_t;

static inline bed_file_t *init_bed_file(const char *fn) {
    bed_file_t *bed = (bed_file_t*)calloc(1, sizeof(bed_file_t));
    bed->fh = (strcmp(fn, "-") == 0) ? gzdopen(0, "rb") : gzopen(fn, "rb");
    if (!bed->fh) wzfatal("Cannot open bed file %s\n", fn);
    bed->targets = init_target_v(4);
    return bed;
}

static inline void free_bed_file(bed_file_t *bed) {
    if (!bed) return;
    if (bed->fh) gzclose(bed->fh);
    free(bed->line);
    free_target_v(bed->targets);
    free(bed);
}

static inline int shim_gz_readline(gzFile fh, char **line, size_t *cap) {
    size_t len = 0;
    int c;
    if (*cap == 0) { *cap = 256; *line = (char*)malloc(*cap); }
    while ((c = gzgetc(fh)) >= 0) {
        if (c == '\n') { (*line)[len] = 0; return 1; }
        if (len + 2 > *cap) { *cap <<= 1; *line = (char*)realloc(*line, *cap); }
        (*line)[len++] = (char)c;
    }
    (*line)[len] = 0;
    return len > 0;           /* final unterminated line still counts */
}

/* Read one record: sets tid/beg/end from the first three columns, then
 * hands ALL fields (chrm included, index 0) to parse_data. Returns 1 on
 * success, 0 at EOF. Blank lines are skipped. */
static inline int bed_read1(bed_file_t *bed, bed1_t *b, parse_data_f parse_data) {
    for (;;) {
        if (!shim_gz_readline(bed->fh, &bed->line, &bed->line_cap)) return 0;
        if (bed->line[0] == 0) continue;
        char **fields; int nfields;
        line_get_fields(bed->line, "\t", &fields, &nfields);
        if (nfields < 3) { free_char_array(fields, nfields); continue; }
        b->tid = locate_or_insert_target(bed->targets, fields[0]);
        b->beg = atoll(fields[1]);
        b->end = atoll(fields[2]);
        if (parse_data) parse_data(b, fields, nfields);
        free_char_array(fields, nfields);
        return 1;
    }
}

#endif
