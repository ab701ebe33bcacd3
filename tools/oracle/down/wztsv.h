/* Minimal stand-in for huishenlab/utils wztsv.h (line-oriented TSV reader),
 * reconstructed from the call sites in /root/reference/src
 * (asm_pairwise.c, epiread_rectangle.c). Test tooling only — not part of
 * the biscuit_tpu framework. */
#ifndef ORACLE_SHIM_WZTSV_H
#define ORACLE_SHIM_WZTSV_H

#include <stdlib.h>
#include <string.h>
#include <zlib.h>
#include "wzmisc.h"
#include "wzbed.h"   /* shim_gz_readline */

typedef struct tsv_t {
    gzFile fh;
    char *line;       /* full current line, newline stripped */
    size_t line_cap;
    char **fields;
    int n;            /* number of fields on the current line */
} tsv_t;

static inline tsv_t *tsv_open(const char *fn) {
    tsv_t *t = (tsv_t*)calloc(1, sizeof(tsv_t));
    t->fh = (!fn || strcmp(fn, "-") == 0) ? gzdopen(0, "rb") : gzopen(fn, "rb");
    if (!t->fh) wzfatal("Cannot open file %s\n", fn ? fn : "-");
    return t;
}

static inline void tsv_free_fields(tsv_t *t) {
    free_char_array(t->fields, t->n);
    t->fields = 0; t->n = 0;
}

static inline int tsv_read(tsv_t *t) {
    tsv_free_fields(t);
    if (!shim_gz_readline(t->fh, &t->line, &t->line_cap)) return 0;
    if (t->line[0] == 0) { t->n = 0; return 1; }   /* blank line still a read */
    line_get_fields(t->line, "\t", &t->fields, &t->n);
    return 1;
}

static inline int tsv_is_blankline(tsv_t *t) {
    return t->line == 0 || t->line[0] == 0;
}

static inline char *tsv_field(tsv_t *t, int i) {
    return (i < t->n) ? t->fields[i] : 0;
}

static inline void tsv_close(tsv_t *t) {
    if (!t) return;
    tsv_free_fields(t);
    if (t->fh) gzclose(t->fh);
    free(t->line);
    free(t);
}

#endif
