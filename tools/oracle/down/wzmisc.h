/* Minimal stand-in for huishenlab/utils wzmisc.h, reconstructed from the
 * call sites in /root/reference/src so the downstream subcommands compile
 * locally as test oracles. Test tooling only. */
#ifndef ORACLE_SHIM_WZMISC_H
#define ORACLE_SHIM_WZMISC_H

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>
#include <assert.h>

#define wzfatal(...) do { fprintf(stderr, __VA_ARGS__); fflush(stderr); exit(EXIT_FAILURE); } while (0)

#ifndef max
#define max(a, b) ((a) > (b) ? (a) : (b))
#endif
#ifndef min
#define min(a, b) ((a) < (b) ? (a) : (b))
#endif

static inline int is_number(const char *s) {
    if (!s || !*s) return 0;
    const char *p;
    for (p = s; *p; ++p)
        if (!isdigit((unsigned char)*p) && *p != '.' && *p != '-' &&
            *p != '+' && *p != 'e' && *p != 'E')
            return 0;
    return 1;
}

static inline char *strcpy_realloc(char *dst, const char *src) {
    dst = (char*)realloc(dst, strlen(src) + 1);
    strcpy(dst, src);
    return dst;
}

static inline void wzstrupr(char *s) {
    for (; *s; ++s) *s = (char)toupper((unsigned char)*s);
}

static inline FILE *wzopen_out(const char *fn) {
    if (!fn || strcmp(fn, "-") == 0) return stdout;
    FILE *f = fopen(fn, "w");
    if (!f) wzfatal("Cannot open output file %s\n", fn);
    return f;
}

/* split a line into fields by any char in `sep`; caller frees via
 * free_fields/free_char_array */
static inline void line_get_fields(const char *line, const char *sep,
                                   char ***fields, int *nfields) {
    int cap = 8, n = 0;
    char **fs = (char**)malloc(cap * sizeof(char*));
    const char *p = line, *q;
    while (1) {
        q = p;
        while (*q && !strchr(sep, *q)) ++q;
        if (n == cap) { cap <<= 1; fs = (char**)realloc(fs, cap * sizeof(char*)); }
        fs[n] = (char*)malloc(q - p + 1);
        memcpy(fs[n], p, q - p);
        fs[n][q - p] = 0;
        ++n;
        if (!*q) break;
        p = q + 1;
    }
    *fields = fs;
    *nfields = n;
}

static inline void free_char_array(char **fields, int nfields) {
    int i;
    if (!fields) return;
    for (i = 0; i < nfields; ++i) free(fields[i]);
    free(fields);
}

#define free_fields(fields, nfields) free_char_array(fields, nfields)

static inline void ensure_number(const char *s) {
    if (!is_number(s)) wzfatal("%s is not a number.\n", s ? s : "(null)");
}

static inline int strcount_char(const char *s, char c) {
    int n = 0;
    for (; *s; ++s) if (*s == c) ++n;
    return n;
}

#endif
