/* Minimal ksprintf/kvsprintf implementation (normally supplied by the
 * external utils library) so the reference aligner core links as a local test
 * oracle. Written from scratch against the kstring.h declaration. Test tooling
 * only — not part of the biscuit_tpu framework. */
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include "kstring.h"

int kvsprintf(kstring_t *s, const char *fmt, va_list ap) {
    va_list ap2;
    va_copy(ap2, ap);
    int l = vsnprintf(s->s ? s->s + s->l : NULL, s->s ? s->m - s->l : 0, fmt, ap);
    if (l + 1 > (int)(s->m - s->l) || s->s == NULL) {
        s->m = s->l + l + 2;
        kroundup32(s->m);
        s->s = (char *)realloc(s->s, s->m);
        l = vsnprintf(s->s + s->l, s->m - s->l, fmt, ap2);
    }
    va_end(ap2);
    s->l += l;
    return l;
}

int ksprintf(kstring_t *s, const char *fmt, ...) {
    va_list ap;
    va_start(ap, fmt);
    int l = kvsprintf(s, fmt, ap);
    va_end(ap);
    return l;
}
