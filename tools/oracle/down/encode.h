/* Minimal stand-in for huishenlab/utils encode.h (nucleotide encoding
 * tables), reconstructed from the call sites in /root/reference/src:
 * nt256int8 maps A,C,G,T->0..3 and everything else->4 (N). Test tooling
 * only. */
#ifndef ORACLE_SHIM_ENCODE_H
#define ORACLE_SHIM_ENCODE_H

#include <stdint.h>

extern const unsigned char nt256char_to_nt256int8_table[256];
extern const char nt256int8_to_nt256char_table[6];

/* reverse complement a char-sequence in place */
static inline void nt256char_rev_ip(char *s, int n) {
    int i;
    for (i = 0; i < n / 2; ++i) {
        char t = s[i]; s[i] = s[n - 1 - i]; s[n - 1 - i] = t;
    }
    for (i = 0; i < n; ++i) {
        switch (s[i]) {
        case 'A': s[i] = 'T'; break;
        case 'a': s[i] = 't'; break;
        case 'C': s[i] = 'G'; break;
        case 'c': s[i] = 'g'; break;
        case 'G': s[i] = 'C'; break;
        case 'g': s[i] = 'c'; break;
        case 'T': s[i] = 'A'; break;
        case 't': s[i] = 'a'; break;
        default: break;
        }
    }
}

#endif
