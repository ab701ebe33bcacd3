/* Minimal stand-in for huishenlab/utils wzmisc.h, written from scratch so the
 * reference aligner core (/root/reference/lib/aln) can be compiled locally as a
 * golden-output TEST ORACLE without network access. Only the symbols actually
 * referenced by lib/aln are provided. This header is test tooling, not part of
 * the biscuit_tpu framework. */
#ifndef _WZMISC_H
#define _WZMISC_H

#include <stdio.h>
#include <stdlib.h>

#define wzfatal(...) do { fprintf(stderr, __VA_ARGS__); fflush(stderr); exit(EXIT_FAILURE); } while (0)

#define min(a, b) ({ __typeof__(a) _wz_a = (a); __typeof__(b) _wz_b = (b); _wz_a < _wz_b ? _wz_a : _wz_b; })
#define max(a, b) ({ __typeof__(a) _wz_a = (a); __typeof__(b) _wz_b = (b); _wz_a > _wz_b ? _wz_a : _wz_b; })

#endif
