/* Empty stand-in for divsufsort.h: the reference only calls divbwt() under
 * the _DIVBWT preprocessor flag, which we do not define. Test tooling only. */
#ifndef _ORACLE_DIVSUFSORT_H
#define _ORACLE_DIVSUFSORT_H
#endif
