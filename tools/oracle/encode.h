/* Empty stand-in for huishenlab/utils encode.h (only referenced from a
 * commented-out call in the reference's bntseq.c). Test tooling only. */
#ifndef _WZ_ENCODE_H
#define _WZ_ENCODE_H
#endif
