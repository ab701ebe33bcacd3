/* Minimal htslib-API shim (sam.h surface) written from scratch against the
 * public htslib API documentation + the BAM format spec, so the reference
 * BAM-downstream subcommands can be compiled locally as golden-output TEST
 * ORACLES without network access. Test tooling only — not part of the
 * biscuit_tpu framework. */
#ifndef ORACLE_SHIM_SAM_H
#define ORACLE_SHIM_SAM_H

#include "hts.h"

#ifdef __cplusplus
extern "C" {
#endif

/* ---- header ---- */
typedef struct bam_hdr_t {
    int32_t n_targets;
    char **target_name;
    uint32_t *target_len;
    uint32_t l_text;
    char *text;
} bam_hdr_t;
typedef bam_hdr_t sam_hdr_t;

/* ---- alignment record (BAM spec field set) ---- */
typedef struct bam1_core_t {
    hts_pos_t pos;
    int32_t tid;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_extranul;
    uint16_t flag;
    uint16_t l_qname;
    uint32_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    hts_pos_t mpos;
    hts_pos_t isize;
} bam1_core_t;

typedef struct bam1_t {
    bam1_core_t core;
    uint64_t id;
    uint8_t *data;   /* qname-cigar-seq-qual-aux, BAM layout */
    int l_data;
    uint32_t m_data;
} bam1_t;

/* flags */
#define BAM_FPAIRED        1
#define BAM_FPROPER_PAIR   2
#define BAM_FUNMAP         4
#define BAM_FMUNMAP        8
#define BAM_FREVERSE      16
#define BAM_FMREVERSE     32
#define BAM_FREAD1        64
#define BAM_FREAD2       128
#define BAM_FSECONDARY   256
#define BAM_FQCFAIL      512
#define BAM_FDUP        1024
#define BAM_FSUPPLEMENTARY 2048

/* CIGAR */
#define BAM_CMATCH      0
#define BAM_CINS        1
#define BAM_CDEL        2
#define BAM_CREF_SKIP   3
#define BAM_CSOFT_CLIP  4
#define BAM_CHARD_CLIP  5
#define BAM_CPAD        6
#define BAM_CEQUAL      7
#define BAM_CDIFF       8
#define BAM_CBACK       9

#define BAM_CIGAR_STR   "MIDNSHP=XB"
#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK  0xf
#define bam_cigar_op(c) ((c) & BAM_CIGAR_MASK)
#define bam_cigar_oplen(c) ((c) >> BAM_CIGAR_SHIFT)
#define bam_cigar_opchr(c) (BAM_CIGAR_STR "??????" [bam_cigar_op(c)])
#define bam_cigar_gen(l, o) ((l) << BAM_CIGAR_SHIFT | (o))
/* bit 1: consumes query; bit 2: consumes reference */
#define bam_cigar_type(o) (0x3C1A7 >> ((o) << 1) & 3)

extern const int8_t bam_cigar_table[256];
extern const char seq_nt16_str[];
extern const unsigned char seq_nt16_table[256];

#define bam_is_rev(b)  (((b)->core.flag & BAM_FREVERSE) != 0)
#define bam_is_mrev(b) (((b)->core.flag & BAM_FMREVERSE) != 0)
#define bam_get_qname(b) ((char*)(b)->data)
#define bam_get_cigar(b) ((uint32_t*)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname)
#define bam_get_qual(b)  ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1))
#define bam_get_aux(b)   ((b)->data + ((b)->core.n_cigar<<2) + (b)->core.l_qname + (((b)->core.l_qseq + 1)>>1) + (b)->core.l_qseq)
#define bam_get_l_aux(b) ((b)->l_data - ((b)->core.n_cigar<<2) - (b)->core.l_qname - (b)->core.l_qseq - (((b)->core.l_qseq + 1)>>1))
#define bam_seqi(s, i)   ((s)[(i)>>1] >> ((~(i)&1)<<2) & 0xf)

bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
void bam_hdr_destroy(bam_hdr_t *h);
#define sam_hdr_destroy bam_hdr_destroy

bam_hdr_t *sam_hdr_read(samFile *fp);
int sam_hdr_write(samFile *fp, const bam_hdr_t *h);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);
int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b);

#define sam_open(fn, mode) hts_open((fn), (mode))
#define sam_close(fp) hts_close(fp)

int bam_name2id(bam_hdr_t *h, const char *ref);
hts_pos_t bam_endpos(const bam1_t *b);
hts_pos_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar);
hts_pos_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar);

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]);
int64_t bam_aux2i(const uint8_t *s);
double bam_aux2f(const uint8_t *s);
char *bam_aux2Z(const uint8_t *s);
char bam_aux2A(const uint8_t *s);
int bam_aux_append(bam1_t *b, const char tag[2], char type, int len, const uint8_t *data);
int bam_aux_del(bam1_t *b, uint8_t *s);

/* format one record as SAM text appended to a kstring (kstring.h from the
 * reference lib/aln include path) */
struct __kstring_t;
int sam_format1(const bam_hdr_t *h, const bam1_t *b, struct __kstring_t *str);

/* region iterators (linear-scan implementation over sorted BAM) */
hts_idx_t *sam_index_load(samFile *fp, const char *fn);
hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, hts_pos_t beg, hts_pos_t end);
int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b);

/* modBAM minimal surface (used only by `epiread -u`) */
int bam_parse_basemod2(const bam1_t *b, hts_base_mod_state *st, uint32_t flags);
int bam_mods_at_next_pos(const bam1_t *b, hts_base_mod_state *st, hts_base_mod *mods, int n_mods);
int *bam_mods_recorded(hts_base_mod_state *st, int *n_mods);
int bam_mods_queryi(hts_base_mod_state *st, int i, int *strand, int *implicit, char *canonical);

#ifdef __cplusplus
}
#endif

#endif
