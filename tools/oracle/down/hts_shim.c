/* Implementation of the minimal htslib-API shim (hts.h/sam.h/faidx.h in this
 * directory): BAM reading via zlib (BGZF = concatenated gzip members, which
 * gzread crosses transparently), SAM text writing, aux-tag access, and
 * linear-scan region iterators over coordinate-sorted BAMs. Written from
 * scratch against the public BAM/SAM format specification purely as test
 * tooling for the downstream parity oracle. */
#include <zlib.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <ctype.h>
#include <inttypes.h>
#include "hts.h"
#include "sam.h"
#include "faidx.h"

/* ------------------------------------------------------------------ */
/* tables                                                              */

const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";
const unsigned char seq_nt16_table[256] = {
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    1, 2, 4, 8, 15,15,15,15, 15,15,15,15, 15, 0 /*=*/,15,15,
    15, 1,14, 2, 13,15,15, 4, 11,15,15,12, 15, 3,15,15,
    15,15, 5, 6,  8,15, 7, 9, 15,10,15,15, 15,15,15,15,
    15, 1,14, 2, 13,15,15, 4, 11,15,15,12, 15, 3,15,15,
    15,15, 5, 6,  8,15, 7, 9, 15,10,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15,
    15,15,15,15, 15,15,15,15, 15,15,15,15, 15,15,15,15
};

const int8_t bam_cigar_table[256] = {
    /* 0..63 */
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,BAM_CEQUAL,-1,-1,
    /* 64..127: B D H I M N P S X */
    -1,-1,BAM_CBACK,-1, BAM_CDEL,-1,-1,-1, BAM_CHARD_CLIP,BAM_CINS,-1,-1,
    -1,BAM_CMATCH,BAM_CREF_SKIP,-1,
    BAM_CPAD,-1,-1,BAM_CSOFT_CLIP, -1,-1,-1,-1, BAM_CDIFF,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    /* 128..255 */
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1,
    -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1, -1,-1,-1,-1
};

/* ---- encode.h tables: A,C,G,T -> 0..3, everything else -> 4 (N) ---- */
#include "encode.h"

static unsigned char nt256_build(int c) {
    switch (c) {
    case 'A': case 'a': return 0;
    case 'C': case 'c': return 1;
    case 'G': case 'g': return 2;
    case 'T': case 't': return 3;
    default: return 4;
    }
}

const unsigned char nt256char_to_nt256int8_table[256] = {
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,
    /* @ A B C D E F G */ 4,0,4,1,4,4,4,2,
    /* H I J K L M N O */ 4,4,4,4,4,4,4,4,
    /* P Q R S T U V W */ 4,4,4,4,3,4,4,4,
    /* X Y Z [ \ ] ^ _ */ 4,4,4,4,4,4,4,4,
    /* ` a b c d e f g */ 4,0,4,1,4,4,4,2,
    /* h i j k l m n o */ 4,4,4,4,4,4,4,4,
    /* p q r s t u v w */ 4,4,4,4,3,4,4,4,
    /* x y z { | } ~   */ 4,4,4,4,4,4,4,4,
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,
    4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4, 4,4,4,4,4,4,4,4,4,4,4,4,4,4,4,4
};

const char nt256int8_to_nt256char_table[6] = "ACGTN";

/* ------------------------------------------------------------------ */
/* stream                                                              */

struct shim_bgzf {
    gzFile gz;      /* read side */
    FILE *out;      /* write side (SAM text) */
};

htsFile *hts_open(const char *fn, const char *mode) {
    htsFile *fp = (htsFile*)calloc(1, sizeof(htsFile));
    fp->fn = strdup(fn);
    fp->fp = (struct shim_bgzf*)calloc(1, sizeof(struct shim_bgzf));
    if (strchr(mode, 'w')) {
        fp->is_write = 1;
        fp->is_bin = 0; /* always SAM text out; tests route output via '-' */
        fp->fp->out = (strcmp(fn, "-") == 0) ? stdout : fopen(fn, "w");
        if (!fp->fp->out) { free(fp->fn); free(fp->fp); free(fp); return 0; }
        return fp;
    }
    fp->fp->gz = (strcmp(fn, "-") == 0) ? gzdopen(0, "rb") : gzopen(fn, "rb");
    if (!fp->fp->gz) { free(fp->fn); free(fp->fp); free(fp); return 0; }
    char magic[4];
    if (gzread(fp->fp->gz, magic, 4) == 4 && memcmp(magic, "BAM\1", 4) == 0) {
        fp->is_bin = 1;
    } else {
        fprintf(stderr, "[shim] %s: not a BAM file (SAM text input unsupported)\n", fn);
        exit(1);
    }
    return fp;
}

int hts_close(htsFile *fp) {
    if (!fp) return 0;
    if (fp->fp) {
        if (fp->fp->gz) gzclose(fp->fp->gz);
        if (fp->fp->out && fp->fp->out != stdout) fclose(fp->fp->out);
        else if (fp->fp->out) fflush(fp->fp->out);
        free(fp->fp);
    }
    free(fp->fn);
    free(fp->line.s);
    free(fp);
    return 0;
}

const char *hts_parse_reg(const char *str, int *beg, int *end) {
    const char *colon = strrchr(str, ':');
    *beg = 0; *end = INT_MAX;
    if (!colon) return 0;
    const char *p = colon + 1;
    if (!isdigit((unsigned char)*p) && *p != ',') return 0;
    long b = 0, e = (long)INT_MAX;
    char *q;
    /* strip commas by manual parse */
    b = 0;
    while (isdigit((unsigned char)*p) || *p == ',') {
        if (*p != ',') b = b * 10 + (*p - '0');
        ++p;
    }
    if (*p == '-') {
        ++p;
        e = 0;
        while (isdigit((unsigned char)*p) || *p == ',') {
            if (*p != ',') e = e * 10 + (*p - '0');
            ++p;
        }
    } else if (*p == 0) {
        e = b; /* single point */
    } else return 0;
    (void)q;
    *beg = (int)(b > 0 ? b - 1 : 0);
    *end = (int)e;
    return colon;
}

/* ------------------------------------------------------------------ */
/* records                                                             */

bam1_t *bam_init1(void) { return (bam1_t*)calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) { if (b) { free(b->data); free(b); } }
void bam_hdr_destroy(bam_hdr_t *h) {
    if (!h) return;
    int i;
    for (i = 0; i < h->n_targets; ++i) free(h->target_name[i]);
    free(h->target_name); free(h->target_len); free(h->text); free(h);
}

static int gz_read_full(gzFile gz, void *buf, int n) {
    int got = gzread(gz, buf, n);
    return got;
}

bam_hdr_t *sam_hdr_read(samFile *fp) {
    /* magic already consumed in hts_open */
    bam_hdr_t *h = (bam_hdr_t*)calloc(1, sizeof(bam_hdr_t));
    int32_t l_text = 0, n_targets = 0;
    if (gz_read_full(fp->fp->gz, &l_text, 4) != 4) { free(h); return 0; }
    h->l_text = l_text;
    h->text = (char*)malloc(l_text + 1);
    if (l_text && gz_read_full(fp->fp->gz, h->text, l_text) != l_text) { free(h->text); free(h); return 0; }
    h->text[l_text] = 0;
    if (gz_read_full(fp->fp->gz, &n_targets, 4) != 4) { free(h->text); free(h); return 0; }
    h->n_targets = n_targets;
    h->target_name = (char**)calloc(n_targets ? n_targets : 1, sizeof(char*));
    h->target_len = (uint32_t*)calloc(n_targets ? n_targets : 1, 4);
    int i;
    for (i = 0; i < n_targets; ++i) {
        int32_t l_name = 0;
        gz_read_full(fp->fp->gz, &l_name, 4);
        h->target_name[i] = (char*)malloc(l_name);
        gz_read_full(fp->fp->gz, h->target_name[i], l_name);
        gz_read_full(fp->fp->gz, &h->target_len[i], 4);
    }
    return h;
}

int bam_name2id(bam_hdr_t *h, const char *ref) {
    int i;
    for (i = 0; i < h->n_targets; ++i)
        if (strcmp(h->target_name[i], ref) == 0) return i;
    return -1;
}

int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b) {
    (void)h;
    int32_t block_len = 0;
    int got = gzread(fp->fp->gz, &block_len, 4);
    if (got == 0) return -1;            /* clean EOF */
    if (got != 4 || block_len < 32) return -2;
    if ((uint32_t)block_len + 32 > b->m_data) {
        b->m_data = block_len + 32;
        b->data = (uint8_t*)realloc(b->data, b->m_data);
    }
    uint8_t fixed[32];
    if (gz_read_full(fp->fp->gz, fixed, 32) != 32) return -2;
    memcpy(&b->core.tid, fixed + 0, 4);
    int32_t pos; memcpy(&pos, fixed + 4, 4); b->core.pos = pos;
    uint32_t bmn; memcpy(&bmn, fixed + 8, 4);
    b->core.l_qname = bmn & 0xff;
    b->core.qual = (bmn >> 8) & 0xff;
    b->core.bin = bmn >> 16;
    uint32_t fn; memcpy(&fn, fixed + 12, 4);
    b->core.n_cigar = fn & 0xffff;
    b->core.flag = fn >> 16;
    memcpy(&b->core.l_qseq, fixed + 16, 4);
    memcpy(&b->core.mtid, fixed + 20, 4);
    int32_t mpos; memcpy(&mpos, fixed + 24, 4); b->core.mpos = mpos;
    int32_t isize; memcpy(&isize, fixed + 28, 4); b->core.isize = isize;
    b->core.l_extranul = 0;
    b->l_data = block_len - 32;
    if (b->l_data && gz_read_full(fp->fp->gz, b->data, b->l_data) != b->l_data) return -2;
    return b->l_data + 32;
}

hts_pos_t bam_cigar2rlen(int n_cigar, const uint32_t *cigar) {
    hts_pos_t l = 0;
    int i;
    for (i = 0; i < n_cigar; ++i)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 2) l += bam_cigar_oplen(cigar[i]);
    return l;
}

hts_pos_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar) {
    hts_pos_t l = 0;
    int i;
    for (i = 0; i < n_cigar; ++i)
        if (bam_cigar_type(bam_cigar_op(cigar[i])) & 1) l += bam_cigar_oplen(cigar[i]);
    return l;
}

hts_pos_t bam_endpos(const bam1_t *b) {
    hts_pos_t rlen = (b->core.flag & BAM_FUNMAP) ? 0
        : bam_cigar2rlen(b->core.n_cigar, bam_get_cigar(b));
    if (rlen == 0) rlen = 1;
    return b->core.pos + rlen;
}

/* ---- aux ---- */

static int aux_type_size(uint8_t t, const uint8_t *s, int *var) {
    *var = 0;
    switch (t) {
    case 'A': case 'c': case 'C': return 1;
    case 's': case 'S': return 2;
    case 'i': case 'I': case 'f': return 4;
    case 'd': return 8;
    case 'Z': case 'H': { *var = 1; int l = 0; while (s[l]) ++l; return l + 1; }
    case 'B': {
        *var = 1;
        uint8_t sub = s[0];
        int32_t n; memcpy(&n, s + 1, 4);
        int es = (sub=='c'||sub=='C') ? 1 : (sub=='s'||sub=='S') ? 2 : 4;
        return 5 + es * n;
    }
    default: return -1;
    }
}

uint8_t *bam_aux_get(const bam1_t *b, const char tag[2]) {
    uint8_t *s = bam_get_aux(b);
    uint8_t *end = b->data + b->l_data;
    while (s < end) {
        uint8_t t0 = s[0], t1 = s[1], type = s[2];
        int var, sz = aux_type_size(type, s + 3, &var);
        if (sz < 0) return 0;
        if (t0 == tag[0] && t1 == tag[1]) return s + 2;
        s += 3 + sz;
    }
    return 0;
}

int64_t bam_aux2i(const uint8_t *s) {
    switch (*s) {
    case 'c': return *(int8_t*)(s+1);
    case 'C': return *(uint8_t*)(s+1);
    case 's': { int16_t v; memcpy(&v, s+1, 2); return v; }
    case 'S': { uint16_t v; memcpy(&v, s+1, 2); return v; }
    case 'i': { int32_t v; memcpy(&v, s+1, 4); return v; }
    case 'I': { uint32_t v; memcpy(&v, s+1, 4); return v; }
    default: return 0;
    }
}

double bam_aux2f(const uint8_t *s) {
    if (*s == 'f') { float v; memcpy(&v, s+1, 4); return v; }
    if (*s == 'd') { double v; memcpy(&v, s+1, 8); return v; }
    return bam_aux2i(s);
}

char *bam_aux2Z(const uint8_t *s) { return (*s=='Z'||*s=='H') ? (char*)(s+1) : 0; }
char bam_aux2A(const uint8_t *s) { return *s=='A' ? (char)s[1] : 0; }

int bam_aux_append(bam1_t *b, const char tag[2], char type, int len, const uint8_t *data) {
    if ((uint32_t)(b->l_data + 3 + len) > b->m_data) {
        b->m_data = b->l_data + 3 + len;
        b->m_data += 32;
        b->data = (uint8_t*)realloc(b->data, b->m_data);
    }
    b->data[b->l_data] = tag[0];
    b->data[b->l_data+1] = tag[1];
    b->data[b->l_data+2] = (uint8_t)type;
    memcpy(b->data + b->l_data + 3, data, len);
    b->l_data += 3 + len;
    return 0;
}

int bam_aux_del(bam1_t *b, uint8_t *s) {
    uint8_t *p = s - 2;
    int var, sz = aux_type_size(s[0], s + 1, &var);
    uint8_t *nxt = s + 1 + sz;
    memmove(p, nxt, b->data + b->l_data - nxt);
    b->l_data -= (int)(nxt - p);
    return 0;
}

/* ---- SAM text writing ---- */

int sam_hdr_write(samFile *fp, const bam_hdr_t *h) {
    if (h->l_text) {
        fwrite(h->text, 1, h->l_text, fp->fp->out);
        if (h->l_text && h->text[h->l_text-1] != '\n') fputc('\n', fp->fp->out);
    }
    return 0;
}

static void fput_aux(FILE *o, const uint8_t *s, const uint8_t *end) {
    while (s < end) {
        fputc('\t', o);
        fputc(s[0], o); fputc(s[1], o); fputc(':', o);
        uint8_t type = s[2];
        const uint8_t *v = s + 3;
        int var, sz = aux_type_size(type, v, &var);
        switch (type) {
        case 'A': fprintf(o, "A:%c", v[0]); break;
        case 'c': fprintf(o, "i:%d", *(int8_t*)v); break;
        case 'C': fprintf(o, "i:%u", *(uint8_t*)v); break;
        case 's': { int16_t x; memcpy(&x, v, 2); fprintf(o, "i:%d", x); } break;
        case 'S': { uint16_t x; memcpy(&x, v, 2); fprintf(o, "i:%u", x); } break;
        case 'i': { int32_t x; memcpy(&x, v, 4); fprintf(o, "i:%d", x); } break;
        case 'I': { uint32_t x; memcpy(&x, v, 4); fprintf(o, "i:%u", x); } break;
        case 'f': { float x; memcpy(&x, v, 4); fprintf(o, "f:%g", x); } break;
        case 'd': { double x; memcpy(&x, v, 8); fprintf(o, "d:%g", x); } break;
        case 'Z': case 'H': fprintf(o, "%c:%s", type, (const char*)v); break;
        case 'B': {
            uint8_t sub = v[0]; int32_t n; memcpy(&n, v+1, 4);
            fprintf(o, "B:%c", sub);
            const uint8_t *e = v + 5;
            int i;
            for (i = 0; i < n; ++i) {
                fputc(',', o);
                switch (sub) {
                case 'c': fprintf(o, "%d", *(int8_t*)e); e += 1; break;
                case 'C': fprintf(o, "%u", *(uint8_t*)e); e += 1; break;
                case 's': { int16_t x; memcpy(&x, e, 2); fprintf(o, "%d", x); e += 2; } break;
                case 'S': { uint16_t x; memcpy(&x, e, 2); fprintf(o, "%u", x); e += 2; } break;
                case 'i': { int32_t x; memcpy(&x, e, 4); fprintf(o, "%d", x); e += 4; } break;
                case 'I': { uint32_t x; memcpy(&x, e, 4); fprintf(o, "%u", x); e += 4; } break;
                case 'f': { float x; memcpy(&x, e, 4); fprintf(o, "%g", x); e += 4; } break;
                }
            }
        } break;
        }
        s += 3 + sz;
    }
}

static void sam_format_record(FILE *o, const bam_hdr_t *h, const bam1_t *b) {
    const bam1_core_t *c = &b->core;
    fputs(bam_get_qname(b), o);
    fprintf(o, "\t%d\t%s\t%" PRId64 "\t%d\t",
            c->flag, c->tid >= 0 ? h->target_name[c->tid] : "*",
            (int64_t)(c->pos + 1), c->qual);
    if (c->n_cigar) {
        uint32_t i;
        const uint32_t *cig = bam_get_cigar(b);
        for (i = 0; i < c->n_cigar; ++i)
            fprintf(o, "%u%c", bam_cigar_oplen(cig[i]), bam_cigar_opchr(cig[i]));
    } else fputc('*', o);
    if (c->mtid < 0) fputs("\t*", o);
    else if (c->mtid == c->tid) fputs("\t=", o);
    else fprintf(o, "\t%s", h->target_name[c->mtid]);
    fprintf(o, "\t%" PRId64 "\t%" PRId64 "\t", (int64_t)(c->mpos + 1), (int64_t)c->isize);
    if (c->l_qseq) {
        int i;
        const uint8_t *seq = bam_get_seq(b);
        for (i = 0; i < c->l_qseq; ++i) fputc(seq_nt16_str[bam_seqi(seq, i)], o);
        fputc('\t', o);
        const uint8_t *q = bam_get_qual(b);
        if (q[0] == 0xff) fputc('*', o);
        else for (i = 0; i < c->l_qseq; ++i) fputc(q[i] + 33, o);
    } else fputs("*\t*", o);
    fput_aux(o, bam_get_aux(b), b->data + b->l_data);
}

int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b) {
    sam_format_record(fp->fp->out, h, b);
    fputc('\n', fp->fp->out);
    return 0;
}

/* append SAM text (no trailing newline) to a caller-managed kstring */
int sam_format1(const bam_hdr_t *h, const bam1_t *b, struct __kstring_t *str) {
    char *buf = 0;
    size_t n = 0;
    FILE *o = open_memstream(&buf, &n);
    if (!o) return -1;
    sam_format_record(o, h, b);
    fclose(o);
    if (str->l + n + 1 > str->m) {
        str->m = str->l + n + 1;
        str->s = (char*)realloc(str->s, str->m);
    }
    memcpy(str->s + str->l, buf, n);
    str->l += n;
    str->s[str->l] = 0;
    free(buf);
    return (int)n;
}

/* ---- region iterators: linear scan over a coordinate-sorted BAM ---- */

struct hts_idx_t {
    char *fn;
};

struct hts_itr_t {
    int tid;
    hts_pos_t beg, end;
    gzFile gz;       /* private stream positioned after the header */
    int finished;
};

hts_idx_t *sam_index_load(samFile *fp, const char *fn) {
    (void)fp;
    hts_idx_t *idx = (hts_idx_t*)calloc(1, sizeof(hts_idx_t));
    idx->fn = strdup(fn);
    return idx;
}

void hts_idx_destroy(hts_idx_t *idx) {
    if (idx) { free(idx->fn); free(idx); }
}

static gzFile open_past_header(const char *fn) {
    gzFile gz = gzopen(fn, "rb");
    if (!gz) return 0;
    char magic[4];
    if (gzread(gz, magic, 4) != 4 || memcmp(magic, "BAM\1", 4)) { gzclose(gz); return 0; }
    int32_t l_text;
    gzread(gz, &l_text, 4);
    gzseek(gz, l_text, SEEK_CUR);
    int32_t n_targets;
    gzread(gz, &n_targets, 4);
    int i;
    for (i = 0; i < n_targets; ++i) {
        int32_t l_name; gzread(gz, &l_name, 4);
        gzseek(gz, l_name + 4, SEEK_CUR);
    }
    return gz;
}

hts_itr_t *sam_itr_queryi(const hts_idx_t *idx, int tid, hts_pos_t beg, hts_pos_t end) {
    hts_itr_t *it = (hts_itr_t*)calloc(1, sizeof(hts_itr_t));
    it->tid = tid; it->beg = beg; it->end = end;
    it->gz = open_past_header(idx->fn);
    if (!it->gz) it->finished = 1;
    return it;
}

void hts_itr_destroy(hts_itr_t *itr) {
    if (itr) { if (itr->gz) gzclose(itr->gz); free(itr); }
}

int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b) {
    (void)fp;
    if (itr->finished) return -1;
    for (;;) {
        int32_t block_len = 0;
        int got = gzread(itr->gz, &block_len, 4);
        if (got == 0) { itr->finished = 1; return -1; }
        if (got != 4 || block_len < 32) return -2;
        if ((uint32_t)block_len + 32 > b->m_data) {
            b->m_data = block_len + 32;
            b->data = (uint8_t*)realloc(b->data, b->m_data);
        }
        uint8_t fixed[32];
        if (gzread(itr->gz, fixed, 32) != 32) return -2;
        memcpy(&b->core.tid, fixed + 0, 4);
        int32_t pos; memcpy(&pos, fixed + 4, 4); b->core.pos = pos;
        uint32_t bmn; memcpy(&bmn, fixed + 8, 4);
        b->core.l_qname = bmn & 0xff;
        b->core.qual = (bmn >> 8) & 0xff;
        b->core.bin = bmn >> 16;
        uint32_t fn; memcpy(&fn, fixed + 12, 4);
        b->core.n_cigar = fn & 0xffff;
        b->core.flag = fn >> 16;
        memcpy(&b->core.l_qseq, fixed + 16, 4);
        memcpy(&b->core.mtid, fixed + 20, 4);
        int32_t mpos; memcpy(&mpos, fixed + 24, 4); b->core.mpos = mpos;
        int32_t isize; memcpy(&isize, fixed + 28, 4); b->core.isize = isize;
        b->core.l_extranul = 0;
        b->l_data = block_len - 32;
        if (b->l_data && gzread(itr->gz, b->data, b->l_data) != b->l_data) return -2;
        /* coordinate-sorted early stop: unmapped (tid -1) sort last */
        if (b->core.tid == -1 || b->core.tid > itr->tid ||
            (b->core.tid == itr->tid && b->core.pos >= itr->end)) {
            itr->finished = 1;
            return -1;
        }
        if (b->core.tid == itr->tid && b->core.pos < itr->end &&
            bam_endpos(b) > itr->beg)
            return b->l_data + 32;
        /* else skip */
    }
}

/* ------------------------------------------------------------------ */
/* faidx: whole-FASTA in memory                                        */

struct faidx_t {
    int n;
    char **names;
    char **seqs;
    int *lens;
};

faidx_t *fai_load(const char *fn) {
    gzFile gz = gzopen(fn, "rb");
    if (!gz) return 0;
    faidx_t *fai = (faidx_t*)calloc(1, sizeof(faidx_t));
    int cap = 8;
    fai->names = (char**)malloc(cap * sizeof(char*));
    fai->seqs = (char**)malloc(cap * sizeof(char*));
    fai->lens = (int*)malloc(cap * sizeof(int));
    char buf[65536];
    size_t seq_cap = 0, seq_len = 0;
    char *seq = 0;
    char *name = 0;
    while (gzgets(gz, buf, sizeof(buf))) {
        size_t l = strlen(buf);
        while (l && (buf[l-1] == '\n' || buf[l-1] == '\r')) buf[--l] = 0;
        if (buf[0] == '>') {
            if (name) {
                if (fai->n == cap) {
                    cap *= 2;
                    fai->names = (char**)realloc(fai->names, cap * sizeof(char*));
                    fai->seqs = (char**)realloc(fai->seqs, cap * sizeof(char*));
                    fai->lens = (int*)realloc(fai->lens, cap * sizeof(int));
                }
                fai->names[fai->n] = name;
                fai->seqs[fai->n] = seq ? seq : strdup("");
                fai->lens[fai->n] = (int)seq_len;
                fai->n++;
                seq = 0; seq_cap = seq_len = 0;
            }
            char *sp = buf + 1;
            size_t nl = strcspn(sp, " \t");
            name = (char*)malloc(nl + 1);
            memcpy(name, sp, nl); name[nl] = 0;
        } else if (name) {
            if (seq_len + l + 1 > seq_cap) {
                seq_cap = (seq_len + l + 1) * 2;
                seq = (char*)realloc(seq, seq_cap);
            }
            memcpy(seq + seq_len, buf, l);
            seq_len += l;
            seq[seq_len] = 0;
        }
    }
    if (name) {
        if (fai->n == cap) {
            cap += 1;
            fai->names = (char**)realloc(fai->names, cap * sizeof(char*));
            fai->seqs = (char**)realloc(fai->seqs, cap * sizeof(char*));
            fai->lens = (int*)realloc(fai->lens, cap * sizeof(int));
        }
        fai->names[fai->n] = name;
        fai->seqs[fai->n] = seq ? seq : strdup("");
        fai->lens[fai->n] = (int)seq_len;
        fai->n++;
    }
    gzclose(gz);
    return fai;
}

void fai_destroy(faidx_t *fai) {
    if (!fai) return;
    int i;
    for (i = 0; i < fai->n; ++i) { free(fai->names[i]); free(fai->seqs[i]); }
    free(fai->names); free(fai->seqs); free(fai->lens); free(fai);
}

static int fai_find(const faidx_t *fai, const char *name) {
    int i;
    for (i = 0; i < fai->n; ++i)
        if (strcmp(fai->names[i], name) == 0) return i;
    return -1;
}

int faidx_seq_len(const faidx_t *fai, const char *seq) {
    int i = fai_find(fai, seq);
    return i < 0 ? -1 : fai->lens[i];
}

int faidx_has_seq(const faidx_t *fai, const char *seq) { return fai_find(fai, seq) >= 0; }
int faidx_nseq(const faidx_t *fai) { return fai->n; }
const char *faidx_iseq(const faidx_t *fai, int i) { return fai->names[i]; }

char *faidx_fetch_seq(const faidx_t *fai, const char *c_name, int p_beg_i, int p_end_i, int *len) {
    int i = fai_find(fai, c_name);
    if (i < 0) { *len = -2; return 0; }
    int L = fai->lens[i];
    if (p_beg_i < 0) p_beg_i = 0;
    if (p_end_i >= L) p_end_i = L - 1;
    if (p_beg_i > p_end_i) { *len = 0; return strdup(""); }
    int n = p_end_i - p_beg_i + 1;
    char *out = (char*)malloc(n + 1);
    memcpy(out, fai->seqs[i] + p_beg_i, n);
    out[n] = 0;
    *len = n;
    return out;
}

char *fai_fetch(const faidx_t *fai, const char *reg, int *len) {
    int beg, end;
    const char *colon = hts_parse_reg(reg, &beg, &end);
    char name[1024];
    if (colon) {
        size_t nl = (size_t)(colon - reg);
        if (nl >= sizeof(name)) nl = sizeof(name) - 1;
        memcpy(name, reg, nl); name[nl] = 0;
    } else {
        snprintf(name, sizeof(name), "%s", reg);
        beg = 0; end = INT_MAX;
    }
    int L = faidx_seq_len(fai, name);
    if (L < 0) { *len = -2; return 0; }
    if (end > L) end = L;
    return faidx_fetch_seq(fai, name, beg, end - 1, len);
}

/* ------------------------------------------------------------------ */
/* modBAM (MM/ML) parsing — the single-modification subset the         */
/* reference epiread actually consumes (it fatals on >1 mod type).     */
/* Semantics follow htslib: MM deltas count occurrences of the         */
/* canonical base in ORIGINAL read orientation (so a reverse-strand    */
/* record scans the complement from the stored-seq 3' end), ML:B:C     */
/* quals pair with MM entries in order, qual = -1 when ML is absent.   */
/* The iterator advances one stored-seq position per                   */
/* bam_mods_at_next_pos call, exactly how epiread.c walks its cigar.   */

struct hts_base_mod_state {
    int n, cap;
    int *pos;       /* stored-seq positions, ascending */
    int *qual;      /* ML value or -1, aligned with pos */
    int strand;     /* 0 = '+', 1 = '-' */
    char canonical; /* as written in MM ('C' or 'G') */
    int code;       /* modification code, e.g. 'm' */
    int have;       /* an MM tag was present */
    int qcur, mi;   /* iterator: next seq pos, next mod index */
    int recorded[1];
};

hts_base_mod_state *hts_base_mod_state_alloc(void) {
    return (hts_base_mod_state*)calloc(1, sizeof(hts_base_mod_state));
}
void hts_base_mod_state_free(hts_base_mod_state *st) {
    if (!st) return;
    free(st->pos); free(st->qual); free(st);
}

static void mod_push(hts_base_mod_state *st, int pos, int qual) {
    if (st->n == st->cap) {
        st->cap = st->cap ? st->cap * 2 : 16;
        st->pos = (int*)realloc(st->pos, st->cap * sizeof(int));
        st->qual = (int*)realloc(st->qual, st->cap * sizeof(int));
    }
    st->pos[st->n] = pos;
    st->qual[st->n] = qual;
    st->n++;
}

int bam_parse_basemod2(const bam1_t *b, hts_base_mod_state *st, uint32_t flags) {
    (void)flags;
    st->n = 0; st->have = 0; st->qcur = 0; st->mi = 0;
    st->strand = 0; st->canonical = 0; st->code = 0;
    uint8_t *mm = bam_aux_get(b, "MM");
    if (!mm) mm = bam_aux_get(b, "Mm");
    if (!mm || (*mm != 'Z' && *mm != 'H')) return 0;  /* no mods: ok */
    const char *s = (const char *)(mm + 1);
    if (!*s) return 0;
    st->have = 1;
    st->canonical = *s++;
    if (*s != '+' && *s != '-') return -1;
    st->strand = (*s++ == '+') ? 0 : 1;
    /* modification code list: one letter code(s) or ChEBI number */
    if (*s >= '0' && *s <= '9') {
        st->code = atoi(s);
        while (*s >= '0' && *s <= '9') ++s;
    } else {
        st->code = *s;
        int ncodes = 0;
        while ((*s >= 'a' && *s <= 'z') || (*s >= 'A' && *s <= 'Z')) { ++s; ++ncodes; }
        if (ncodes > 1) return -1;  /* reference only supports one */
    }
    if (*s == '.' || *s == '?') ++s;  /* implicit-call marker */
    /* ML:B:C quals */
    const uint8_t *mlv = NULL; uint32_t mln = 0;
    uint8_t *ml = bam_aux_get(b, "ML");
    if (!ml) ml = bam_aux_get(b, "Ml");
    if (ml && ml[0] == 'B' && ml[1] == 'C') {
        memcpy(&mln, ml + 2, 4);
        mlv = ml + 6;
    }
    /* occurrences of the canonical base in ORIGINAL read orientation */
    int l = b->core.l_qseq;
    int rev = (b->core.flag & BAM_FREVERSE) != 0;
    uint8_t want = seq_nt16_table[(int)(unsigned char)st->canonical];
    uint8_t want_comp = seq_nt16_table[(int)(unsigned char)
        (st->canonical == 'C' ? 'G' : st->canonical == 'G' ? 'C'
         : st->canonical == 'A' ? 'T' : st->canonical == 'T' ? 'A' : 'N')];
    const uint8_t *seq = bam_get_seq(b);
    int idx = -1;   /* index among occurrences (original orientation) */
    int scan = 0;   /* original-orientation position of the NEXT scan */
    uint32_t k = 0;
    while (*s == ',') {
        ++s;
        long d = strtol(s, (char **)&s, 10);
        /* advance to the (idx + d + 1)-th occurrence */
        long need = d;
        int opos = -1;
        for (; scan < l; ++scan) {
            int spos = rev ? l - 1 - scan : scan;
            uint8_t nt = bam_seqi(seq, spos);
            uint8_t tgt = rev ? want_comp : want;
            if (nt == tgt) {
                if (need == 0) { opos = scan; ++idx; ++scan; break; }
                --need;
                ++idx;
            }
        }
        if (opos < 0) break;  /* ran past the read, like htslib */
        int spos = rev ? l - 1 - opos : opos;
        int q = (mlv && k < mln) ? (int)mlv[k] : -1;
        mod_push(st, spos, q);
        ++k;
    }
    /* reverse-strand records produce descending stored positions */
    if (st->n > 1 && st->pos[0] > st->pos[st->n - 1]) {
        for (int i = 0, j = st->n - 1; i < j; ++i, --j) {
            int tp = st->pos[i]; st->pos[i] = st->pos[j]; st->pos[j] = tp;
            int tq = st->qual[i]; st->qual[i] = st->qual[j]; st->qual[j] = tq;
        }
    }
    return 0;
}

int bam_mods_at_next_pos(const bam1_t *b, hts_base_mod_state *st, hts_base_mod *mods, int n_mods) {
    (void)b;
    int i = st->qcur++;
    if (st->mi < st->n && st->pos[st->mi] == i) {
        if (n_mods > 0) {
            mods[0].modified_base = st->code;
            mods[0].canonical_base = st->canonical;
            mods[0].strand = st->strand;
            mods[0].qual = st->qual[st->mi];
        }
        st->mi++;
        return 1;
    }
    return 0;
}

int *bam_mods_recorded(hts_base_mod_state *st, int *n_mods) {
    st->recorded[0] = st->code;
    *n_mods = st->have ? 1 : 0;
    return st->recorded;
}

int bam_mods_queryi(hts_base_mod_state *st, int i, int *strand, int *implicit, char *canonical) {
    if (i != 0 || !st->have) return -1;
    *strand = st->strand;
    *implicit = 0;
    *canonical = st->canonical;
    return 0;
}
