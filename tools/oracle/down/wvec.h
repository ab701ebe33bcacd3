/* Minimal stand-in for huishenlab/utils wvec.h (growable vector macros),
 * reconstructed from the call sites in /root/reference/src. Test tooling
 * only. API: DEFINE_VECTOR(name, type) provides
 *   name *init_name(size_t cap); void free_name(name*);
 *   void push_name(name*, type v); type *ref_name(name*, size_t i);
 *   type get_name(name*, size_t i); type *next_ref_name(name*);
 * with public field ->size. */
#ifndef ORACLE_SHIM_WVEC_H
#define ORACLE_SHIM_WVEC_H

#include <stdlib.h>
#include <string.h>

#define DEFINE_VECTOR(name, type)                                       \
    typedef struct {                                                    \
        size_t size;                                                    \
        size_t cap;                                                     \
        type *buffer;                                                   \
    } name;                                                             \
    static inline name *init_##name(size_t cap) {                       \
        name *v = (name*)calloc(1, sizeof(name));                       \
        if (cap == 0) cap = 1;                                          \
        v->cap = cap;                                                   \
        v->buffer = (type*)calloc(v->cap, sizeof(type));                \
        return v;                                                       \
    }                                                                   \
    static inline void free_##name(name *v) {                           \
        free(v->buffer); free(v);                                       \
    }                                                                   \
    static inline void wvec_grow_##name(name *v) {                      \
        if (v->size == v->cap) {                                        \
            v->cap <<= 1;                                               \
            v->buffer = (type*)realloc(v->buffer, v->cap * sizeof(type)); \
            memset(v->buffer + v->size, 0, (v->cap - v->size) * sizeof(type)); \
        }                                                               \
    }                                                                   \
    static inline void push_##name(name *v, type item) {                \
        wvec_grow_##name(v);                                            \
        v->buffer[v->size++] = item;                                    \
    }                                                                   \
    static inline type *ref_##name(name *v, size_t i) {                 \
        return v->buffer + i;                                           \
    }                                                                   \
    static inline type get_##name(name *v, size_t i) {                  \
        return v->buffer[i];                                            \
    }                                                                   \
    static inline type *next_ref_##name(name *v) {                      \
        wvec_grow_##name(v);                                            \
        return v->buffer + v->size++;                                   \
    }

#endif
