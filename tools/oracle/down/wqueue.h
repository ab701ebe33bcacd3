/* Minimal stand-in for huishenlab/utils wqueue.h (blocking bounded queue
 * macros over pthreads), reconstructed from the call sites in
 * /root/reference/src. Test tooling only. API:
 *   DEFINE_WQUEUE(name, type); wqueue_t(name) *wqueue_init(name, cap);
 *   wqueue_get(name, q, &item); wqueue_put(name, q, &item);
 *   wqueue_put2(name, q, item); wqueue_destroy(name, q); */
#ifndef ORACLE_SHIM_WQUEUE_H
#define ORACLE_SHIM_WQUEUE_H

#include <stdlib.h>
#include <pthread.h>

#define wqueue_t(name) wqueue_##name##_t

#define DEFINE_WQUEUE(name, type)                                        \
    typedef struct {                                                     \
        type *data;                                                      \
        size_t cap, head, cnt;                                           \
        pthread_mutex_t mtx;                                             \
        pthread_cond_t not_empty, not_full;                              \
    } wqueue_##name##_t;                                                 \
    static inline wqueue_##name##_t *wqueue_init_##name(size_t cap) {    \
        wqueue_##name##_t *q = (wqueue_##name##_t*)calloc(1, sizeof(*q)); \
        q->cap = cap ? cap : 1;                                          \
        q->data = (type*)malloc(q->cap * sizeof(type));                  \
        pthread_mutex_init(&q->mtx, 0);                                  \
        pthread_cond_init(&q->not_empty, 0);                             \
        pthread_cond_init(&q->not_full, 0);                              \
        return q;                                                        \
    }                                                                    \
    static inline void wqueue_destroy_##name(wqueue_##name##_t *q) {     \
        pthread_mutex_destroy(&q->mtx);                                  \
        pthread_cond_destroy(&q->not_empty);                             \
        pthread_cond_destroy(&q->not_full);                              \
        free(q->data); free(q);                                          \
    }                                                                    \
    static inline void wqueue_get_##name(wqueue_##name##_t *q, type *it) { \
        pthread_mutex_lock(&q->mtx);                                     \
        while (q->cnt == 0) pthread_cond_wait(&q->not_empty, &q->mtx);   \
        *it = q->data[q->head];                                          \
        q->head = (q->head + 1) % q->cap;                                \
        q->cnt--;                                                        \
        pthread_cond_signal(&q->not_full);                               \
        pthread_mutex_unlock(&q->mtx);                                   \
    }                                                                    \
    static inline void wqueue_put_##name(wqueue_##name##_t *q, type *it) { \
        pthread_mutex_lock(&q->mtx);                                     \
        while (q->cnt == q->cap) pthread_cond_wait(&q->not_full, &q->mtx); \
        q->data[(q->head + q->cnt) % q->cap] = *it;                      \
        q->cnt++;                                                        \
        pthread_cond_signal(&q->not_empty);                              \
        pthread_mutex_unlock(&q->mtx);                                   \
    }                                                                    \
    static inline void wqueue_put2_##name(wqueue_##name##_t *q, type it) { \
        wqueue_put_##name(q, &it);                                       \
    }

#define wqueue_init(name, cap) wqueue_init_##name(cap)
#define wqueue_destroy(name, q) wqueue_destroy_##name(q)
#define wqueue_get(name, q, it) wqueue_get_##name((q), (it))
#define wqueue_put(name, q, it) wqueue_put_##name((q), (it))
#define wqueue_put2(name, q, it) wqueue_put2_##name((q), (it))

#endif
