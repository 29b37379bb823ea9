#include <stdlib.h>
#include <string.h>
#include "pool.h"

struct pool {
    char *base;
    size_t used;
    size_t cap;
};

static size_t align_up(size_t n, size_t a) {
    return (n + a - 1) & ~(a - 1);
}

struct pool *pool_new(size_t cap) {
    struct pool *p = malloc(sizeof(*p));
    if (!p) {
        return NULL;
    }
    p->base = malloc(cap);
    p->used = 0;
    p->cap = cap;
    return p;
}

void *pool_alloc(struct pool *p, size_t n) {
    size_t need = align_up(n, 16);
    if (p->used + need > p->cap) {
        return NULL;
    }
    void *out = p->base + p->used;
    p->used += need;
    return out;
}

void pool_free(struct pool *p);

void pool_reset(struct pool *p) {
    memset(p->base, 0, p->used);
    p->used = 0;
}

/* wave-8c shape: #if 0 is commented-out code — never mentions */
#if 0
int pool_ghost(struct pool *p) {
    leak(p);
    return 0;
}
#endif
