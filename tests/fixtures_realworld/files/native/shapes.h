/* Public header: the C type-declaration shapes beyond class/struct —
 * typedef'd anonymous structs/enums, unions, and C++11 scoped enums. */
#ifndef SHAPES_H
#define SHAPES_H

#include <stddef.h>
#include "pool.h"

typedef struct {
    double x;
    double y;
} vec2_t;

typedef enum {
    SHAPE_OK,
    SHAPE_ERR,
} shape_status_t;

union scalar {
    long   i;
    double f;
};

enum class Winding : int { CW, CCW };

typedef struct shape_node {
    vec2_t pos;
    struct shape_node *next;
} shape_node_t;

/* function-like macro and callback typedef — wave-5 shapes */
#define SHAPE_MAX(a, b) ((a) > (b) ? (a) : (b))
#define SHAPE_VERSION 2

typedef int (*shape_cmp_fn)(const vec2_t *a, const vec2_t *b);

/* prototypes — declarations, not call sites */
shape_status_t shape_area(const vec2_t *pts, size_t n, double *out);
void shape_free(struct shape_node *head);


/* RAII wrapper — destructor declarations are members too (wave 6) */
class ShapeBuffer {
public:
    ShapeBuffer(size_t cap);
    ~ShapeBuffer() { shape_free(head_); }

private:
    struct shape_node *head_;
};

/* out-of-line constructor — no return type, self-identifying via the
 * repeated qualifier (wave 7) */
ShapeBuffer::ShapeBuffer(size_t cap) : head_(NULL) {
    shape_reserve(cap);
}

/* indented free function AFTER the class closed — extent-aware
 * ownership (wave 7) keeps it off ShapeBuffer */
namespace shapes {
    inline double clamp_angle(double a) {
        return SHAPE_MAX(a, 0.0);
    }
}

#endif
