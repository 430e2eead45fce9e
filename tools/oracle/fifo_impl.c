/* Correct implementation of the reference's fifo.h API for the oracle build.
 *
 * The reference's own fifo.c has a tail-pointer bug: fifo_enqueue never
 * advances fifo_tail in the non-empty branch, so the 2nd of any 3+ queued
 * buffers is orphaned (silent IQ data loss + buffer leak) whenever the
 * consumer falls behind. That loss is load-dependent and would corrupt
 * golden files, so the oracle links this correct queue instead. The
 * blocking/backpressure semantics match the original API contract.
 */
#include <pthread.h>
#include <stdbool.h>
#include <stdlib.h>
#include "fifo.h"

static pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
static pthread_cond_t notempty = PTHREAD_COND_INITIALIZER;
static pthread_cond_t empty = PTHREAD_COND_INITIALIZER;
static pthread_cond_t freed = PTHREAD_COND_INITIALIZER;
static pthread_cond_t full = PTHREAD_COND_INITIALIZER;
static struct iq_buf *head, *tail, *freelist;
static bool halted;

bool fifo_create(unsigned buffer_count, unsigned buffer_size, unsigned sample_size) {
    for (unsigned i = 0; i < buffer_count; ++i) {
        struct iq_buf *b = calloc(1, sizeof(*b));
        if (!b)
            goto nomem;
        if (sample_size == sizeof(signed short)) {
            b->data16 = calloc(buffer_size, sizeof(b->data16[0]));
            if (!b->data16) { free(b); goto nomem; }
        } else {
            b->data8 = calloc(buffer_size, sizeof(b->data8[0]));
            if (!b->data8) { free(b); goto nomem; }
        }
        b->totalLength = buffer_size;
        b->validLength = 0;
        b->next = freelist;
        freelist = b;
    }
    return true;
nomem:
    fifo_destroy();
    return false;
}

static void free_list(struct iq_buf *b) {
    while (b) {
        struct iq_buf *n = b->next;
        free(b->data8);
        free(b->data16);
        free(b);
        b = n;
    }
}

void fifo_destroy(void) {
    free_list(head);
    free_list(freelist);
    head = tail = freelist = NULL;
}

void fifo_wait_next(void) {
    pthread_mutex_lock(&mu);
    while (head && !halted)
        pthread_cond_wait(&empty, &mu);
    pthread_mutex_unlock(&mu);
}

void fifo_wait_full(void) {
    pthread_mutex_lock(&mu);
    while (freelist && !halted)
        pthread_cond_wait(&full, &mu);
    pthread_mutex_unlock(&mu);
}

void fifo_halt(void) {
    pthread_mutex_lock(&mu);
    while (head) {
        struct iq_buf *b = head;
        head = b->next;
        b->next = freelist;
        freelist = b;
    }
    tail = NULL;
    halted = true;
    pthread_cond_broadcast(&notempty);
    pthread_cond_broadcast(&empty);
    pthread_cond_broadcast(&freed);
    pthread_cond_broadcast(&full);
    pthread_mutex_unlock(&mu);
}

struct iq_buf *fifo_acquire(void) {
    pthread_mutex_lock(&mu);
    while (!halted && !freelist) {
        pthread_cond_broadcast(&full);
        pthread_cond_wait(&freed, &mu);
    }
    struct iq_buf *b = NULL;
    if (!halted) {
        b = freelist;
        freelist = b->next;
        b->validLength = 0;
        b->next = NULL;
    }
    pthread_mutex_unlock(&mu);
    return b;
}

void fifo_enqueue(struct iq_buf *buf) {
    pthread_mutex_lock(&mu);
    if (halted) {
        buf->next = freelist;
        freelist = buf;
    } else {
        buf->next = NULL;
        if (!head) {
            head = tail = buf;
        } else {
            tail->next = buf;
            tail = buf; /* the fix: advance the tail */
        }
        pthread_cond_broadcast(&notempty);
    }
    pthread_mutex_unlock(&mu);
}

struct iq_buf *fifo_dequeue(void) {
    pthread_mutex_lock(&mu);
    while (!head && !halted)
        pthread_cond_wait(&notempty, &mu);
    struct iq_buf *b = NULL;
    if (head) {
        b = head;
        head = b->next;
        b->next = NULL;
        if (!head) {
            tail = NULL;
            pthread_cond_broadcast(&empty);
        }
    }
    pthread_mutex_unlock(&mu);
    return b;
}

void fifo_release(struct iq_buf *buf) {
    pthread_mutex_lock(&mu);
    buf->next = freelist;
    freelist = buf;
    pthread_cond_broadcast(&freed);
    pthread_mutex_unlock(&mu);
}
