/* framefeed: background ring-buffer reader for raw video frame pipes.
 *
 * Native runtime component of the TPU build's ingest path.  The reference
 * reads its ffmpeg rawvideo pipe synchronously from Python
 * (/root/reference/pyannote/video/video.py:368-406): every frame read
 * blocks the interpreter while ffmpeg decodes.  This extension moves the
 * pipe draining to a pthread that fills a ring buffer without holding the
 * GIL, so video decode overlaps host preprocessing and TPU compute, and
 * batch assembly ([B, H, W, 3] blocks for device transfer) is one memcpy
 * per frame instead of Python-level buffer stitching.
 *
 * Pure CPython C API (no pybind11 in this image).  Thread-safety model:
 * one producer (the reader thread), one consumer (the Python caller).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <errno.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

typedef struct {
    PyObject_HEAD
    int fd;                 /* pipe read end (owned by the subprocess obj) */
    size_t frame_bytes;     /* bytes per frame (H*W*3 for rgb24) */
    size_t capacity;        /* ring capacity in frames */
    uint8_t *ring;          /* capacity * frame_bytes */
    /* producer/consumer state, guarded by mutex */
    pthread_mutex_t lock;
    pthread_cond_t can_produce;
    pthread_cond_t can_consume;
    size_t head;            /* next slot to write (producer) */
    size_t tail;            /* next slot to read (consumer) */
    size_t count;           /* filled slots */
    int eof;                /* producer saw EOF/short read */
    int closed;             /* consumer asked to stop */
    size_t frames_read;     /* producer total */
    pthread_t thread;
    int thread_started;
} Reader;

static void *reader_main(void *arg)
{
    Reader *r = (Reader *)arg;
    for (;;) {
        pthread_mutex_lock(&r->lock);
        while (r->count == r->capacity && !r->closed)
            pthread_cond_wait(&r->can_produce, &r->lock);
        if (r->closed) {
            pthread_mutex_unlock(&r->lock);
            return NULL;
        }
        uint8_t *slot = r->ring + r->head * r->frame_bytes;
        pthread_mutex_unlock(&r->lock);

        /* blocking read of one full frame, outside the lock */
        size_t got = 0;
        while (got < r->frame_bytes) {
            ssize_t n = read(r->fd, slot + got, r->frame_bytes - got);
            if (n > 0) {
                got += (size_t)n;
            } else if (n == 0) {
                break; /* EOF */
            } else if (errno == EINTR) {
                continue;
            } else {
                break; /* read error -> treat as EOF */
            }
        }

        pthread_mutex_lock(&r->lock);
        if (got == r->frame_bytes) {
            r->head = (r->head + 1) % r->capacity;
            r->count++;
            r->frames_read++;
            pthread_cond_signal(&r->can_consume);
            pthread_mutex_unlock(&r->lock);
        } else {
            r->eof = 1;
            pthread_cond_signal(&r->can_consume);
            pthread_mutex_unlock(&r->lock);
            return NULL;
        }
    }
}

static int reader_init(Reader *self, PyObject *args, PyObject *kwds)
{
    static char *kwlist[] = {"fd", "frame_bytes", "capacity", NULL};
    int fd;
    Py_ssize_t frame_bytes, capacity = 32;
    if (!PyArg_ParseTupleAndKeywords(args, kwds, "in|n", kwlist, &fd,
                                     &frame_bytes, &capacity))
        return -1;
    if (frame_bytes <= 0 || capacity <= 0) {
        PyErr_SetString(PyExc_ValueError,
                        "frame_bytes and capacity must be positive");
        return -1;
    }
    self->fd = fd;
    self->frame_bytes = (size_t)frame_bytes;
    self->capacity = (size_t)capacity;
    self->ring = (uint8_t *)malloc(self->capacity * self->frame_bytes);
    if (!self->ring) {
        PyErr_NoMemory();
        return -1;
    }
    pthread_mutex_init(&self->lock, NULL);
    pthread_cond_init(&self->can_produce, NULL);
    pthread_cond_init(&self->can_consume, NULL);
    self->head = self->tail = self->count = 0;
    self->eof = self->closed = 0;
    self->frames_read = 0;
    if (pthread_create(&self->thread, NULL, reader_main, self) != 0) {
        PyErr_SetString(PyExc_RuntimeError, "failed to start reader thread");
        return -1;
    }
    self->thread_started = 1;
    return 0;
}

/* read_batch(buffer, n) -> frames copied (0 on EOF).  `buffer` must be a
 * writable contiguous buffer of at least n*frame_bytes bytes (a numpy
 * array of shape [n, H, W, 3] uint8). */
static PyObject *reader_read_batch(Reader *self, PyObject *args)
{
    PyObject *buf_obj;
    Py_ssize_t want;
    if (!PyArg_ParseTuple(args, "On", &buf_obj, &want))
        return NULL;
    Py_buffer view;
    if (PyObject_GetBuffer(buf_obj, &view, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS) != 0)
        return NULL;
    if ((size_t)view.len < (size_t)want * self->frame_bytes) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "buffer too small for batch");
        return NULL;
    }

    size_t copied = 0;
    uint8_t *dst = (uint8_t *)view.buf;

    Py_BEGIN_ALLOW_THREADS
    pthread_mutex_lock(&self->lock);
    while (copied < (size_t)want) {
        while (self->count == 0 && !self->eof && !self->closed)
            pthread_cond_wait(&self->can_consume, &self->lock);
        if (self->count == 0) /* EOF or closed, ring drained */
            break;
        memcpy(dst + copied * self->frame_bytes,
               self->ring + self->tail * self->frame_bytes,
               self->frame_bytes);
        self->tail = (self->tail + 1) % self->capacity;
        self->count--;
        copied++;
        pthread_cond_signal(&self->can_produce);
    }
    pthread_mutex_unlock(&self->lock);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&view);
    return PyLong_FromSize_t(copied);
}

static PyObject *reader_close(Reader *self, PyObject *Py_UNUSED(ignored))
{
    pthread_mutex_lock(&self->lock);
    self->closed = 1;
    pthread_cond_broadcast(&self->can_produce);
    pthread_cond_broadcast(&self->can_consume);
    pthread_mutex_unlock(&self->lock);
    if (self->thread_started) {
        Py_BEGIN_ALLOW_THREADS
        pthread_join(self->thread, NULL);
        Py_END_ALLOW_THREADS
        self->thread_started = 0;
    }
    Py_RETURN_NONE;
}

static PyObject *reader_stats(Reader *self, PyObject *Py_UNUSED(ignored))
{
    pthread_mutex_lock(&self->lock);
    PyObject *d = Py_BuildValue(
        "{s:n, s:n, s:i}",
        "frames_read", (Py_ssize_t)self->frames_read,
        "buffered", (Py_ssize_t)self->count,
        "eof", self->eof);
    pthread_mutex_unlock(&self->lock);
    return d;
}

static void reader_dealloc(Reader *self)
{
    if (self->thread_started) {
        pthread_mutex_lock(&self->lock);
        self->closed = 1;
        pthread_cond_broadcast(&self->can_produce);
        pthread_cond_broadcast(&self->can_consume);
        pthread_mutex_unlock(&self->lock);
        pthread_join(self->thread, NULL);
    }
    free(self->ring);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static PyMethodDef reader_methods[] = {
    {"read_batch", (PyCFunction)reader_read_batch, METH_VARARGS,
     "read_batch(buffer, n) -> frames copied into buffer (0 at EOF)"},
    {"close", (PyCFunction)reader_close, METH_NOARGS, "stop the reader"},
    {"stats", (PyCFunction)reader_stats, METH_NOARGS, "ring statistics"},
    {NULL, NULL, 0, NULL},
};

static PyTypeObject ReaderType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "framefeed.Reader",
    .tp_basicsize = sizeof(Reader),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_doc = "Background ring-buffer reader for raw frame pipes",
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)reader_init,
    .tp_dealloc = (destructor)reader_dealloc,
    .tp_methods = reader_methods,
};

static PyModuleDef framefeed_module = {
    PyModuleDef_HEAD_INIT,
    .m_name = "framefeed",
    .m_doc = "GIL-free ring-buffer frame pipe reader",
    .m_size = -1,
};

PyMODINIT_FUNC PyInit_framefeed(void)
{
    PyObject *m;
    if (PyType_Ready(&ReaderType) < 0)
        return NULL;
    m = PyModule_Create(&framefeed_module);
    if (!m)
        return NULL;
    Py_INCREF(&ReaderType);
    PyModule_AddObject(m, "Reader", (PyObject *)&ReaderType);
    return m;
}
