/* tpumd C API shim: drop-in `lammps_*` symbols (the subset of
 * src/library.h:123-253 most used by drivers) backed by the embedded
 * Python engine via tpumd/capi/bridge.py.
 *
 * Build:  python tpumd/capi/build.py   ->  libtpumd.so
 * Usage from C mirrors the reference:
 *     void *lmp = lammps_open_no_mpi(0, NULL, NULL);
 *     lammps_command(lmp, "units lj");
 *     double n = lammps_get_natoms(lmp);
 *     lammps_close(lmp);
 * When loaded into a process that already runs Python (e.g. ctypes
 * tests), the existing interpreter is reused via PyGILState.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static PyObject *bridge = NULL;
static int we_initialized = 0;

typedef struct {
    long handle;
    /* row-pointer tables handed out by extract/gather (freed at close) */
    void **rowtabs;
    int nrowtabs;
} tpumd_handle;

static int ensure_python(void) {
    if (!Py_IsInitialized()) {
        Py_InitializeEx(0);
        we_initialized = 1;
    }
    return 1;
}

static PyObject *get_bridge(void) {
    if (bridge == NULL) {
        bridge = PyImport_ImportModule("tpumd.capi.bridge");
        if (bridge == NULL) {
            PyErr_Print();
            fprintf(stderr, "tpumd_capi: cannot import tpumd.capi.bridge "
                            "(is tpumd on PYTHONPATH?)\n");
        }
    }
    return bridge;
}

#define ENTER PyGILState_STATE gst; ensure_python(); gst = PyGILState_Ensure()
#define LEAVE PyGILState_Release(gst)

static PyObject *callb(const char *fn, const char *fmt, ...) {
    PyObject *b = get_bridge();
    if (!b) return NULL;
    PyObject *func = PyObject_GetAttrString(b, fn);
    if (!func) { PyErr_Print(); return NULL; }
    va_list va;
    va_start(va, fmt);
    PyObject *args = Py_VaBuildValue(fmt, va);
    va_end(va);
    PyObject *out = PyObject_CallObject(func, args);
    Py_XDECREF(args);
    Py_DECREF(func);
    if (!out) PyErr_Print();
    return out;
}

void *lammps_open_no_mpi(int argc, char **argv, void **ptr) {
    (void)argc; (void)argv;
    ENTER;
    PyObject *out = callb("open_instance", "()");
    tpumd_handle *h = NULL;
    if (out) {
        h = (tpumd_handle *)calloc(1, sizeof(tpumd_handle));
        h->handle = PyLong_AsLong(out);
        Py_DECREF(out);
    }
    LEAVE;
    if (ptr) *ptr = h;
    return h;
}

void lammps_close(void *handle) {
    tpumd_handle *h = (tpumd_handle *)handle;
    if (!h) return;
    ENTER;
    PyObject *out = callb("close_instance", "(l)", h->handle);
    Py_XDECREF(out);
    LEAVE;
    for (int i = 0; i < h->nrowtabs; i++) free(h->rowtabs[i]);
    free(h->rowtabs);
    free(h);
}

void lammps_command(void *handle, const char *cmd) {
    tpumd_handle *h = (tpumd_handle *)handle;
    ENTER;
    PyObject *out = callb("command", "(ls)", h->handle, cmd);
    Py_XDECREF(out);
    LEAVE;
}

void lammps_commands_string(void *handle, const char *str) {
    tpumd_handle *h = (tpumd_handle *)handle;
    ENTER;
    PyObject *out = callb("commands_string", "(ls)", h->handle, str);
    Py_XDECREF(out);
    LEAVE;
}

void lammps_file(void *handle, const char *path) {
    tpumd_handle *h = (tpumd_handle *)handle;
    ENTER;
    PyObject *out = callb("file", "(ls)", h->handle, path);
    Py_XDECREF(out);
    LEAVE;
}

double lammps_get_natoms(void *handle) {
    tpumd_handle *h = (tpumd_handle *)handle;
    double n = -1.0;
    ENTER;
    PyObject *out = callb("get_natoms", "(l)", h->handle);
    if (out) { n = PyFloat_AsDouble(out); Py_DECREF(out); }
    LEAVE;
    return n;
}

double lammps_get_thermo(void *handle, const char *name) {
    tpumd_handle *h = (tpumd_handle *)handle;
    double v = 0.0;
    ENTER;
    PyObject *out = callb("get_thermo", "(ls)", h->handle, name);
    if (out) { v = PyFloat_AsDouble(out); Py_DECREF(out); }
    LEAVE;
    return v;
}

int lammps_version(void *handle) {
    (void)handle;
    int v = 0;
    ENTER;
    PyObject *out = callb("version", "()");
    if (out) { v = (int)PyLong_AsLong(out); Py_DECREF(out); }
    LEAVE;
    return v;
}

/* keep a row-pointer table alive on the handle */
static void *remember_rowtab(tpumd_handle *h, void *tab) {
    h->rowtabs = (void **)realloc(h->rowtabs,
                                  (h->nrowtabs + 1) * sizeof(void *));
    h->rowtabs[h->nrowtabs++] = tab;
    return tab;
}

/* numpy array -> raw data pointer + shape via the buffer protocol */
static void *array_data(PyObject *arr, Py_ssize_t *n0, Py_ssize_t *n1) {
    Py_buffer view;
    if (PyObject_GetBuffer(arr, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT))
        { PyErr_Print(); return NULL; }
    if (n0) *n0 = view.ndim > 0 ? view.shape[0] : 0;
    if (n1) *n1 = view.ndim > 1 ? view.shape[1] : 0;
    void *data = view.buf;
    PyBuffer_Release(&view);   /* bridge pins the array for us */
    return data;
}

/* lammps_extract_atom: (N,3) doubles -> double** row table; (N,) -> ptr */
void *lammps_extract_atom(void *handle, const char *name) {
    tpumd_handle *h = (tpumd_handle *)handle;
    void *result = NULL;
    ENTER;
    PyObject *out = callb("extract_atom", "(ls)", h->handle, name);
    if (out) {
        Py_ssize_t n0 = 0, n1 = 0;
        void *data = array_data(out, &n0, &n1);
        Py_DECREF(out);        /* bridge holds a reference */
        if (data && n1 == 3) {
            double **rows = (double **)malloc(n0 * sizeof(double *));
            for (Py_ssize_t i = 0; i < n0; i++)
                rows[i] = (double *)data + 3 * i;
            result = remember_rowtab(h, rows);
        } else {
            result = data;
        }
    }
    LEAVE;
    return result;
}

/* simplified gather/scatter: full arrays in tag order, double or int */
void lammps_gather_atoms(void *handle, const char *name, int type,
                         int count, void *data) {
    tpumd_handle *h = (tpumd_handle *)handle;
    ENTER;
    PyObject *out = callb("gather_atoms", "(ls)", h->handle, name);
    if (out) {
        Py_buffer view;
        if (!PyObject_GetBuffer(out, &view, PyBUF_C_CONTIGUOUS)) {
            memcpy(data, view.buf, view.len);
            PyBuffer_Release(&view);
        } else {
            PyErr_Print();
        }
        Py_DECREF(out);
    }
    (void)type; (void)count;
    LEAVE;
}

void lammps_scatter_atoms(void *handle, const char *name, int type,
                          int count, void *data) {
    tpumd_handle *h = (tpumd_handle *)handle;
    ENTER;
    double n = 0.0;
    PyObject *nat = callb("get_natoms", "(l)", h->handle);
    if (nat) { n = PyFloat_AsDouble(nat); Py_DECREF(nat); }
    Py_ssize_t total = (Py_ssize_t)n * count;
    PyObject *list = PyList_New(total);
    for (Py_ssize_t i = 0; i < total; i++) {
        PyObject *v = (type == 1)
            ? PyLong_FromLong(((int *)data)[i])
            : PyFloat_FromDouble(((double *)data)[i]);
        PyList_SET_ITEM(list, i, v);
    }
    PyObject *out = callb("scatter_atoms", "(lsO)", h->handle, name, list);
    Py_DECREF(list);
    Py_XDECREF(out);
    LEAVE;
}
