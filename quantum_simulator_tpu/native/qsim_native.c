/* _qsim_native: C hot paths for host-side result processing.
 *
 * The engine's device work is JAX/XLA; this module covers the
 * host-side loops that remain after device results land: turning count
 * histograms into {bitstring: count} dicts (the GUI/bridge/script result
 * format, up to 2^n entries) and packing bit matrices into basis indices.
 * Pure C99 + CPython API + buffer protocol — no NumPy C API dependency.
 *
 * Reference equivalents being accelerated:
 *   quantum_sim/engine/measurement.py:56-58 (dict comprehension over 2^n)
 *   quantum_sim/engine/noise.py:128-139     (per-shot bitstring packing)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* Write the n-bit binary representation of idx into buf (no terminator). */
static inline void
format_bits(char *buf, uint64_t idx, int num_qubits)
{
    for (int b = 0; b < num_qubits; b++) {
        buf[b] = (char)('0' + ((idx >> (num_qubits - 1 - b)) & 1u));
    }
}

/* counts_from_array(counts_buffer, num_qubits) -> dict[str, int]
 *
 * counts_buffer: any C-contiguous buffer of int64 (e.g. a NumPy array via
 * memoryview). Zero entries are skipped.
 */
static PyObject *
counts_from_array(PyObject *self, PyObject *args)
{
    PyObject *obj;
    int num_qubits;
    if (!PyArg_ParseTuple(args, "Oi", &obj, &num_qubits)) {
        return NULL;
    }
    if (num_qubits < 1 || num_qubits > 63) {
        PyErr_SetString(PyExc_ValueError, "num_qubits must be in [1, 63]");
        return NULL;
    }

    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) < 0) {
        return NULL;
    }
    if (view.itemsize != 8 || view.format == NULL
        || (strcmp(view.format, "l") != 0 && strcmp(view.format, "q") != 0)) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError,
                        "expected a contiguous int64 buffer");
        return NULL;
    }

    const int64_t *data = (const int64_t *)view.buf;
    Py_ssize_t n = view.len / 8;

    PyObject *dict = PyDict_New();
    if (dict == NULL) {
        PyBuffer_Release(&view);
        return NULL;
    }

    char buf[64];
    for (Py_ssize_t i = 0; i < n; i++) {
        if (data[i] == 0) {
            continue;
        }
        format_bits(buf, (uint64_t)i, num_qubits);
        PyObject *key = PyUnicode_FromStringAndSize(buf, num_qubits);
        PyObject *val = PyLong_FromLongLong(data[i]);
        if (key == NULL || val == NULL
            || PyDict_SetItem(dict, key, val) < 0) {
            Py_XDECREF(key);
            Py_XDECREF(val);
            Py_DECREF(dict);
            PyBuffer_Release(&view);
            return NULL;
        }
        Py_DECREF(key);
        Py_DECREF(val);
    }

    PyBuffer_Release(&view);
    return dict;
}

/* histogram_from_indices(indices_buffer, num_qubits) -> dict[str, int]
 *
 * indices_buffer: C-contiguous int64 sampled basis indices (one entry per
 * shot). Builds the counts dict directly without a dense 2^n histogram.
 */
static PyObject *
histogram_from_indices(PyObject *self, PyObject *args)
{
    PyObject *obj;
    int num_qubits;
    if (!PyArg_ParseTuple(args, "Oi", &obj, &num_qubits)) {
        return NULL;
    }
    if (num_qubits < 1 || num_qubits > 63) {
        PyErr_SetString(PyExc_ValueError, "num_qubits must be in [1, 63]");
        return NULL;
    }

    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) < 0) {
        return NULL;
    }
    if (view.itemsize != 8) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_TypeError, "expected an int64 buffer");
        return NULL;
    }

    const int64_t *data = (const int64_t *)view.buf;
    Py_ssize_t n = view.len / 8;

    PyObject *dict = PyDict_New();
    if (dict == NULL) {
        PyBuffer_Release(&view);
        return NULL;
    }

    char buf[64];
    for (Py_ssize_t i = 0; i < n; i++) {
        format_bits(buf, (uint64_t)data[i], num_qubits);
        PyObject *key = PyUnicode_FromStringAndSize(buf, num_qubits);
        if (key == NULL) {
            goto fail;
        }
        PyObject *existing = PyDict_GetItem(dict, key); /* borrowed */
        long long current = existing ? PyLong_AsLongLong(existing) : 0;
        PyObject *val = PyLong_FromLongLong(current + 1);
        if (val == NULL || PyDict_SetItem(dict, key, val) < 0) {
            Py_XDECREF(val);
            Py_DECREF(key);
            goto fail;
        }
        Py_DECREF(val);
        Py_DECREF(key);
    }

    PyBuffer_Release(&view);
    return dict;

fail:
    Py_DECREF(dict);
    PyBuffer_Release(&view);
    return NULL;
}

/* pack_bits(bits_buffer, rows, num_qubits) -> list[int]
 *
 * bits_buffer: C-contiguous uint8 matrix (rows x num_qubits) of 0/1
 * values; returns the basis index of each row (qubit 0 = MSB).
 */
static PyObject *
pack_bits(PyObject *self, PyObject *args)
{
    PyObject *obj;
    Py_ssize_t rows;
    int num_qubits;
    if (!PyArg_ParseTuple(args, "Oni", &obj, &rows, &num_qubits)) {
        return NULL;
    }

    Py_buffer view;
    if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO) < 0) {
        return NULL;
    }
    if (view.len < rows * (Py_ssize_t)num_qubits) {
        PyBuffer_Release(&view);
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        return NULL;
    }

    const uint8_t *bits = (const uint8_t *)view.buf;
    PyObject *out = PyList_New(rows);
    if (out == NULL) {
        PyBuffer_Release(&view);
        return NULL;
    }
    for (Py_ssize_t r = 0; r < rows; r++) {
        uint64_t idx = 0;
        const uint8_t *row = bits + r * num_qubits;
        for (int b = 0; b < num_qubits; b++) {
            idx = (idx << 1) | (row[b] & 1u);
        }
        PyObject *val = PyLong_FromUnsignedLongLong(idx);
        if (val == NULL) {
            Py_DECREF(out);
            PyBuffer_Release(&view);
            return NULL;
        }
        PyList_SET_ITEM(out, r, val);
    }

    PyBuffer_Release(&view);
    return out;
}

static PyMethodDef Methods[] = {
    {"counts_from_array", counts_from_array, METH_VARARGS,
     "Dense int64 histogram -> {bitstring: count} dict (zeros skipped)."},
    {"histogram_from_indices", histogram_from_indices, METH_VARARGS,
     "Sampled int64 basis indices -> {bitstring: count} dict."},
    {"pack_bits", pack_bits, METH_VARARGS,
     "uint8 (rows x n) bit matrix -> list of basis indices."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_qsim_native",
    "C hot paths for host-side result processing.", -1, Methods,
};

PyMODINIT_FUNC
PyInit__qsim_native(void)
{
    return PyModule_Create(&moduledef);
}
