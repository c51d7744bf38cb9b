/* hostops: native host-side pixel ops for the video I/O path.
 *
 * The TPU compute path is JAX/XLA; the host runtime around it (decode,
 * colorspace/normalisation, staging) benefits from tight native loops.  This
 * CPython extension provides the conversion/resize kernels used by
 * utils/video.py (falling back to numpy when the extension isn't built):
 *
 *   u8_to_f01(u8 array)           -> float32 array scaled to [0, 1]
 *   f01_to_u8(float32 array)      -> clipped uint8 array scaled by 255
 *   resize_bilinear_u8(img, h, w) -> resized (H, W, C) uint8 image
 *
 * Built with -O3 -march=native via setup_native.py; no external deps.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

static PyObject *u8_to_f01(PyObject *self, PyObject *args) {
  PyArrayObject *in;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &in)) return NULL;
  if (PyArray_TYPE(in) != NPY_UINT8) {
    PyErr_SetString(PyExc_TypeError, "expected uint8 array");
    return NULL;
  }
  PyArrayObject *contig =
      (PyArrayObject *)PyArray_GETCONTIGUOUS((PyArrayObject *)in);
  if (!contig) return NULL;
  PyArrayObject *out = (PyArrayObject *)PyArray_SimpleNew(
      PyArray_NDIM(contig), PyArray_DIMS(contig), NPY_FLOAT32);
  if (!out) {
    Py_DECREF(contig);
    return NULL;
  }
  const uint8_t *src = (const uint8_t *)PyArray_DATA(contig);
  float *dst = (float *)PyArray_DATA(out);
  npy_intp n = PyArray_SIZE(contig);
  /* lookup table: one multiply-free conversion per byte */
  static float lut[256];
  static int lut_init = 0;
  if (!lut_init) {
    for (int i = 0; i < 256; i++) lut[i] = (float)i / 255.0f;
    lut_init = 1;
  }
  for (npy_intp i = 0; i < n; i++) dst[i] = lut[src[i]];
  Py_DECREF(contig);
  return (PyObject *)out;
}

static PyObject *f01_to_u8(PyObject *self, PyObject *args) {
  PyArrayObject *in;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &in)) return NULL;
  if (PyArray_TYPE(in) != NPY_FLOAT32) {
    PyErr_SetString(PyExc_TypeError, "expected float32 array");
    return NULL;
  }
  PyArrayObject *contig =
      (PyArrayObject *)PyArray_GETCONTIGUOUS((PyArrayObject *)in);
  if (!contig) return NULL;
  PyArrayObject *out = (PyArrayObject *)PyArray_SimpleNew(
      PyArray_NDIM(contig), PyArray_DIMS(contig), NPY_UINT8);
  if (!out) {
    Py_DECREF(contig);
    return NULL;
  }
  const float *src = (const float *)PyArray_DATA(contig);
  uint8_t *dst = (uint8_t *)PyArray_DATA(out);
  npy_intp n = PyArray_SIZE(contig);
  for (npy_intp i = 0; i < n; i++) {
    float v = src[i] * 255.0f + 0.5f;
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    dst[i] = (uint8_t)v;
  }
  Py_DECREF(contig);
  return (PyObject *)out;
}

static PyObject *resize_bilinear_u8(PyObject *self, PyObject *args) {
  PyArrayObject *in;
  int out_h, out_w;
  if (!PyArg_ParseTuple(args, "O!ii", &PyArray_Type, &in, &out_h, &out_w))
    return NULL;
  if (PyArray_TYPE(in) != NPY_UINT8 || PyArray_NDIM(in) != 3) {
    PyErr_SetString(PyExc_TypeError, "expected (H, W, C) uint8 array");
    return NULL;
  }
  PyArrayObject *contig =
      (PyArrayObject *)PyArray_GETCONTIGUOUS((PyArrayObject *)in);
  if (!contig) return NULL;
  npy_intp in_h = PyArray_DIM(contig, 0);
  npy_intp in_w = PyArray_DIM(contig, 1);
  npy_intp ch = PyArray_DIM(contig, 2);
  npy_intp dims[3] = {out_h, out_w, ch};
  PyArrayObject *out =
      (PyArrayObject *)PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!out) {
    Py_DECREF(contig);
    return NULL;
  }
  const uint8_t *src = (const uint8_t *)PyArray_DATA(contig);
  uint8_t *dst = (uint8_t *)PyArray_DATA(out);
  /* half-pixel-centre bilinear (matches cv2.INTER_LINEAR / torch
     align_corners=False) */
  float sy = (float)in_h / out_h, sx = (float)in_w / out_w;
  for (int y = 0; y < out_h; y++) {
    float fy = ((float)y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > in_h - 1) fy = (float)(in_h - 1);
    npy_intp y0 = (npy_intp)fy;
    npy_intp y1 = y0 + 1 < in_h ? y0 + 1 : in_h - 1;
    float wy = fy - y0;
    for (int x = 0; x < out_w; x++) {
      float fx = ((float)x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > in_w - 1) fx = (float)(in_w - 1);
      npy_intp x0 = (npy_intp)fx;
      npy_intp x1 = x0 + 1 < in_w ? x0 + 1 : in_w - 1;
      float wx = fx - x0;
      for (npy_intp c = 0; c < ch; c++) {
        float v00 = src[(y0 * in_w + x0) * ch + c];
        float v01 = src[(y0 * in_w + x1) * ch + c];
        float v10 = src[(y1 * in_w + x0) * ch + c];
        float v11 = src[(y1 * in_w + x1) * ch + c];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        dst[((npy_intp)y * out_w + x) * ch + c] =
            (uint8_t)(top + (bot - top) * wy + 0.5f);
      }
    }
  }
  Py_DECREF(contig);
  return (PyObject *)out;
}

static PyMethodDef Methods[] = {
    {"u8_to_f01", u8_to_f01, METH_VARARGS, "uint8 -> float32 in [0,1]"},
    {"f01_to_u8", f01_to_u8, METH_VARARGS, "float32 [0,1] -> uint8"},
    {"resize_bilinear_u8", resize_bilinear_u8, METH_VARARGS,
     "bilinear resize of (H,W,C) uint8"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "hostops", NULL,
                                       -1, Methods};

PyMODINIT_FUNC PyInit_hostops(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
