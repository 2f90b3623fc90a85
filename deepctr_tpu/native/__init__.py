"""ctypes bindings for the native host-side runtime (src/batcher.cc).

The shared library is built on first use with g++ (cached next to the
source); every entry point has a numpy fallback so the framework works
without a toolchain.  See src/batcher.cc for what lives natively and why.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "batcher.cc")
_LIB_PATH = os.path.join(_HERE, "_batcher.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH, _SRC, "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dctr_assemble.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int64]
            lib.dctr_take_rows.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64]
            lib.dctr_hash_strings.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.dctr_hash_i64.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.dctr_parse_criteo.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_char,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64)]
            lib.dctr_parse_criteo.restype = ctypes.c_int64
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    return _load() is not None


def assemble(arrays):
    """Column-concat a list of 2-D float32 arrays -> [rows, total] f32."""
    lib = _load()
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    rows = arrays[0].shape[0]
    # the C++ kernel reads `rows` rows from EVERY source — a shorter
    # array would be read out of bounds, so mismatches must fail here
    bad = [i for i, a in enumerate(arrays) if a.shape[0] != rows]
    if bad:
        raise ValueError(
            "assemble: all arrays must have the same number of rows; "
            "array 0 has %d but array %d has %d"
            % (rows, bad[0], arrays[bad[0]].shape[0]))
    widths = np.array([a.shape[1] for a in arrays], dtype=np.int32)
    total = int(widths.sum())
    if lib is None:
        return np.concatenate(arrays, axis=1)
    out = np.empty((rows, total), np.float32)
    src_ptrs = (ctypes.POINTER(ctypes.c_float) * len(arrays))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays])
    lib.dctr_assemble(out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      src_ptrs,
                      widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                      len(arrays), rows)
    return out


def take_rows(matrix, idx):
    """matrix[idx] for a 2-D float32 matrix and int64 indices."""
    lib = _load()
    matrix = np.ascontiguousarray(matrix, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None:
        return matrix[idx]
    out = np.empty((len(idx), matrix.shape[1]), np.float32)
    lib.dctr_take_rows(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        matrix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), matrix.shape[1])
    return out


def hash_to_bucket(values, vocabulary_size):
    """Feature hashing onto [0, vocabulary_size): SparseFeat(use_hash=True).

    Accepts an integer array or an array/list of str/bytes.  FNV-1a both
    natively and in the fallback, so ids are stable across builds.
    """
    values = np.asarray(values)
    lib = _load()
    if np.issubdtype(values.dtype, np.integer):
        vals = np.ascontiguousarray(values.reshape(-1), dtype=np.int64)
        out = np.empty(vals.shape, np.int64)
        if lib is not None:
            lib.dctr_hash_i64(
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                vals.size, vocabulary_size,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        else:
            for i, v in enumerate(vals):
                out[i] = _fnv1a(np.int64(v).tobytes()) % vocabulary_size
        return out.reshape(values.shape)
    flat = values.reshape(-1)
    enc = [v if isinstance(v, bytes) else str(v).encode("utf-8")
           for v in flat]
    out = np.empty(len(enc), np.int64)
    if lib is not None:
        arr = (ctypes.c_char_p * len(enc))(*enc)
        lens = np.array([len(e) for e in enc], np.int64)
        lib.dctr_hash_strings(
            arr, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(enc), vocabulary_size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    else:
        for i, e in enumerate(enc):
            out[i] = _fnv1a(e) % vocabulary_size
    return out.reshape(values.shape)


def parse_criteo(buf, n_dense, n_sparse, vocabs, sep=",", log_dense=True,
                 max_rows=None):
    """Parse a bytes buffer of Criteo-format lines (label, I*, C*).

    Returns ``(y [n] f32, dense [n, n_dense] f32, sparse [n, n_sparse]
    f32 hashed ids, consumed_bytes)``; only complete lines are consumed,
    so callers stream a file in arbitrary read sizes and carry the tail.
    Categorical fields are FNV-1a-hashed onto [0, vocabs[i]) (empty ->
    0); dense fields get log1p(max(v, 0)) when ``log_dense`` (the
    streaming replacement for the reference recipe's global
    MinMaxScaler).
    """
    lib = _load()
    if max_rows is None:
        max_rows = buf.count(b"\n")
    vocabs = np.ascontiguousarray(
        np.broadcast_to(np.asarray(vocabs, np.int64), (n_sparse,)))
    # zeros, not empty: the C++ parser writes only the fields PRESENT on
    # each line, so short/truncated rows must read as 0 (missing-value
    # semantics, matching the numpy fallback), not uninitialized memory
    y = np.zeros((max_rows,), np.float32)
    dense = np.zeros((max_rows, max(n_dense, 1)), np.float32)
    sparse = np.zeros((max_rows, max(n_sparse, 1)), np.float32)
    if lib is not None:
        consumed = ctypes.c_int64(0)
        rows = lib.dctr_parse_criteo(
            buf, len(buf), max_rows, n_dense, n_sparse,
            vocabs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            sep.encode()[0] if isinstance(sep, str) else sep,
            1 if log_dense else 0,
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dense.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            sparse.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(consumed))
        return (y[:rows], dense[:rows, :n_dense], sparse[:rows, :n_sparse],
                consumed.value)
    # numpy fallback (same semantics, FNV-1a included)
    sep_b = sep if isinstance(sep, str) else sep.decode()
    consumed = 0
    rows = 0
    for line in buf.splitlines(keepends=True):
        if not line.endswith(b"\n") or rows >= max_rows:
            break
        consumed += len(line)
        text = line.rstrip(b"\r\n")
        if not text:
            continue
        parts = text.split(sep_b.encode())
        y[rows] = 1.0 if parts[0] == b"1" else 0.0
        for i in range(n_dense):
            f = parts[1 + i] if 1 + i < len(parts) else b""
            v = float(f) if f else 0.0
            dense[rows, i] = np.log1p(max(v, 0.0)) if log_dense else v
        for i in range(n_sparse):
            f = parts[1 + n_dense + i] if 1 + n_dense + i < len(parts) \
                else b""
            sparse[rows, i] = (_fnv1a(f) % int(vocabs[i])) if f else 0
        rows += 1
    return (y[:rows], dense[:rows, :n_dense], sparse[:rows, :n_sparse],
            consumed)


def _fnv1a(data):
    h = 1469598103934665603
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h
