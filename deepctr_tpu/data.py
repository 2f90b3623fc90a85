"""Out-of-core data pipelines (TPU addition; the reference holds every
dataset in host memory as a pandas frame — examples/run_classification_
criteo.py:21-46 — which caps it at toy scale).

``criteo_stream`` turns a Criteo-format file of any size into the
zero-arg chunk-iterator callable that ``BaseModel.fit`` accepts
(``fit(x=criteo_stream(...), ...)``), with parsing + feature hashing in
the native C++ reader (native/src/batcher.cc::dctr_parse_criteo, ~GB/s
multi-threaded) and a numpy fallback when no toolchain is present.
"""

import os

import numpy as np

from . import native
from .features import DenseFeat, SparseFeat


def criteo_columns(vocab_size=1_000_000, embedding_dim=16,
                   n_dense=13, n_sparse=26):
    """Feature columns for the standard Criteo display-ads layout:
    ``C1..C{n_sparse}`` hashed onto ``vocab_size`` buckets plus
    ``I1..I{n_dense}`` log-transformed dense fields."""
    return ([SparseFeat("C%d" % (i + 1), vocab_size, embedding_dim)
             for i in range(n_sparse)]
            + [DenseFeat("I%d" % (i + 1), 1) for i in range(n_dense)])


def criteo_stream(path, feature_columns, chunk_rows=262144, sep=None,
                  log_dense=True, read_bytes=1 << 24):
    """Stream a Criteo-format file as ``fit``-ready chunks.

    Returns a zero-arg callable; each invocation re-opens ``path`` and
    yields ``(x_dict, y)`` chunks of up to ``chunk_rows`` rows, where
    ``x_dict`` maps the sparse/dense names in ``feature_columns`` to
    hashed id / log1p-transformed columns.  Pass the callable straight to
    ``model.fit(x=..., batch_size=...)`` (see BaseModel._fit_stream).

    ``sep=None`` SNIFFS the first line's bytes: '\\t' when it contains a
    tab and no comma, ',' otherwise.  Pass ``sep`` explicitly for files
    the sniff could misread (e.g. a TSV whose first row embeds commas
    inside field values).  A leading ``label,...`` header row is skipped
    automatically.
    """
    sparse_names = [f.name for f in feature_columns
                    if isinstance(f, SparseFeat)]
    dense_names = [f.name for f in feature_columns
                   if isinstance(f, DenseFeat)]
    vocabs = [f.vocabulary_size for f in feature_columns
              if isinstance(f, SparseFeat)]
    n_sparse, n_dense = len(sparse_names), len(dense_names)

    if sep is None:
        with open(path, "rb") as fh:
            first = fh.readline()
        sep = "\t" if (b"\t" in first and b"," not in first) else ","

    def gen():
        with open(path, "rb") as fh:
            first = fh.readline()
            if not first.lower().startswith(b"label"):
                fh.seek(0)
            buf = b""
            eof = False
            while True:
                if not eof:
                    block = fh.read(read_bytes)
                    if block:
                        buf += block
                    else:
                        eof = True
                        if buf and not buf.endswith(b"\n"):
                            buf += b"\n"   # final unterminated line
                # drain every full chunk the buffer holds before reading
                # more (keeps memory at ~read_bytes regardless of
                # chunk_rows)
                while True:
                    y, dense, sparse, consumed = native.parse_criteo(
                        buf, n_dense, n_sparse, vocabs, sep=sep,
                        log_dense=log_dense, max_rows=chunk_rows)
                    buf = buf[consumed:]
                    if len(y):
                        x = {name: sparse[:, i]
                             for i, name in enumerate(sparse_names)}
                        x.update({name: dense[:, i]
                                  for i, name in enumerate(dense_names)})
                        yield x, y
                    if len(y) < chunk_rows:
                        break
                if eof:
                    break

    return gen
