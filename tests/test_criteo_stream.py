"""Native Criteo reader + streaming pipeline tests.

The native parser (native/src/batcher.cc::dctr_parse_criteo) and its
numpy fallback must agree exactly; criteo_stream must feed fit()
end-to-end (reference data-flow parity: examples/run_classification_
criteo.py, reimagined as an out-of-core stream)."""

import os

import numpy as np
import pytest

from deepctr_tpu import native
from deepctr_tpu.data import criteo_columns, criteo_stream

SAMPLE = os.path.join(os.path.dirname(__file__), "..", "examples", "data",
                      "criteo_sample.txt")


def _make_csv(tmp_path, n=100, n_dense=3, n_sparse=4, header=True,
              sep=",", trailing_newline=True):
    rng = np.random.default_rng(0)
    lines = []
    if header:
        cols = (["label"] + ["I%d" % (i + 1) for i in range(n_dense)]
                + ["C%d" % (i + 1) for i in range(n_sparse)])
        lines.append(sep.join(cols))
    for r in range(n):
        f = [str(rng.integers(0, 2))]
        for i in range(n_dense):
            f.append("" if rng.random() < 0.3
                     else str(round(float(rng.random() * 100), 2)))
        for i in range(n_sparse):
            f.append("" if rng.random() < 0.2
                     else "%08x" % rng.integers(0, 2 ** 32))
        lines.append(sep.join(f))
    text = "\n".join(lines) + ("\n" if trailing_newline else "")
    p = tmp_path / "sample.csv"
    p.write_bytes(text.encode())
    return str(p), lines[1 if header else 0:]


def test_native_matches_fallback(tmp_path):
    path, _ = _make_csv(tmp_path, n=200)
    buf = open(path, "rb").read()
    # skip header
    buf = buf.split(b"\n", 1)[1]
    vocabs = [50, 1000, 7, 123456]
    got = native.parse_criteo(buf, 3, 4, vocabs)
    lib = native._load()
    if lib is None:
        pytest.skip("no native toolchain")
    # force the numpy fallback through the module-level switch
    native._lib, saved = None, native._lib
    try:
        want = native.parse_criteo(buf, 3, 4, vocabs)
    finally:
        native._lib = saved
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)
    np.testing.assert_array_equal(got[2], want[2])
    assert got[3] == want[3]


def test_parse_semantics():
    buf = b"1,3,,0.5,aa,,bb\n0,,2.25,7,,cc,\n"
    y, dense, sparse, consumed = native.parse_criteo(
        buf, 3, 3, [100, 100, 100], log_dense=False)
    assert consumed == len(buf)
    np.testing.assert_array_equal(y, [1.0, 0.0])
    np.testing.assert_allclose(dense, [[3.0, 0.0, 0.5], [0.0, 2.25, 7.0]])
    # empty categorical -> id 0; non-empty -> FNV-1a % vocab
    assert sparse[0, 1] == 0 and sparse[1, 0] == 0 and sparse[1, 2] == 0
    h = native._fnv1a(b"aa") % 100
    assert sparse[0, 0] == h
    # incomplete trailing line is not consumed
    y2, _, _, c2 = native.parse_criteo(buf + b"1,1,1,1,x,y,z", 3, 3,
                                       [100, 100, 100])
    assert c2 == len(buf) and len(y2) == 2


def test_parse_short_row_zero_fills():
    # a truncated/short line must read missing fields as 0 (both paths
    # used to return np.empty garbage from the native parser)
    buf = b"1,1,2,a,b\n0,5\n"
    y, dense, sparse, consumed = native.parse_criteo(
        buf, 2, 2, [100, 100], log_dense=False)
    assert consumed == len(buf)
    np.testing.assert_array_equal(y, [1.0, 0.0])
    np.testing.assert_allclose(dense[1], [5.0, 0.0])
    np.testing.assert_array_equal(sparse[1], [0.0, 0.0])


def test_log_dense():
    buf = b"0,10,,-3,aa\n"
    _, dense, _, _ = native.parse_criteo(buf, 3, 1, [10], log_dense=True)
    np.testing.assert_allclose(
        dense[0], [np.log1p(10.0), 0.0, 0.0], rtol=1e-6)


def test_stream_chunks_and_carry(tmp_path):
    path, rows = _make_csv(tmp_path, n=57, trailing_newline=False)
    cols = criteo_columns(vocab_size=64, embedding_dim=4,
                          n_dense=3, n_sparse=4)
    # tiny read_bytes forces many partial-line carries
    gen = criteo_stream(path, cols, chunk_rows=10, read_bytes=64)
    total = 0
    for x, y in gen():
        n = len(y)
        assert n <= 10
        assert set(x) == {f.name for f in cols}
        for v in x.values():
            assert len(v) == n
        total += n
    assert total == 57
    # second invocation re-opens and yields the same count
    assert sum(len(y) for _, y in gen()) == 57


def test_stream_fit_end_to_end(tmp_path):
    pytest.importorskip("jax")
    from deepctr_tpu.models import DeepFM

    path, _ = _make_csv(tmp_path, n=300, n_dense=2, n_sparse=3)
    cols = criteo_columns(vocab_size=32, embedding_dim=4,
                          n_dense=2, n_sparse=3)
    model = DeepFM(cols, cols, dnn_hidden_units=(8,))
    model.compile("adagrad", "binary_crossentropy", metrics=[])
    h = model.fit(criteo_stream(path, cols, chunk_rows=128),
                  batch_size=64, epochs=2, verbose=0)
    assert len(h.history["loss"]) == 2
    assert np.isfinite(h.history["loss"]).all()


def test_vendored_sample_parses():
    if not os.path.exists(SAMPLE):
        pytest.skip("sample not vendored")
    cols = criteo_columns(vocab_size=10000, embedding_dim=4)
    gen = criteo_stream(SAMPLE, cols)
    chunks = list(gen())
    total = sum(len(y) for _, y in chunks)
    assert total > 100   # vendored sample has ~200 rows
    x, y = chunks[0]
    assert set(np.unique(y)) <= {0.0, 1.0}
    for i in range(1, 27):
        assert (x["C%d" % i] < 10000).all() and (x["C%d" % i] >= 0).all()


def test_parse_fuzz_no_crash():
    """Random byte soup through the C++ parser: never crash, ids always
    in range, consumed bounded by the buffer (memory-safety regression
    net for the native code path)."""
    rng = np.random.default_rng(0)
    alphabet = list(b"0123456789.,-abcXYZ\t\n\r ,")
    for trial in range(400):
        n = int(rng.integers(0, 200))
        buf = bytes(rng.choice(alphabet, n).tolist())
        nd = int(rng.integers(0, 5))
        ns = int(rng.integers(0, 5))
        vocabs = rng.integers(1, 1000, ns).tolist() if ns else [1]
        y, d, s, c = native.parse_criteo(buf, nd, ns, vocabs, sep=",",
                                         log_dense=bool(trial % 2))
        assert 0 <= c <= len(buf)
        if ns and len(s):
            assert (s >= 0).all()
            assert (s < np.asarray(vocabs)[None, :]).all()
