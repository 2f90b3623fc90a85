"""Packed big-table storage: semantics identical to plain tables (the
CPU path unpacks and gathers; the TPU path uses the Pallas kernel)."""

import numpy as np
import pytest

from deepctr_tpu import inputs as dc_inputs
from deepctr_tpu.features import SparseFeat, DenseFeat
from deepctr_tpu.models import DeepFM


@pytest.fixture(autouse=True)
def _low_threshold(monkeypatch):
    """Lower the packed-storage threshold so tests stay small."""
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 1000)


def _data(N=256, V=2048):
    rng = np.random.default_rng(0)
    x = {"big": rng.integers(0, V, N), "small": rng.integers(0, 10, N),
         "d0": rng.random(N)}
    y = rng.integers(0, 2, N).astype(np.float64)
    cols = [SparseFeat("big", V, 16), SparseFeat("small", 10, 16),
            DenseFeat("d0", 1)]
    return x, y, cols


def test_param_layout_packed():
    x, y, cols = _data()
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    emb = m.params["embedding_dict"]
    assert emb["big"].shape == (2048 // 8, 128)    # packed, not fused
    assert emb["small"].shape == (10, 17)          # fused wide column
    # big's wide table lives separately (width 1, itself packable)
    lin = m.params["linear_model"]["embedding_dict"]
    assert lin["big"].shape == (2048 // 128, 128)


def test_packed_model_trains_and_roundtrips(tmp_path):
    x, y, cols = _data()
    rng = np.random.default_rng(1)
    y = (np.asarray(x["big"]) % 7 == 0).astype(np.float64)
    m = DeepFM(cols, cols, dnn_hidden_units=(16,))
    m.compile("adagrad", "binary_crossentropy", metrics=["auc"])
    h = m.fit(x, y, batch_size=64, epochs=25, validation_split=0.25,
              verbose=0)
    assert h.history["val_auc"][-1] > 0.8
    p = m.predict(x, 64)
    assert np.all(np.isfinite(p))
    import os
    from deepctr_tpu.utils.serialization import save_model, load_model
    path = os.path.join(str(tmp_path), "m.pkl")
    save_model(m, path)
    np.testing.assert_allclose(load_model(path).predict(x, 64), p,
                               atol=1e-6)


def test_packed_matches_unpacked_semantics(monkeypatch):
    """Same trained behavior reachable: manually copy table values from an
    unpacked model into the packed layout and compare predictions."""
    x, y, cols = _data(N=128)
    m_packed = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
    wp = m_packed.get_weights()

    # plain model built AND evaluated with packing disabled (the packing
    # decision is part of the module's apply)
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 10**9)
    m_plain = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=5)
    w = m_plain.get_weights()
    p1 = m_plain.predict(x, 64)
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 1000)

    def copy_matching(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                copy_matching(dst.setdefault(k, {}), v)
            elif k in dst and np.shape(dst[k]) == np.shape(v):
                dst[k] = v
    copy_matching(wp["params"], w["params"])

    # plain: big fused [V, 17]; packed: big deep-only [V/8, 128] + a
    # separate packed width-1 wide table [V/128, 128]
    big_plain = np.asarray(w["params"]["embedding_dict"]["big"])
    wp["params"]["embedding_dict"]["big"] = \
        big_plain[:, :16].reshape(2048 // 8, 128)
    wp["params"]["linear_model"]["embedding_dict"]["big"] = \
        np.ascontiguousarray(big_plain[:, 16]).reshape(2048 // 128, 128)
    m_packed.set_weights(wp)
    p2 = m_packed.predict(x, 64)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_wide_fusion_skipped_when_fused_width_would_pack():
    """dim=15: 128 % 15 != 0 (not packable bare) but 128 % 16 == 0 — the
    FUSED width would pack.  Such tables must not fuse their wide column:
    the column-split regularization assumes fused tables are unpacked
    (width dim+1), so a fused+packed table would l2-regularize packed
    lanes with the wrong strengths."""
    x, y, _ = _data()
    V = 2048
    cols = [SparseFeat("big", V, 15), SparseFeat("small", 10, 15),
            DenseFeat("d0", 1)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    emb = m.params["embedding_dict"]
    assert emb["big"].shape == (V, 15)             # unpacked, NOT fused
    assert emb["small"].shape == (10, 16)          # small: fused as usual
    lin = m.params["linear_model"]["embedding_dict"]
    assert lin["big"].shape == (V // 128, 128)     # separate packed wide
    assert "embedding_dict/big" not in m._wide_cols
