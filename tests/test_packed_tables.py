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
    # big is fused (width 17) AND packed: 7 logical rows per 128-lane
    # physical row (9 waste lanes), ceil(2048/7) = 293 physical rows
    assert emb["big"].shape == (293, 128)
    assert emb["small"].shape == (10, 17)          # fused wide column
    # no separate wide table: the wide weight rides in the packed rows
    lin = m.params.get("linear_model", {}).get("embedding_dict", {})
    assert "big" not in lin
    assert "embedding_dict/big" in m._wide_cols


def test_packed_model_trains_and_roundtrips(tmp_path):
    x, y, cols = _data()
    rng = np.random.default_rng(1)
    y = (np.asarray(x["big"]) % 7 == 0).astype(np.float64)
    m = DeepFM(cols, cols, dnn_hidden_units=(16,))
    m.compile("adagrad", "binary_crossentropy", metrics=["auc"])
    h = m.fit(x, y, batch_size=64, epochs=40, validation_split=0.25,
              verbose=0)
    # label is a function of the big id: train-set memorization must be
    # near-perfect; val AUC is limited by ids unseen in training
    assert m.evaluate(x, y, 64)["auc"] > 0.95
    assert h.history["val_auc"][-1] > 0.7
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

    # plain: big fused [V, 17]; packed: [ceil(V/7), 128] with logical
    # row i at physical (i // 7), lanes [(i % 7)*17, (i % 7)*17 + 17)
    big_plain = np.asarray(w["params"]["embedding_dict"]["big"])
    V, width, pack = 2048, 17, 7
    rows = -(-V // pack)
    packed = np.zeros((rows, 128), np.float32)
    for i in range(V):
        packed[i // pack, (i % pack) * width:(i % pack + 1) * width] = \
            big_plain[i]
    wp["params"]["embedding_dict"]["big"] = packed
    m_packed.set_weights(wp)
    p2 = m_packed.predict(x, 64)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_fused_width_packs_with_waste_lanes():
    """dim=15: fused width 16 divides 128 (pack 8, no waste); dim=16:
    fused width 17 packs 7 with 9 waste lanes.  Both fuse + pack — no
    separate wide table, so every id span has exactly one consumer and
    the active-rows step can own it."""
    V = 2048
    cols = [SparseFeat("big", V, 15), SparseFeat("small", 10, 15),
            DenseFeat("d0", 1)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,))
    emb = m.params["embedding_dict"]
    assert emb["big"].shape == (V // 8, 128)       # width 16, pack 8
    assert emb["small"].shape == (10, 16)
    assert "big" not in m.params.get("linear_model", {}).get(
        "embedding_dict", {})
    assert "embedding_dict/big" in m._wide_cols


def test_packed_fused_reg_lane_masks():
    """L2 strengths on a packed+fused table follow the lane layout: deep
    lanes get l2_reg_embedding, the fused wide lane l2_reg_linear, waste
    lanes nothing (round-1 bug: column-split reg assumed fused tables
    are never packed)."""
    V = 2048
    cols = [SparseFeat("big", V, 16), DenseFeat("d0", 1)]
    m = DeepFM(cols, cols, dnn_hidden_units=(8,),
               l2_reg_embedding=0.5, l2_reg_linear=0.25)
    layouts = m._table_layouts()
    assert layouts["embedding_dict/big"] == (17, 16, 7)
    vec = np.asarray(m._table_l2_vec(
        "embedding_dict/big", m.params["embedding_dict"]["big"]))
    expect = np.zeros(128, np.float32)
    for j in range(7):
        expect[j * 17:j * 17 + 16] = 0.5
        expect[j * 17 + 16] = 0.25
    np.testing.assert_array_equal(vec, expect)

    # the dense-path reg_fn must weigh lanes the same way
    import jax.numpy as jnp
    m.compile("adam", "binary_crossentropy")
    reg_fn = m._build_reg_fn()
    w = np.asarray(m.params["embedding_dict"]["big"])
    got = float(reg_fn(m.params))
    manual_big = float(np.sum(expect[None, :] * w ** 2))
    assert manual_big > 0
    # zero out the big table: reg drops by exactly manual_big
    params2 = dict(m.params)
    emb2 = dict(params2["embedding_dict"]); emb2["big"] = jnp.zeros_like(w)
    params2["embedding_dict"] = emb2
    np.testing.assert_allclose(got - float(reg_fn(params2)), manual_big,
                               rtol=1e-5)
