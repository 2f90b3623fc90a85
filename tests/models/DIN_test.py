import numpy as np

from deepctr_tpu.features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.models import DIN
from ..utils import check_model


def get_xy_fd():
    """Deterministic 4-user behavior fixture with shared embedding tables
    between query and history features (mirrors the reference protocol,
    tests/models/DIN_test.py:9-41)."""
    feature_columns = [
        SparseFeat("user", 4, embedding_dim=4),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 3 + 1, embedding_dim=8),
        SparseFeat("cate_id", 2 + 1, embedding_dim=4),
        DenseFeat("pay_score", 1)]
    feature_columns += [
        VarLenSparseFeat(
            SparseFeat("hist_item_id", vocabulary_size=3 + 1,
                       embedding_dim=8, embedding_name="item_id"),
            maxlen=4, length_name="seq_length"),
        VarLenSparseFeat(
            SparseFeat("hist_cate_id", vocabulary_size=2 + 1,
                       embedding_dim=4, embedding_name="cate_id"),
            maxlen=4, length_name="seq_length")]

    behavior_feature_list = ["item_id", "cate_id"]
    feature_dict = {
        "user": np.array([0, 1, 2, 3]),
        "gender": np.array([0, 1, 0, 1]),
        "item_id": np.array([1, 2, 3, 2]),
        "cate_id": np.array([1, 2, 1, 2]),
        "pay_score": np.array([0.1, 0.2, 0.3, 0.2]),
        "hist_item_id": np.array(
            [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0], [1, 2, 0, 0]]),
        "hist_cate_id": np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0], [1, 2, 0, 0]]),
        "seq_length": np.array([3, 3, 2, 2]),
    }
    x = {name: feature_dict[name]
         for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1, 0])
    return x, y, feature_columns, behavior_feature_list


def test_DIN():
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list, dnn_dropout=0.5)
    check_model(model, "DIN", x, y)


def test_DIN_att_weight_normalization():
    x, y, feature_columns, behavior_feature_list = get_xy_fd()
    model = DIN(feature_columns, behavior_feature_list,
                att_weight_normalization=True, att_activation="relu")
    check_model(model, "DIN", x, y, check_model_io=False)


def test_DIN_sparse_packed_matches_dense(monkeypatch):
    """Production DIN shape: the item table is big enough to store
    PACKED and train through the active-rows sparse path; the attention
    over history (explicit length column) must match the dense
    trajectory."""
    from deepctr_tpu import inputs as dc_inputs
    monkeypatch.setattr(dc_inputs, "PACKED_VOCAB_THRESHOLD", 256)
    rng = np.random.default_rng(0)
    N, V, maxlen = 128, 2048, 4
    hist = rng.integers(1, V, (N, maxlen))
    lens = rng.integers(1, maxlen + 1, N)
    hist[np.arange(maxlen)[None, :] >= lens[:, None]] = 0
    cols = [
        SparseFeat("user", 16, embedding_dim=4),
        SparseFeat("item_id", V, embedding_dim=16),
        VarLenSparseFeat(
            SparseFeat("hist_item_id", V, embedding_dim=16,
                       embedding_name="item_id"),
            maxlen=maxlen, length_name="seq_length")]
    x = {"user": rng.integers(0, 16, N),
         "item_id": rng.integers(1, V, N),
         "hist_item_id": hist,
         "seq_length": lens}
    y = rng.integers(0, 2, N).astype(np.float64)

    def run(sparse):
        m = DIN(cols, ["item_id"], dnn_hidden_units=(8,), seed=3,
                l2_reg_embedding=0, l2_reg_dnn=0)
        m.compile("adagrad", "binary_crossentropy",
                  sparse_table_updates=sparse)
        if sparse:
            assert any("item_id" in s[0] for s in m._sparse_specs)
        m.fit(x, y, batch_size=32, epochs=2, verbose=0, shuffle=False)
        return m.predict(x, 32)

    np.testing.assert_allclose(run(False), run(True), atol=2e-5)
