import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepctr_tpu.features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.models import DIEN
from deepctr_tpu.models.dien import InterestEvolving
from ..utils import check_model


@pytest.mark.parametrize("gru_type", ["AIGRU", "AUGRU", "AGRU", "GRU"])
def test_InterestEvolving(gru_type):
    """Standalone evolving-layer shape test (mirrors the reference's
    tests/models/DIEN_test.py:10-32)."""
    mod = InterestEvolving(input_size=3, gru_type=gru_type)
    query = jnp.array([[1, 1, 1], [0.1, 0.2, 0.3]], jnp.float32)
    keys = jnp.array([
        [[0.1, 0.2, 0.3], [1, 2, 3], [0.4, 0.2, 1], [0.0, 0.0, 0.0]],
        [[0.1, 0.2, 0.3], [1, 2, 3], [0.4, 0.2, 1], [0.5, 0.5, 0.5]],
    ], jnp.float32)
    keys_length = jnp.array([3, 4], jnp.int32)
    variables = mod.init(jax.random.PRNGKey(0), query, keys, keys_length)
    out = mod.apply(variables, query, keys, keys_length)
    assert out.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def get_xy_fd(use_neg=False):
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
    if use_neg:
        feature_dict["neg_hist_item_id"] = np.array(
            [[1, 2, 3, 0], [1, 2, 3, 0], [1, 2, 0, 0], [1, 2, 0, 0]])
        feature_dict["neg_hist_cate_id"] = np.array(
            [[1, 1, 2, 0], [2, 1, 1, 0], [2, 1, 0, 0], [1, 2, 0, 0]])
        feature_columns += [
            VarLenSparseFeat(
                SparseFeat("neg_hist_item_id", vocabulary_size=3 + 1,
                           embedding_dim=8, embedding_name="item_id"),
                maxlen=4, length_name="seq_length"),
            VarLenSparseFeat(
                SparseFeat("neg_hist_cate_id", vocabulary_size=2 + 1,
                           embedding_dim=4, embedding_name="cate_id"),
                maxlen=4, length_name="seq_length")]
    x = {name: feature_dict[name]
         for name in get_feature_names(feature_columns)}
    y = np.array([1, 0, 1, 0])
    return x, y, feature_columns, behavior_feature_list


@pytest.mark.parametrize("gru_type,use_neg",
                         [("AIGRU", True), ("AIGRU", False),
                          ("AUGRU", True), ("AUGRU", False),
                          ("AGRU", True), ("AGRU", False),
                          ("GRU", True), ("GRU", False)])
def test_DIEN(gru_type, use_neg):
    x, y, feature_columns, behavior_feature_list = get_xy_fd(use_neg=use_neg)
    model = DIEN(feature_columns, behavior_feature_list, gru_type=gru_type,
                 use_negsampling=use_neg, dnn_hidden_units=(4, 4, 4),
                 dnn_dropout=0.5)
    check_model(model, "DIEN_" + gru_type, x, y, check_model_io=True)
