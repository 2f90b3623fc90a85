"""Reference-parity accessor APIs on the model wrapper:
get_regularization_loss (reference basemodel.py:412-428) and
input_from_feature_columns (reference basemodel.py:354-380)."""

import jax
import numpy as np

from deepctr_tpu.features import DenseFeat, SparseFeat, VarLenSparseFeat
from deepctr_tpu.models import DeepFM


def _make(n=32):
    rng = np.random.default_rng(0)
    cols = [SparseFeat("C1", 10, 4), SparseFeat("C2", 7, 4),
            DenseFeat("I1", 2),
            VarLenSparseFeat(SparseFeat("hist", 12, 4), maxlen=3,
                             combiner="sum")]
    x = {"C1": rng.integers(0, 10, n), "C2": rng.integers(0, 7, n),
         "I1": rng.random((n, 2)).astype("float32"),
         "hist": rng.integers(0, 12, (n, 3)) * rng.integers(0, 2, (n, 3))}
    return cols, x


def test_get_regularization_loss_tracks_weights():
    cols, x = _make()
    m = DeepFM(cols, cols, l2_reg_embedding=1e-2, l2_reg_linear=1e-2)
    r0 = m.get_regularization_loss()
    assert r0 >= 0.0
    # inflate every weight -> the explicit penalty must grow
    m.set_weights(jax.tree_util.tree_map(lambda a: a * 10.,
                                         m.get_weights()))
    assert m.get_regularization_loss() > r0 * 50


def test_input_from_feature_columns_shapes():
    cols, x = _make(32)
    m = DeepFM(cols, cols)
    se, dv = m.input_from_feature_columns(x)
    # 2 sparse + 1 pooled varlen embeddings, each [N, 1, E]; 1 dense [N, 2]
    assert len(se) == 3 and len(dv) == 1
    for e in se:
        assert e.shape == (32, 1, 4)
    assert dv[0].shape == (32, 2)
    # dense values pass through untouched
    np.testing.assert_allclose(dv[0], x["I1"], rtol=1e-6)
