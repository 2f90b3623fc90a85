"""bfloat16-compute smoke across the whole model zoo.

The headline bench runs bf16 (config.set_compute_dtype), but the parity
grids run f32 — dtype-promotion bugs in models the bench never touches
(mixed bf16 embeddings + f32 dense concats, BN on bf16 inputs, bf16
softmax masking) would go unseen.  Each model trains one step and
predicts under bf16; outputs must be finite and match the f32 path
within bf16 tolerance at init."""

import numpy as np
import pytest

from deepctr_tpu import config
from deepctr_tpu import models as zoo
from .utils import get_test_data
from .utils_mtl import get_mtl_test_data

SINGLE_TASK = [
    "WDL", "DeepFM", "xDeepFM", "NFM", "AFM", "DCN", "DCNMix", "AutoInt",
    "ONN", "PNN", "CCPM", "IFM", "DIFM", "AFN", "FiBiNET", "MLR",
]
MULTI_TASK = ["SharedBottom", "ESMM", "MMOE", "PLE"]


def _build_single(name, cols):
    cls = getattr(zoo, name)
    kwargs = {"seed": 5}
    if name == "PNN":
        return cls(cols, **kwargs)
    if name == "MLR":
        return cls(cols, **kwargs)
    if name == "CCPM":
        kwargs.update(conv_kernel_width=(3,), conv_filters=(4,))
    if name == "AFN":
        kwargs.update(ltl_hidden_size=8, afn_dnn_hidden_units=(8,))
    return cls(cols, cols, **kwargs)


@pytest.fixture(scope="module", autouse=True)
def _bf16():
    config.set_compute_dtype("bfloat16")
    yield
    config.set_compute_dtype("float32")


@pytest.mark.parametrize("name", SINGLE_TASK)
def test_bf16_single_task(name):
    np.random.seed(7)
    # AFM / CCPM reject DenseFeat in dnn columns (reference parity)
    n_dense = 0 if name in ("AFM", "CCPM") else 2
    x, y, cols = get_test_data(sample_size=64, sparse_feature_num=2,
                               dense_feature_num=n_dense,
                               sequence_feature=("sum", "mean"))
    m = _build_single(name, cols)
    m.compile("adagrad", "binary_crossentropy")
    m.fit(x, y, batch_size=32, epochs=1, verbose=0)
    p = m.predict(x, 32)
    assert np.isfinite(p).all(), name
    assert p.shape == (64, 1)


@pytest.mark.parametrize("name", MULTI_TASK)
def test_bf16_multi_task(name):
    np.random.seed(7)
    x, y, cols = get_mtl_test_data(sample_size=64, sparse_feature_num=2,
                                   dense_feature_num=2)
    cls = getattr(zoo, name)
    m = cls(cols, task_types=["binary", "binary"],
            task_names=["t0", "t1"], seed=5)
    m.compile("adagrad", ["binary_crossentropy", "binary_crossentropy"])
    m.fit(x, y, batch_size=32, epochs=1, verbose=0)
    p = m.predict(x, 32)
    assert np.isfinite(p).all(), name
    assert p.shape == (64, 2)


def test_bf16_din():
    np.random.seed(7)
    from .models.DIN_test import get_xy_fd
    x, y, cols, behavior_list = get_xy_fd()
    m = zoo.DIN(cols, behavior_list, dnn_hidden_units=(8,), seed=5)
    m.compile("adagrad", "binary_crossentropy")
    m.fit(x, y, batch_size=4, epochs=1, verbose=0)
    assert np.isfinite(m.predict(x, 4)).all()


def test_bf16_dien():
    np.random.seed(7)
    from .models.DIEN_test import get_xy_fd
    x, y, cols, behavior_list = get_xy_fd(use_neg=True)
    m = zoo.DIEN(cols, behavior_list, gru_type="AUGRU", use_negsampling=True,
                 dnn_hidden_units=(8,), seed=5)
    m.compile("adagrad", "binary_crossentropy")
    m.fit(x, y, batch_size=4, epochs=1, verbose=0)
    assert np.isfinite(m.predict(x, 4)).all()
