"""Whole-model ONN parity vs DeepCTR-Torch: every weight copied across
(fused wide column, packed pair-embedding layout, DNN, output bias) and
predictions compared — exercises the most heavily restructured model
end-to-end.  Skipped without the reference checkout."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if not os.path.isdir("/root/reference/deepctr_torch"):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, "/root/reference")


def test_onn_model_parity():
    import torch  # noqa: F401
    from deepctr_torch.inputs import (SparseFeat as TSparse,
                                      DenseFeat as TDense)
    from deepctr_torch.models import ONN as TorchONN
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import ONN

    np.random.seed(0)
    F, V, E, B = 3, 7, 4, 16
    tcols = [TSparse("s%d" % i, V, E) for i in range(F)] + [TDense("d0", 1)]
    jcols = [SparseFeat("s%d" % i, V, E) for i in range(F)] + [
        DenseFeat("d0", 1)]
    tm = TorchONN(tcols, tcols, dnn_hidden_units=(8,), dnn_dropout=0)
    tm.eval()
    jm = ONN(jcols, jcols, dnn_hidden_units=(8,), dnn_dropout=0)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    jm.params)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    # first-order: ours fuses the wide column into the deep table [V, E+1]
    for i in range(F):
        name = "s%d" % i
        params["embedding_dict"][name] = np.concatenate(
            [sd["embedding_dict.%s.weight" % name],
             sd["linear_model.embedding_dict.%s.weight" % name]], axis=1)
    params["linear_model"]["weight"] = sd["linear_model.weight"]

    # second-order: reference keys "sA+sB" hold emb1 (first feature) and
    # emb2 (second); ours packs feature i's vectors at slot j-1 (j>i) /
    # slot i (j<i) of one [V, F-1, E] table per feature
    so = params["second_order_embedding"]
    for i in range(F - 1):
        for j in range(i + 1, F):
            key = "second_order_embedding_dict.s%d+s%d" % (i, j)
            so["s%d" % i][:, j - 1, :] = sd[key + ".emb1.weight"]
            so["s%d" % j][:, i, :] = sd[key + ".emb2.weight"]

    params["dnn"]["dense_0"]["kernel"] = sd["dnn.linears.0.weight"].T
    params["dnn"]["dense_0"]["bias"] = sd["dnn.linears.0.bias"]
    params["dnn_linear"]["kernel"] = sd["dnn_linear.weight"].T
    if "out.bias" in sd:
        params["out"]["bias"] = sd["out.bias"]

    jm.set_weights({"params": jax.tree_util.tree_map(jnp.asarray, params),
                    "batch_stats": jm.batch_stats})
    x = {"s%d" % i: np.random.randint(0, V, B) for i in range(F)}
    x["d0"] = np.random.rand(B).astype(np.float32)
    ref = tm.predict(x, B)
    got = jm.predict(x, B)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_deepfm_model_parity():
    import torch  # noqa: F401
    from deepctr_torch.inputs import (SparseFeat as TSparse,
                                      DenseFeat as TDense)
    from deepctr_torch.models import DeepFM as TorchDeepFM
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    np.random.seed(1)
    F, V, E, B = 4, 9, 4, 32
    tcols = [TSparse("s%d" % i, V, E) for i in range(F)] + [TDense("d0", 1)]
    jcols = [SparseFeat("s%d" % i, V, E) for i in range(F)] + [
        DenseFeat("d0", 1)]
    tm = TorchDeepFM(tcols, tcols, dnn_hidden_units=(8, 4), dnn_dropout=0)
    tm.eval()
    jm = DeepFM(jcols, jcols, dnn_hidden_units=(8, 4), dnn_dropout=0)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    jm.params)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    for i in range(F):
        name = "s%d" % i
        params["embedding_dict"][name] = np.concatenate(
            [sd["embedding_dict.%s.weight" % name],
             sd["linear_model.embedding_dict.%s.weight" % name]], axis=1)
    params["linear_model"]["weight"] = sd["linear_model.weight"]
    for li in range(2):
        params["dnn"]["dense_%d" % li]["kernel"] = \
            sd["dnn.linears.%d.weight" % li].T
        params["dnn"]["dense_%d" % li]["bias"] = \
            sd["dnn.linears.%d.bias" % li]
    params["dnn_linear"]["kernel"] = sd["dnn_linear.weight"].T
    if "out.bias" in sd:
        params["out"]["bias"] = sd["out.bias"]

    jm.set_weights({"params": jax.tree_util.tree_map(jnp.asarray, params),
                    "batch_stats": jm.batch_stats})
    x = {"s%d" % i: np.random.randint(0, V, B) for i in range(F)}
    x["d0"] = np.random.rand(B).astype(np.float32)
    ref = tm.predict(x, B)
    got = jm.predict(x, B)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_xdeepfm_model_parity():
    """Whole-model bit parity for xDeepFM: CIN conv stacks + DNN +
    fused wide column, weights copied from the reference."""
    import torch  # noqa: F401
    from deepctr_torch.inputs import (SparseFeat as TSparse,
                                      DenseFeat as TDense)
    from deepctr_torch.models import xDeepFM as TorchXDeepFM
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import xDeepFM

    np.random.seed(2)
    F, V, E, B = 4, 9, 4, 32
    tcols = [TSparse("s%d" % i, V, E) for i in range(F)] + [TDense("d0", 1)]
    jcols = [SparseFeat("s%d" % i, V, E) for i in range(F)] + [
        DenseFeat("d0", 1)]
    kw = dict(dnn_hidden_units=(8, 4), cin_layer_size=(6, 4),
              dnn_dropout=0)
    tm = TorchXDeepFM(tcols, tcols, **kw)
    tm.eval()
    jm = xDeepFM(jcols, jcols, **kw)
    params = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                    jm.params)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    for i in range(F):
        name = "s%d" % i
        params["embedding_dict"][name] = np.concatenate(
            [sd["embedding_dict.%s.weight" % name],
             sd["linear_model.embedding_dict.%s.weight" % name]], axis=1)
    params["linear_model"]["weight"] = sd["linear_model.weight"]
    for li in range(2):
        params["dnn"]["dense_%d" % li]["kernel"] = \
            sd["dnn.linears.%d.weight" % li].T
        params["dnn"]["dense_%d" % li]["bias"] = \
            sd["dnn.linears.%d.bias" % li]
        params["cin"]["conv_w_%d" % li] = \
            sd["cin.conv1ds.%d.weight" % li][:, :, 0]
        params["cin"]["conv_b_%d" % li] = sd["cin.conv1ds.%d.bias" % li]
    params["dnn_linear"]["kernel"] = sd["dnn_linear.weight"].T
    params["cin_linear"]["kernel"] = sd["cin_linear.weight"].T
    params["out"]["bias"] = sd["out.bias"]

    jm.set_weights({"params": jax.tree_util.tree_map(jnp.asarray, params),
                    "batch_stats": jm.batch_stats})
    x = {"s%d" % i: np.random.randint(0, V, B) for i in range(F)}
    x["d0"] = np.random.rand(B).astype(np.float32)
    ref = tm.predict(x, B)
    got = jm.predict(x, B)
    np.testing.assert_allclose(got, ref, atol=1e-5)
