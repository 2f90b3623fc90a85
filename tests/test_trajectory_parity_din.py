"""DIN training-trajectory equivalence vs DeepCTR-Torch.

Extends tests/test_trajectory_parity_vs_reference.py (DeepFM/xDeepFM) to
the SEQUENCE stack: shared query/history embedding tables, the
attention-over-history pooling (LocalActivationUnit), maxlen/length
masking and the varlen input plumbing all sit inside the differentiated
graph here, so a matching trajectory checks their values AND their
gradients against the reference (deepctr_torch/models/din.py:55-111,
layers/sequence.py AttentionSequencePoolingLayer).

att_activation="sigmoid" keeps the comparison exact: the reference's
Dice carries BatchNorm1d running statistics whose momentum schedule is a
separate concern (covered by tests/layers/ parity), while sigmoid makes
the attention unit pure.

Skipped without the reference checkout."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

if not os.path.isdir("/root/reference/deepctr_torch"):
    pytest.skip("reference checkout not available", allow_module_level=True)
sys.path.insert(0, "/root/reference")

V, E, T = 30, 4, 6
N, B, EPOCHS = 512, 128, 15   # 4 steps/epoch x 15 = 60 optimizer steps


def _data(seed=7):
    rng = np.random.default_rng(seed)
    x = {
        "item": rng.integers(1, V, N),
        "cate": rng.integers(1, V, N),
        "d0": rng.random(N).astype(np.float32),
        "seq_length": rng.integers(1, T + 1, N),
    }
    hist_item = rng.integers(1, V, (N, T))
    hist_cate = rng.integers(1, V, (N, T))
    mask = np.arange(T)[None, :] < x["seq_length"][:, None]
    x["hist_item"] = np.where(mask, hist_item, 0)
    x["hist_cate"] = np.where(mask, hist_cate, 0)
    # label correlates the candidate item with the history head
    y = ((x["item"] + hist_item[:, 0]) % 2).astype(np.float32)
    return x, y


def _models():
    import torch
    from deepctr_torch.inputs import (SparseFeat as TS, DenseFeat as TD,
                                      VarLenSparseFeat as TV)
    from deepctr_torch.models import DIN as TorchDIN
    from deepctr_tpu.features import (SparseFeat, DenseFeat,
                                      VarLenSparseFeat)
    from deepctr_tpu.models import DIN

    tcols = [TS("item", V, E), TS("cate", V, E), TD("d0", 1),
             TV(TS("hist_item", V, E, embedding_name="item"), T,
                length_name="seq_length"),
             TV(TS("hist_cate", V, E, embedding_name="cate"), T,
                length_name="seq_length")]
    jcols = [SparseFeat("item", V, E), SparseFeat("cate", V, E),
             DenseFeat("d0", 1),
             VarLenSparseFeat(SparseFeat("hist_item", V, E,
                                         embedding_name="item"), T,
                              length_name="seq_length"),
             VarLenSparseFeat(SparseFeat("hist_cate", V, E,
                                         embedding_name="cate"), T,
                              length_name="seq_length")]
    kwargs = dict(dnn_hidden_units=(16, 8), att_hidden_size=(8, 4),
                  att_activation="sigmoid", dnn_dropout=0)
    torch.manual_seed(0)
    tm = TorchDIN(tcols, ["item", "cate"], **kwargs)
    jm = DIN(jcols, ["item", "cate"], **kwargs)
    return tm, jm


def _param_map(tm):
    """(torch key, ours path, transpose) for every trained leaf."""
    pairs = [("embedding_dict.item.weight",
              ("embedding_dict", "item"), False),
             ("embedding_dict.cate.weight",
              ("embedding_dict", "cate"), False),
             ("out.bias", ("out", "bias"), False),
             ("dnn_linear.weight", ("dnn_linear", "kernel"), True)]
    sd = tm.state_dict()
    for prefix, ours in (("attention.local_att.dnn",
                          ("attention", "local_att", "dnn")),
                         ("dnn", ("dnn",))):
        li = 0
        while "%s.linears.%d.weight" % (prefix, li) in sd:
            pairs.append(("%s.linears.%d.weight" % (prefix, li),
                          ours + ("dense_%d" % li, "kernel"), True))
            pairs.append(("%s.linears.%d.bias" % (prefix, li),
                          ours + ("dense_%d" % li, "bias"), False))
            li += 1
    pairs.append(("attention.local_att.dense.weight",
                  ("attention", "local_att", "dense", "kernel"), True))
    pairs.append(("attention.local_att.dense.bias",
                  ("attention", "local_att", "dense", "bias"), False))
    return pairs


def _copy_weights(tm, jm):
    params = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                    jm.params)
    # .copy(): .numpy() views the live torch buffers and device_put can
    # zero-copy alias them — without it tm.fit() would mutate jm
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    for tkey, jpath, transpose in _param_map(tm):
        node = params
        for k in jpath[:-1]:
            node = node[k]
        v = sd[tkey].T if transpose else sd[tkey]
        assert node[jpath[-1]].shape == v.shape, (tkey, jpath)
        node[jpath[-1]] = v
    jm.set_weights({"params": jax.tree_util.tree_map(jnp.asarray, params),
                    "batch_stats": jm.batch_stats})


def _final_param_pairs(jm, tm):
    p = jax.tree_util.tree_map(np.asarray, jm.get_weights()["params"])
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    out = []
    for tkey, jpath, transpose in _param_map(tm):
        node = p
        for k in jpath:
            node = node[k]
        out.append((jpath, node, sd[tkey].T if transpose else sd[tkey]))
    return out


@pytest.mark.parametrize("optimizer", ["adagrad", "adam"])
def test_din_trajectory_equivalence(optimizer):
    tm, jm = _models()
    _copy_weights(tm, jm)
    x, y = _data()

    tm.compile(optimizer, "binary_crossentropy", metrics=[])
    jm.compile(optimizer, "binary_crossentropy", metrics=[])
    th = tm.fit(x, y, batch_size=B, epochs=EPOCHS, verbose=0,
                shuffle=False)
    jh = jm.fit(x, y, batch_size=B, epochs=EPOCHS, verbose=0,
                shuffle=False)

    np.testing.assert_allclose(jh.history["loss"], th.history["loss"],
                               rtol=2e-4, atol=2e-5)
    for path, ours, ref in _final_param_pairs(jm, tm):
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-5,
                                   err_msg=str(path))
    np.testing.assert_allclose(jm.predict(x, N), tm.predict(x, N),
                               rtol=1e-3, atol=1e-4)
