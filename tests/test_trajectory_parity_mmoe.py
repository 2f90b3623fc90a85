"""MMOE (multi-task) training-trajectory equivalence vs DeepCTR-Torch.

Extends the engine-equivalence suite to the MULTI-TASK stack: summed
per-task losses, per-task heads, softmax expert gates and the
nn.vmap-stacked expert DNNs all sit inside the differentiated graph
(reference: deepctr_torch/models/multitask/mmoe.py:64-134; loss
summation: models/basemodel.py:232-260).  A matching 60-step trajectory
checks both the forward math and the gradient flow through the stacked
expert representation against the reference's per-expert module list.

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

F, V, E = 3, 30, 4
N, B, EPOCHS = 512, 128, 15
KW = dict(num_experts=3, expert_dnn_hidden_units=(16, 8),
          gate_dnn_hidden_units=(), tower_dnn_hidden_units=(8,),
          task_types=("binary", "binary"), task_names=("t1", "t2"))
N_EXPERT_LAYERS = len(KW["expert_dnn_hidden_units"])


def _data(seed=11):
    rng = np.random.default_rng(seed)
    x = {"s%d" % i: rng.integers(0, V, N) for i in range(F)}
    x["d0"] = rng.random(N).astype(np.float32)
    y1 = ((x["s0"] + x["s1"]) % 2).astype(np.float32)
    y2 = ((x["s1"] + x["s2"]) % 2).astype(np.float32)
    return x, np.stack([y1, y2], axis=1)


def _param_map():
    """(torch key, ours path, kind) — kind: '' plain, 'T' transpose,
    ('stack', e) = expert e's slice of a vmap-stacked leaf."""
    pairs = []
    for i in range(F):
        pairs.append(("embedding_dict.s%d.weight" % i,
                      ("embedding_dict", "s%d" % i), ""))
    for li in range(N_EXPERT_LAYERS):
        for e in range(KW["num_experts"]):
            pairs.append(("expert_dnn.%d.linears.%d.weight" % (e, li),
                          ("expert_dnn", "dense_%d" % li, "kernel"),
                          ("stack", e)))
            pairs.append(("expert_dnn.%d.linears.%d.bias" % (e, li),
                          ("expert_dnn", "dense_%d" % li, "bias"),
                          ("stack_b", e)))
    for t in range(2):
        pairs.append(("gate_dnn_final_layer.%d.weight" % t,
                      ("gate_final_%d" % t, "kernel"), "T"))
        pairs.append(("tower_dnn.%d.linears.0.weight" % t,
                      ("tower_dnn_%d" % t, "dense_0", "kernel"), "T"))
        pairs.append(("tower_dnn.%d.linears.0.bias" % t,
                      ("tower_dnn_%d" % t, "dense_0", "bias"), ""))
        pairs.append(("tower_dnn_final_layer.%d.weight" % t,
                      ("tower_final_%d" % t, "kernel"), "T"))
        pairs.append(("out.%d.bias" % t, ("out_%d" % t, "bias"), ""))
    return pairs


def _models():
    import torch
    from deepctr_torch.inputs import SparseFeat as TS, DenseFeat as TD
    from deepctr_torch.models import MMOE as TorchMMOE
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import MMOE

    tcols = [TS("s%d" % i, V, E) for i in range(F)] + [TD("d0", 1)]
    jcols = [SparseFeat("s%d" % i, V, E) for i in range(F)] + [
        DenseFeat("d0", 1)]
    torch.manual_seed(0)
    return TorchMMOE(tcols, **KW), MMOE(jcols, **KW)


def _copy_weights(tm, jm):
    params = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                    jm.params)
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}
    for tkey, jpath, kind in _param_map():
        node = params
        for k in jpath[:-1]:
            node = node[k]
        leaf = node[jpath[-1]]
        if kind == "":
            v = sd[tkey]
            assert leaf.shape == v.shape, (tkey, jpath)
            node[jpath[-1]] = v
        elif kind == "T":
            v = sd[tkey].T
            assert leaf.shape == v.shape, (tkey, jpath)
            node[jpath[-1]] = v
        else:
            op, e = kind
            v = sd[tkey].T if op == "stack" else sd[tkey]
            assert leaf[e].shape == v.shape, (tkey, jpath)
            leaf = leaf.copy()
            leaf[e] = v
            node[jpath[-1]] = leaf
    jm.set_weights({"params": jax.tree_util.tree_map(jnp.asarray, params),
                    "batch_stats": jm.batch_stats})


def _final_param_pairs(jm, tm):
    p = jax.tree_util.tree_map(np.asarray, jm.get_weights()["params"])
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    out = []
    for tkey, jpath, kind in _param_map():
        node = p
        for k in jpath:
            node = node[k]
        if kind == "":
            out.append((tkey, node, sd[tkey]))
        elif kind == "T":
            out.append((tkey, node, sd[tkey].T))
        else:
            op, e = kind
            out.append((tkey, node[e],
                        sd[tkey].T if op == "stack" else sd[tkey]))
    return out


def test_mmoe_trajectory_equivalence():
    tm, jm = _models()
    _copy_weights(tm, jm)
    x, y = _data()

    tm.compile("adagrad", ["binary_crossentropy", "binary_crossentropy"],
               metrics=[])
    jm.compile("adagrad", ["binary_crossentropy", "binary_crossentropy"],
               metrics=[])
    th = tm.fit(x, y, batch_size=B, epochs=EPOCHS, verbose=0,
                shuffle=False)
    jh = jm.fit(x, y, batch_size=B, epochs=EPOCHS, verbose=0,
                shuffle=False)

    np.testing.assert_allclose(jh.history["loss"], th.history["loss"],
                               rtol=2e-4, atol=2e-5)
    for tkey, ours, ref in _final_param_pairs(jm, tm):
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-5,
                                   err_msg=tkey)
    np.testing.assert_allclose(jm.predict(x, N), tm.predict(x, N),
                               rtol=1e-3, atol=1e-4)
