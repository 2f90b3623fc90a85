"""Multi-task synthetic fixtures + smoke harness (modeled on the reference's
tests/utils_mtl.py:18-112)."""

import os

import numpy as np

from deepctr_tpu.callbacks import EarlyStopping, ModelCheckpoint
from deepctr_tpu.features import SparseFeat, DenseFeat, VarLenSparseFeat
from deepctr_tpu.utils.serialization import load_model, save_model

from .utils import gen_sequence


def get_mtl_test_data(sample_size=1000, embedding_size=4,
                      sparse_feature_num=1, dense_feature_num=1,
                      sequence_feature=("sum", "mean", "max"),
                      include_length=False, task_types=("binary", "binary"),
                      hash_flag=False, prefix=""):
    feature_columns = []
    model_input = {}

    for i in range(sparse_feature_num):
        name = prefix + "sparse_feature_" + str(i)
        dim = np.random.randint(1, 10)
        feature_columns.append(
            SparseFeat(name, dim, embedding_size, dtype="int32"))
        model_input[name] = np.random.randint(0, dim, sample_size)

    for i in range(dense_feature_num):
        name = prefix + "dense_feature_" + str(i)
        feature_columns.append(DenseFeat(name, 1, dtype="float32"))
        model_input[name] = np.random.random(sample_size)

    for i, mode in enumerate(sequence_feature):
        dim = np.random.randint(1, 10)
        maxlen = np.random.randint(1, 10)
        name = prefix + "sequence_" + mode
        feature_columns.append(
            VarLenSparseFeat(
                SparseFeat(name, vocabulary_size=dim + 1,
                           embedding_dim=embedding_size),
                maxlen=maxlen, combiner=mode,
                length_name=(name + "_seq_length" if include_length
                             else None)))
        seq_input, seq_len = gen_sequence(dim, maxlen, sample_size)
        model_input[name] = seq_input
        if include_length:
            model_input[name + "_seq_length"] = seq_len

    ys = []
    for task in task_types:
        if task == "binary":
            ys.append(np.random.randint(0, 2, sample_size))
        else:
            ys.append(np.random.random(sample_size))
    y = np.stack(ys, axis=-1)
    return model_input, y, feature_columns


def check_mtl_model(model, model_name, x, y, task_types,
                    check_model_io=True):
    """compile(loss list) -> fit -> predict -> save/load.
    (reference parity: tests/utils_mtl.py:75-112)"""
    loss_list = ["binary_crossentropy" if t == "binary" else "mae"
                 for t in task_types]
    tmpdir = os.environ.get("PYTEST_TMP", "/tmp")
    early_stopping = EarlyStopping(monitor="val_loss", min_delta=0,
                                   verbose=1, patience=0, mode="min")
    ckpt_path = os.path.join(tmpdir, model_name + "_mtl_ckpt.pkl")
    model_checkpoint = ModelCheckpoint(filepath=ckpt_path,
                                       monitor="val_loss", verbose=1,
                                       save_best_only=True, mode="min")
    model.compile("adam", loss_list, metrics=["binary_crossentropy"])
    model.fit(x, y, batch_size=100, epochs=1, validation_split=0.5,
              verbose=0, callbacks=[early_stopping, model_checkpoint])

    pred = model.predict(x, batch_size=32)
    assert pred.shape == (len(y), len(task_types))
    assert np.all(np.isfinite(pred))
    print(model_name + " test train valid pass!")

    weights_path = os.path.join(tmpdir, model_name + "_mtl_weights.pkl")
    model.save_weights(weights_path)
    model.load_weights(weights_path)
    print(model_name + " test save load weight pass!")
    if check_model_io:
        model_path = os.path.join(tmpdir, model_name + "_mtl_model.pkl")
        save_model(model, model_path)
        m2 = load_model(model_path)
        assert np.allclose(pred, m2.predict(x, batch_size=32), atol=1e-5)
        print(model_name + " test save load model pass!")
    print(model_name + " test pass!")
