"""Synthetic-data fixtures + the universal model smoke harness.

Modeled on the reference's test strategy (reference: tests/utils.py:18-171):
`get_test_data` fabricates random feature columns and labels; `check_model`
runs compile -> fit(validation_split, callbacks) -> save/load weights ->
save/load whole model for every model class.
"""

import os

import numpy as np

from deepctr_tpu.callbacks import EarlyStopping, ModelCheckpoint
from deepctr_tpu.features import (SparseFeat, DenseFeat, VarLenSparseFeat,
                                  get_feature_names)
from deepctr_tpu.utils.serialization import load_model, save_model

SAMPLE_SIZE = 64


def gen_sequence(dim, max_len, sample_size):
    ids = np.random.randint(0, dim, (sample_size, max_len))
    lengths = np.random.randint(1, max_len + 1, sample_size)
    return ids, lengths


def get_test_data(sample_size=1000, embedding_size=4, sparse_feature_num=1,
                  dense_feature_num=1, sequence_feature=("sum", "mean", "max"),
                  classification=True, include_length=False, hash_flag=False,
                  prefix=""):
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

    if classification:
        y = np.random.randint(0, 2, sample_size)
    else:
        y = np.random.random(sample_size)

    return model_input, y, feature_columns


def check_model(model, model_name, x, y, check_model_io=True):
    """compile -> fit(with callbacks) -> predict -> save/load weights ->
    save/load whole model.  (reference parity: tests/utils.py:142-171)
    """
    tmpdir = os.environ.get("PYTEST_TMP", "/tmp")
    ckpt_path = os.path.join(tmpdir, model_name + "_ckpt.pkl")
    weights_path = os.path.join(tmpdir, model_name + "_weights.pkl")
    model_path = os.path.join(tmpdir, model_name + "_model.pkl")

    early_stopping = EarlyStopping(monitor="val_binary_crossentropy",
                                   min_delta=0, verbose=1, patience=0,
                                   mode="min")
    model_checkpoint = ModelCheckpoint(filepath=ckpt_path,
                                       monitor="val_binary_crossentropy",
                                       verbose=1, save_best_only=True,
                                       save_weights_only=False, mode="min",
                                       period=1)
    model.compile("adam", "binary_crossentropy",
                  metrics=["binary_crossentropy"])
    model.fit(x, y, batch_size=64, epochs=3, validation_split=0.5, verbose=0,
              callbacks=[early_stopping, model_checkpoint])

    pred = model.predict(x, batch_size=32)
    assert pred.shape[0] == len(y)
    assert np.all(np.isfinite(pred))

    print(model_name + " test train valid pass!")
    model.save_weights(weights_path)
    model.load_weights(weights_path)
    print(model_name + " test save load weight pass!")
    if check_model_io:
        save_model(model, model_path)
        m2 = load_model(model_path)
        pred2 = m2.predict(x, batch_size=32)
        assert np.allclose(pred, pred2, atol=1e-5)
        print(model_name + " test save load model pass!")
    print(model_name + " test pass!")


def get_device(use_cuda=True):
    """API-parity shim (reference tests/utils.py:174-179); JAX owns devices."""
    return "cpu"
