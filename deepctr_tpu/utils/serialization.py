"""Model / weight serialization.

Weights are saved as a pickled numpy pytree (params + batch_stats +
optimizer state optional); whole-model saves additionally record the model
class and constructor kwargs so ``load_model`` can rebuild the module graph.
(reference counterpart: torch.save of state_dict / whole pickled module,
exercised by every reference model test — tests/utils.py:162-170)
"""

import pickle

import jax
import numpy as np


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_weights(model, path):
    with open(path, "wb") as f:
        pickle.dump(tree_to_numpy(model.get_weights()), f)


def load_weights(model, path):
    with open(path, "rb") as f:
        weights = pickle.load(f)
    model.set_weights(weights)
    return model


def save_model(model, path):
    payload = {
        "model_class": type(model),
        "init_kwargs": model._init_kwargs,
        "weights": tree_to_numpy(model.get_weights()),
        "version": 1,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model(path):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    model = payload["model_class"](**payload["init_kwargs"])
    model.set_weights(payload["weights"])
    return model
