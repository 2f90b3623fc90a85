"""Model / weight serialization.

Weights are saved as a pickled numpy pytree (params + batch_stats +
optimizer state optional); whole-model saves additionally record the model
class and constructor kwargs so ``load_model`` can rebuild the module graph.
(reference counterpart: torch.save of state_dict / whole pickled module,
exercised by every reference model test — tests/utils.py:162-170)
"""

import os
import pickle

import jax
import jax.numpy as jnp
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


# ---------------------------------------------------------------------------
# Orbax train-state checkpointing (params + optimizer state + batch stats).
# The reference's ModelCheckpoint only saves model weights
# (deepctr_torch/callbacks.py:41-73, "No optimizer-state checkpointing" —
# SURVEY.md §5.4); this gives exact training resume.
# ---------------------------------------------------------------------------

def save_checkpoint(model, directory, include_optimizer=True):
    """Write a train-state checkpoint under ``directory`` (Orbax pytree)."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    if hasattr(model, "_sync_params"):
        model._sync_params()   # combined-storage tables lag after fit
    state = {"params": tree_to_numpy(model.params),
             "batch_stats": tree_to_numpy(model.batch_stats)}
    if include_optimizer and getattr(model, "optim", None) is not None:
        state["opt_state"] = tree_to_numpy(
            jax.tree_util.tree_map(np.asarray, model.opt_state))
        # sparse-update per-row optimizer state (adagrad accumulators,
        # lazy-adam moments) lives OUTSIDE opt_state — without it, resume
        # silently restarts the table optimizer trajectory from zero
        table_state = getattr(model, "table_state", None)
        if table_state and jax.tree_util.tree_leaves(table_state):
            state["table_state"] = tree_to_numpy(table_state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(directory, state, force=True)


def load_checkpoint(model, directory):
    """Restore params/batch_stats (and optimizer + sparse table state if
    present)."""
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(directory)
    model.set_weights({"params": state["params"],
                       "batch_stats": state.get("batch_stats", {})})
    if "opt_state" in state and getattr(model, "optim", None) is not None:
        model.opt_state = _restore_like(model.opt_state,
                                        state["opt_state"], "opt_state")
    if "table_state" in state and getattr(model, "optim", None) is not None:
        # restore AFTER set_weights (which re-initializes table_state)
        model.table_state = _restore_like(
            model.table_state, state["table_state"], "table_state")
    return model


def _restore_like(ref, saved, what):
    """Rebuild ``ref``'s pytree from ``saved``'s leaves — but only when
    the leaf count and shapes agree.

    Optimizer-state LAYOUT depends on the compiled optimizer, the
    backend, and the sparse-update mode (plain acc [R, w] vs interleaved
    combined [2R, 128] vs arena; adagrad acc vs adam m/v/t).  A blind
    unflatten of mismatched leaves would silently seed the optimizer
    from reinterpreted buffers (e.g. a TPU combined checkpoint loaded on
    a CPU box restores interleaved (w, acc) rows AS the accumulator), so
    mismatches raise instead."""
    ref_flat = jax.tree_util.tree_leaves(ref)
    new_flat = jax.tree_util.tree_leaves(saved)
    ref_sig = [tuple(np.shape(v)) for v in ref_flat]
    new_sig = [tuple(np.shape(v)) for v in new_flat]
    if ref_sig != new_sig:
        diff = [(a, b) for a, b in zip(ref_sig, new_sig) if a != b]
        first = ("expected leaf shape %s, checkpoint has %s" % diff[0]
                 if diff else "%d leaves here vs %d in the checkpoint"
                 % (len(ref_sig), len(new_sig)))
        raise ValueError(
            "checkpointed %s layout does not match this model's (saved "
            "under a different optimizer / backend / DEEPCTR_UPDATE_MODE "
            "/ sparse_table_updates setting?): %s. Load under the same "
            "configuration it was saved with." % (what, first))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(ref),
        [jnp.asarray(n) for n in new_flat])
