"""Production serving: AOT-exported inference artifacts.

The reference's only deployment story is ``torch.save`` of the Python
module (reference basemodel.py:311-352 + FAQ.md §1), which needs the
full framework and Python model code at serving time.  The TPU-native
equivalent exports the jitted inference function itself through
``jax.export``: a single self-contained StableHLO artifact with the
trained weights baked in as constants.  A serving process deserializes
and calls it — no model class, no feature columns, no deepctr_tpu
import required (only jax).

Two shape modes:

* fixed ``batch_size`` — one compiled shape, maximal XLA optimization;
  the caller pads the final partial batch (mirrors what fit/predict do
  internally).
* ``batch_size=None`` — the batch dimension is exported SYMBOLICALLY
  (`jax.export.symbolic_shape`), so one artifact serves any batch size.

The artifact is platform-checked by jax.export: an artifact exported
under TPU lowers TPU-only (including any Pallas inference kernels the
dispatch chose at trace time); pass ``platforms=("tpu", "cpu")`` to
lower for both (Pallas-free paths only).
"""

import jax
import jax.numpy as jnp

__all__ = ["export_predict", "save_exported", "load_exported"]


def _predict_fn(model):
    # combined-storage sparse-update tables leave model.params lagging
    # after fit(); sync before baking weights in (as predict does)
    model._sync_params()
    forward = model._make_forward()
    params = model.params
    batch_stats = model.batch_stats

    def predict(X):
        y_pred, _, _ = forward(params, batch_stats, X, False,
                               jax.random.PRNGKey(0))
        return y_pred
    return predict


def export_predict(model, batch_size=None, platforms=None):
    """Export ``model``'s inference function as a `jax.export.Exported`.

    Weights are captured as constants — the result is self-contained.
    ``batch_size=None`` exports a symbolic batch dimension (any batch
    size at call time); an int fixes the shape.  Call the result with
    ``exported.call(X)`` where X is ``[B, input_dim]`` float32 in
    ``get_feature_names`` column order (the same flat layout fit and
    predict use).
    """
    from jax import export as jax_export
    if model.input_dim == 0:
        raise ValueError("model has no input features")
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        shape = (b, model.input_dim)
    else:
        shape = (int(batch_size), model.input_dim)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    kwargs = {} if platforms is None else {"platforms": tuple(platforms)}
    return jax_export.export(jax.jit(_predict_fn(model)), **kwargs)(spec)


def save_exported(exported, path):
    """Serialize an `Exported` to ``path`` (bytes on disk)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path):
    """Deserialize an artifact; returns the `Exported` (use ``.call``)."""
    from jax import export as jax_export
    with open(path, "rb") as f:
        data = f.read()
    return jax_export.deserialize(bytearray(data))
