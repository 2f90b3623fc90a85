"""Sharding rules for params / optimizer state / batches over a Mesh.

Design: one mesh with axes ``("data", "model")``.  Dense-tower parameters
are replicated (they are tiny next to embedding tables); embedding tables
(every param under an ``embedding_dict`` subtree) are row-sharded over the
``model`` axis when requested.  Batches are sharded over ``data``.
Optimizer-state leaves inherit the sharding of the parameter they mirror
(optax states are pytrees with the same structure per-leaf), so Adam/Adagrad
accumulators for a sharded table are sharded the same way — the sparse-state
memory scales down with the mesh exactly like the table itself.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("data", "model"), devices=None):
    """Build a Mesh over all (or the given) devices.

    ``shape`` is a tuple like ``(n_data, n_model)``; default puts every
    device on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if int(np.prod(shape)) != n:
        raise ValueError("mesh shape %r does not cover %d devices"
                         % (shape, n))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def embedding_sharding(mesh):
    """Row-shard a [vocab, dim] table over the 'model' axis."""
    return NamedSharding(mesh, P("model", None))


def _is_embedding_path(path):
    return any(
        getattr(k, "key", None) == "embedding_dict" for k in path)


def _param_sharding_tree(mesh, params, shard_embeddings):
    emb = embedding_sharding(mesh)
    rep = replicated(mesh)

    def rule(path, leaf):
        if (shard_embeddings and _is_embedding_path(path)
                and getattr(leaf, "ndim", 0) == 2
                and leaf.shape[0] % mesh.shape["model"] == 0):
            return emb
        return rep

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_variables(mesh, params, batch_stats, opt_state=None,
                    shard_embeddings=False):
    """device_put params/batch_stats/opt_state with mesh shardings applied.

    Optimizer-state leaves that have the same shape as a sharded table are
    sharded identically (optax momentum/accumulator mirrors); everything
    else is replicated.
    """
    shardings = _param_sharding_tree(mesh, params, shard_embeddings)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    rep = replicated(mesh)
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep), batch_stats)

    if opt_state is not None:
        # record only genuinely row-sharded leaves: comparing against the
        # P('model', None) spec (not object identity — the tree holds a
        # different NamedSharding instance than any local variable)
        sharded_shapes = {}
        for leaf, sh in zip(jax.tree_util.tree_leaves(params),
                            jax.tree_util.tree_leaves(shardings)):
            if getattr(sh, "spec", None) == P("model", None):
                sharded_shapes[leaf.shape] = sh

        emb = embedding_sharding(mesh)
        n_model = mesh.shape["model"]

        def place_table(path, x):
            """table_state placement by PATH, not params-shape mirroring:
            combined-storage tables keep only a [0, width] placeholder in
            params (basemodel._strip_combined_leaves), so the (w | acc)
            [2R, 128] / (w | m | v) [3R, 128] buffers — and separate-leaf
            accumulators — are row-sharded whenever their table path is
            an embedding_dict entry and the rows divide the model axis
            (R %% model-axis == 0 is a precondition of combined state
            under sharding — basemodel._use_combined_state).  Scalars,
            [R] step counters and the '__arena__' concat (never sharded)
            replicate."""
            keys = [str(getattr(k, "key", k)) for k in path]
            if (shard_embeddings
                    and any("embedding_dict" in k for k in keys)
                    and "__arena__" not in keys
                    and getattr(x, "ndim", 0) == 2
                    and x.shape[0] % n_model == 0):
                return jax.device_put(x, emb)
            return jax.device_put(x, rep)

        def place(x):
            sh = sharded_shapes.get(getattr(x, "shape", None), rep)
            return jax.device_put(x, sh)

        if isinstance(opt_state, dict) and "tables" in opt_state:
            tables = jax.tree_util.tree_map_with_path(
                place_table, opt_state["tables"])
            rest = {k: jax.tree_util.tree_map(place, v)
                    for k, v in opt_state.items() if k != "tables"}
            opt_state = dict(rest, tables=tables)
        else:
            opt_state = jax.tree_util.tree_map(place, opt_state)
    return params, batch_stats, opt_state
