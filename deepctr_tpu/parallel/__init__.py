"""Multi-device parallelism over `jax.sharding.Mesh`.

The reference's only multi-device story is single-process
`torch.nn.DataParallel` (deepctr_torch/models/basemodel.py:206-209).  The
TPU-native replacement is declarative sharding over a device mesh:

  * the batch is sharded over the ``data`` axis (pure data parallelism —
    XLA inserts the gradient all-reduce over ICI);
  * embedding tables can additionally be row-sharded over the ``model``
    axis (`shard_embeddings=True`), so each chip holds 1/n of every vocab
    and XLA turns the gather into an all-gather-free dynamic-slice +
    collective exchange.

No NCCL/MPI-style code exists anywhere: collectives are compiler-inserted
from sharding annotations (GSPMD), which is the idiomatic TPU design.
"""

from .sharding import (make_mesh, batch_sharding, shard_variables,
                       embedding_sharding)
