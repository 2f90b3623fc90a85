"""Multi-host (multi-process) scaffolding.

The reference has no distributed backend at all (SURVEY.md §5.8: its only
multi-device path is single-process ``nn.DataParallel``).  On TPU pods the
JAX runtime is multi-controller: one python process per host, each seeing
only its local chips, coordinated through ``jax.distributed``.  This
module provides the three pieces an engine needs on top of that:

* :func:`initialize` — one-call ``jax.distributed`` setup (TPU pods
  auto-discover; CPU/GPU simulation takes explicit coordinator/rank).
* :func:`global_mesh` — a ("data", "model") mesh over ALL processes'
  devices.
* :func:`host_local_batch` — which rows of the global batch this process
  should feed, plus :func:`global_batch_from_host_local` to assemble the
  per-process shards into one globally-sharded array
  (``jax.make_array_from_process_local_data``).

Recipe for a v5p slice (documented, hardware-validated path is the
single-host mesh + the 2-process CPU simulation in
tools/multiprocess_sim.py):

    import jax
    from deepctr_tpu.parallel import distributed as dist
    dist.initialize()                      # TPU pod: args auto-discovered
    mesh = dist.global_mesh(model_axis=1)  # pure data parallel
    model = DeepFM(cols, cols, mesh=mesh)
    model.compile("adagrad", "binary_crossentropy")
    Xg = dist.global_batch_from_host_local(mesh, X_local, y_local, sw)
    ...

Every process runs the same program; GSPMD inserts the gradient
all-reduce over ICI/DCN.
"""

import numpy as np

import jax

from .sharding import make_mesh, batch_sharding


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Bring up the jax.distributed runtime (idempotent).

    On TPU pods every argument is auto-discovered from the metadata
    server; for CPU/GPU simulation pass them explicitly.  Must run before
    anything initializes the XLA backend.  Returns
    (process_index, process_count); already-initialized (or genuinely
    single-process) contexts pass through.
    """
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id,
                local_device_ids=local_device_ids)
        else:
            jax.distributed.initialize()   # TPU pod: auto-discovered
    except (RuntimeError, ValueError):
        # backend already up (second call) or nothing to auto-discover
        # (plain single-process CPU/GPU run) — both are fine
        pass
    return jax.process_index(), jax.process_count()


def global_mesh(model_axis=1, axis_names=("data", "model")):
    """A mesh over every device of every process (row-major device order),
    with ``model_axis`` devices on the table-sharding axis."""
    devices = jax.devices()
    n = len(devices)
    if n % model_axis:
        raise ValueError("%d devices not divisible by model_axis=%d"
                         % (n, model_axis))
    return make_mesh((n // model_axis, model_axis), axis_names,
                     devices=devices)


def host_local_rows(global_batch_size):
    """(start, stop) rows of the global batch owned by this process.

    The data axis is laid out process-major (jax.devices() orders by
    process), so each process feeds one contiguous slice.
    """
    per = global_batch_size // jax.process_count()
    if global_batch_size % jax.process_count():
        raise ValueError("global batch %d not divisible by %d processes"
                         % (global_batch_size, jax.process_count()))
    start = jax.process_index() * per
    return start, start + per


def global_batch_from_host_local(mesh, *host_arrays):
    """Assemble per-process host shards into globally-sharded jax arrays.

    Each array's leading axis is this process's slice of the global
    batch (see :func:`host_local_rows`); the result is one logical array
    of global batch size, sharded over the mesh 'data' axis, usable
    directly by the jitted train step.
    """
    sharding = batch_sharding(mesh)
    out = [jax.make_array_from_process_local_data(sharding, np.asarray(a))
           for a in host_arrays]
    return out[0] if len(out) == 1 else tuple(out)
