"""2-process multi-host SIMULATION on CPU (no TPU pod needed).

Spawns two worker processes, each with 4 virtual CPU devices, joined via
``jax.distributed`` into one 8-device runtime; each worker builds the
global ("data", "model") mesh, feeds its host-local slice of the global
batch (parallel/distributed.py helpers), and runs real training steps of
the flagship model.  Validates the full multi-controller path — device
discovery across processes, globally-sharded batch assembly, GSPMD
collectives spanning both processes — without TPU hardware.

Usage:  python tools/multiprocess_sim.py          # launcher
        (workers are re-invocations with _WORKER set)

Exit code 0 = both workers finished and produced identical predictions.
"""

import os
import subprocess
import sys

PORT = int(os.environ.get("SIM_PORT", "18731"))
NPROC = 2
DEVICES_PER_PROC = 4
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid):
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                               % DEVICES_PER_PROC)
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from deepctr_tpu.parallel import distributed as dist

    dist.initialize("localhost:%d" % PORT, NPROC, pid)
    assert jax.process_count() == NPROC, jax.process_count()
    assert len(jax.devices()) == NPROC * DEVICES_PER_PROC

    import numpy as np
    from deepctr_tpu.features import SparseFeat, DenseFeat
    from deepctr_tpu.models import DeepFM

    mesh = dist.global_mesh(model_axis=2)
    cols = [SparseFeat("c0", 64, 8), SparseFeat("c1", 32, 8),
            DenseFeat("d0", 1)]
    model = DeepFM(cols, cols, dnn_hidden_units=(16,), seed=3, mesh=mesh,
                   shard_embeddings=True)
    model.compile("adagrad", "binary_crossentropy")

    B = 32                      # global batch
    rng = np.random.default_rng(0)
    X_all = model._assemble_x({"c0": rng.integers(0, 64, B),
                               "c1": rng.integers(0, 32, B),
                               "d0": rng.random(B)})
    y_all = rng.integers(0, 2, B).astype(np.float32)[:, None]
    sw_all = np.ones((B,), np.float32)

    lo, hi = dist.host_local_rows(B)
    Xg, yg, swg = dist.global_batch_from_host_local(
        mesh, X_all[lo:hi], y_all[lo:hi], sw_all[lo:hi])

    model._ensure_compiled()
    for step in range(3):
        rng_j = jax.random.PRNGKey(step)
        (model.params, model.opt_state, model.table_state,
         model.batch_stats, _, total, _) = model._train_step(
            model.params, model.opt_state, model.table_state,
            model.batch_stats, rng_j, Xg, yg, swg)
    loss = float(total)
    # every process must hold the same replicated dense params
    probe = float(jax.tree_util.tree_leaves(model.params)[0].sum())
    print("WORKER %d OK loss=%.6f probe=%.6f" % (pid, loss, probe),
          flush=True)


def main():
    if os.environ.get("_WORKER"):
        worker(int(os.environ["_WORKER"]) - 1)
        return
    procs = []
    for pid in range(NPROC):
        env = dict(os.environ, _WORKER=str(pid + 1))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs, codes = [], []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        codes.append(p.returncode)
    ok_lines = [l for out in outs for l in out.splitlines()
                if l.startswith("WORKER") and "OK" in l]
    for out, code in zip(outs, codes):
        if code != 0:
            sys.stdout.write(out)
    if any(codes) or len(ok_lines) != NPROC:
        print("MULTIPROCESS SIM FAILED", codes)
        sys.exit(1)
    # identical loss + replicated params across processes
    stats = {l.split("OK ", 1)[1] for l in ok_lines}
    if len(stats) != 1:
        print("MULTIPROCESS SIM DIVERGED:", ok_lines)
        sys.exit(1)
    print("MULTIPROCESS SIM OK (%d procs x %d devices): %s"
          % (NPROC, DEVICES_PER_PROC, stats.pop()))


if __name__ == "__main__":
    main()
