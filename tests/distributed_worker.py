"""Subprocess worker for the two-process jax.distributed test.

Runs one DP train step on the tiny detector and prints a JSON line with the
loss and a post-update parameter checksum. Two roles:

  dist   <coordinator> <process_id> <num_processes>   — 2 CPU devices/process,
         global 2*nproc-device mesh across processes; this process feeds its
         local 8/nproc-row shard of the global 8-row batch.
  single [<ndevices>=4]                               — one process, ndevices
         CPU devices, the full 8-row batch.

Loss and updated params must match between the two modes (same global mesh
size, same seeds): that is the multi-host correctness claim of
parallel/distributed.py + parallel/mesh.py (SURVEY.md §2 parallelism, DDP row).
"""

import json
import sys


def main():
    role = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")
    single_devices = int(sys.argv[2]) if role == "single" and len(sys.argv) > 2 else 4
    jax.config.update("jax_num_cpu_devices",
                      2 if role == "dist" else single_devices)

    pid, nproc = 0, 1
    if role == "dist":
        coord, pid, nproc = sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        from tdrn_tpu.parallel.distributed import init_distributed

        init_distributed(coord, num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc, jax.process_count()
        assert jax.device_count() == 2 * nproc

    import numpy as np
    import jax.numpy as jnp
    from tdrn_tpu.parallel import make_mesh, replicate_tree, shard_batch_tree
    from tdrn_tpu.train import init_train_state, make_optimizer, make_train_step
    from tests.helpers import tiny_detector
    from tests.test_loss import synth_batch

    model = tiny_detector(temporal=False)
    opt = make_optimizer(base_lr=1e-3, warmup_steps=1)
    mesh = make_mesh()

    rng = np.random.RandomState(0)
    images, targets = synth_batch(rng, batch=8)
    if role == "dist":
        rows = 8 // nproc  # this host's batch shard
        lo, hi = pid * rows, pid * rows + rows
        images = np.asarray(images)[lo:hi]
        targets = jax.tree.map(lambda x: np.asarray(x)[lo:hi], targets)

    ts = init_train_state(model, jax.random.PRNGKey(0), opt, batch=8)
    ts = replicate_tree(ts, mesh)
    images = shard_batch_tree(np.asarray(images), mesh)
    targets = shard_batch_tree(jax.tree.map(np.asarray, targets), mesh)

    step = make_train_step(model, opt)
    ts, metrics = step(ts, images, targets)

    checksum = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p))
    )(ts.params)
    out = {
        "role": role,
        "pid": pid,
        "devices": jax.device_count(),
        "loss": float(metrics["loss"]),
        "checksum": float(checksum),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
