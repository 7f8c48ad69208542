"""Subprocess worker for tests/test_pod.py — joins a REAL multi-process
``jax.distributed`` pod on CPU (Gloo cross-process collectives) and runs
one sharded train step.

Run as:  python tests/_pod_worker.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.

With num_processes==1 it runs the identical program single-process — the
parent test compares its metrics against the pod run (the reference point:
a pod must compute the same global step as one process holding all devices,
SURVEY.md §5 distributed-backend build item).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nprocs > 1:
        from mggan_tpu.parallel.pod import init_distributed

        init_distributed(
            coordinator_address=f"localhost:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp

    from mggan_tpu.config import Config
    from mggan_tpu.data.loaders import get_dataloader
    from mggan_tpu.models import factory
    from mggan_tpu.parallel import dp, mesh as mesh_lib
    from mggan_tpu.training.state import init_train_state

    # Deterministic model + batch, identical on every process (and identical
    # to tests/test_parallel.py::setup so numbers stay comparable there).
    cfg = Config(
        dataset="synthetic_memory", batch_size=8, num_gens=2,
        num_samples=4, h_dim=16, decoder_h_dim=16,
        gan_type="mgan", weighting_target="ml",
    )
    g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    loader = get_dataloader(cfg.dataset, "train", batch_size=8, shuffle=False)
    batch = next(iter(loader))
    patches = jax.random.uniform(
        jax.random.PRNGKey(5), batch["xy"].shape[:2] + (33, 33, 4),
        minval=-1.0, maxval=1.0,
    )
    full = {
        "xy": jnp.asarray(batch["xy"]),
        "ped_mask": jnp.asarray(batch["ped_mask"]),
        "patches": patches,
    }

    # Elastic loader under the LIVE pod runtime (no explicit process args):
    # every process must agree on batch count and padded ped width.
    shard_loader = get_dataloader(
        cfg.dataset, "train", batch_size=4, shard_by_process=True
    )
    elastic_info = {
        "num_batches": len(shard_loader),
        "max_peds": int(shard_loader.max_peds),
    }

    # Shard-local patch bank (data/patch_bank.py): each process banks only
    # its own elastic window shard on a local device; the gathered
    # big_patches must equal host assembly bitwise, per batch, on the live
    # pod runtime.
    import numpy as np

    mesh0 = mesh_lib.make_mesh(dp=jax.device_count())
    bank_loader = get_dataloader(
        cfg.dataset, "train", batch_size=4, shard_by_process=True,
        patch_bank=True, bank_mesh=mesh0,
    )
    assert bank_loader.patch_bank is not None, "bank fell back on the pod"
    bank_ok = True
    bank_sum = 0
    for bh, bb in zip(shard_loader, bank_loader):
        got = np.asarray(bb["big_patches"])
        bank_ok &= bool((got == bh["big_patches"]).all())
        bank_sum += int(got.astype(np.int64).sum())

    mesh = mesh_lib.make_mesh(dp=jax.device_count())
    # Contiguous scene split -> the assembled global batch has exactly the
    # single-process row order, so metrics are directly comparable.
    s = full["xy"].shape[0]
    lo, hi = pid * s // nprocs, (pid + 1) * s // nprocs
    local = jax.tree.map(lambda x: x[lo:hi], full)
    gbatch = dp.shard_batch(mesh, local)

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    checksum = float(
        jax.jit(lambda x: x.sum(), out_shardings=rep)(gbatch["xy"])
    )

    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, gbatch
    )
    _, metrics = pstep(pstate, gbatch)

    # Cross-process eval-metric reduction (training/loop.py::check_accuracy
    # feeds per-host shard sums through this to get one global, host-
    # identical number for the best-checkpoint branch).
    from mggan_tpu.eval.metrics import allreduce_sums

    local_sums = {"ADE k=3": (float(pid + 1), 2.0), "FDE k=3": (10.0, 1.0)}
    reduced = allreduce_sums(local_sums)

    out = {
        "pid": pid,
        "batch_checksum": checksum,
        "bank_ok": bank_ok,
        "bank_sum": bank_sum,
        "elastic": elastic_info,
        "metrics": {k: float(v) for k, v in metrics.items()},
        "reduced_sums": {k: list(v) for k, v in sorted(reduced.items())},
    }
    print("POD " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
