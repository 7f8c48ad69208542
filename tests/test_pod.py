"""True multi-process pod test: two OS processes join a jax.distributed
coordination service (CPU backend, Gloo cross-process collectives), shard
one global batch via ``parallel/dp.py::shard_batch`` ->
``make_array_from_process_local_data``, and run one sharded train step.

This exercises what the in-process 8-device mesh tests cannot: the
coordinator handshake (``parallel/pod.py``), per-host local-batch assembly,
cross-process collectives inside the jitted step, and the live
``jax.process_count()`` plumbing of the elastic loader. The pod's metrics
must match a single-process run holding all 8 devices (the reference is
single-device everywhere, SURVEY.md §2; the distributed backend is a
TPU-build item, §5).

Slow (~2-4 min: two concurrent CPU train-step compiles on one core) — the
strongest multi-host evidence available without pod hardware.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_pod_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(pid, nprocs, port, local_devices):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={local_devices}",
    )
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nprocs), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO,
    )


def _result(proc):
    out, err = proc.communicate(timeout=900)
    assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
    line = [l for l in out.splitlines() if l.startswith("POD ")]
    assert line, f"no POD line in:\n{out}\n{err}"
    return json.loads(line[-1][4:])


def test_two_process_pod_matches_single_process():
    port = _free_port()
    # pod: 2 processes x 4 virtual devices = 8 global
    pods = [_launch(p, 2, port, 4) for p in range(2)]
    results = [_result(p) for p in pods]
    # single-process reference on 8 devices, same program
    ref = _result(_launch(0, 1, 0, 8))

    # both pod processes observed the identical replicated outputs
    assert results[0]["metrics"] == results[1]["metrics"]
    assert results[0]["batch_checksum"] == results[1]["batch_checksum"]

    # the assembled global batch IS the single-process batch (tolerance:
    # the 2-process f32 sum tree differs from the 1-process one)
    np.testing.assert_allclose(
        results[0]["batch_checksum"], ref["batch_checksum"], rtol=1e-6
    )

    # elastic loader agrees across the pod on lockstep count + ped width,
    # and the pod's global quantities match the single-process loader
    assert results[0]["elastic"] == results[1]["elastic"]
    assert results[0]["elastic"]["max_peds"] == ref["elastic"]["max_peds"]

    # shard-local patch bank: on every process (pod AND single) the device
    # bank's gathered big_patches equal host assembly bitwise, and the two
    # pod shards together cover exactly the single process's patch mass
    assert all(r["bank_ok"] for r in results + [ref])
    assert results[0]["bank_sum"] + results[1]["bank_sum"] == ref["bank_sum"]

    # one sharded train step: pod == single process (Gloo reduction order
    # may differ from the in-process all-reduce -> tolerance, not bitwise)
    for k, v in ref["metrics"].items():
        np.testing.assert_allclose(
            results[0]["metrics"][k], v, rtol=1e-4, atol=1e-6, err_msg=k
        )

    # eval-metric (sum, count) all-reduce: every host gets the exact global
    # pairs (worker pid p contributes ADE sum p+1) — the best-checkpoint
    # branch in training/loop.py depends on this being host-identical
    assert results[0]["reduced_sums"] == results[1]["reduced_sums"]
    assert results[0]["reduced_sums"]["ADE k=3"] == [3.0, 4.0]
    assert results[0]["reduced_sums"]["FDE k=3"] == [20.0, 2.0]
    # single-process identity
    assert ref["reduced_sums"]["ADE k=3"] == [1.0, 2.0]
