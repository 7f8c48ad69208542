"""Multi-host (pod) runtime initialization.

The reference is strictly single-process (SURVEY.md §2: no distributed
backend; its DataLoader workers share one filesystem view,
data_loaders.py:92-99). On a TPU pod each host runs the same program and
must join a jax.distributed coordination service BEFORE first device use so
that ``jax.process_index()/process_count()`` reflect the pod — everything
downstream (data/elastic.py shard_windows + lockstep_batches, parallel/dp.py
shard_batch's global-array assembly) keys off those.

Launch modes:

* TPU pods / environments with a cluster resolver:
  ``--distributed 1`` alone — ``jax.distributed.initialize()`` autodetects
  coordinator + process ids from the TPU metadata.
* Manual (CPU/GPU clusters, tests): ``--coordinator_address host:port
  --num_processes N --process_id i``.

``init_distributed`` is idempotent (repeat calls with the same arguments are
no-ops) so CLIs can call it unconditionally.
"""

from __future__ import annotations

_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> None:
    """Join (or start) the jax.distributed coordination service.

    Must run before the first backend touch (device_count, device_put,
    jit dispatch). With no arguments, defers to JAX's cluster autodetection
    (Cloud TPU metadata / SLURM / OMPI env). Subsequent calls are no-ops.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True


def add_pod_args(parser) -> None:
    """Launch-time pod flags. These are runtime topology, not model config:
    Config.from_dict drops them, so they never persist into a version dir
    (a checkpoint trained on 4 hosts must restore on 1)."""
    parser.add_argument(
        "--distributed", type=int, default=0,
        help="join a jax.distributed pod before touching devices "
             "(1 + no coordinator flags = autodetect, e.g. Cloud TPU pods)")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0's coordination service")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)


def maybe_init_from_args(args) -> None:
    """CLI entry hook: initialize the pod iff requested by the flags."""
    explicit = args.coordinator_address is not None or (
        args.num_processes is not None or args.process_id is not None)
    if not (args.distributed or explicit):
        return
    init_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
