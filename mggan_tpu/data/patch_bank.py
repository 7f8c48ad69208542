"""Device-resident patch bank: TPU-native replacement for host-side patch
batch assembly.

The reference collates per-ped image crops into every batch on the host
(trajectories_scene.py:40-78). At TPU step rates (~200 batches/s at 4096
agents) that is host-bound (tens of ms of memcpy/zeroing per batch on this
machine) and transfer-bound (~30 MB of uint8 patches per batch across the
host<->device link). Instead, the whole split's uint8 big patches are laid
out ONCE as a dense ``(num_windows, max_peds, 49, 49, 3)`` array and placed
in device HBM; each batch the device gathers rows by window index (one
``jnp.take`` from HBM, microseconds) and only trajectories (~100 KB) cross
the host boundary. The gather is dispatched from the prefetch thread, so it
overlaps the train step.
"""

from __future__ import annotations

import weakref

import numpy as np

from mggan_tpu.data.dataset import BIG_PATCH, SceneDataset

# Combined HBM budget across ALL live banks (a v5e chip has 16 GiB; the
# flagship model is tiny, so half the chip is a safe ceiling). The Trainer
# keeps train+val banks resident simultaneously and test() adds a third, so
# the budget is enforced globally: a split that would push the combined
# total past the ceiling falls back to host-side assembly
# (PaddedBatcher include_patches=True).
DEFAULT_MAX_BYTES = 8 << 30

_LIVE_BANKS = weakref.WeakSet()


def live_bank_bytes() -> int:
    """Bytes currently held in device HBM by live banks (per device; a
    mesh-replicated bank holds one copy per device)."""
    return sum(b.nbytes for b in _LIVE_BANKS)


def bank_nbytes(num_windows: int, max_peds: int) -> int:
    return num_windows * max_peds * BIG_PATCH * BIG_PATCH * 3


class DevicePatchBank:
    """Dense per-window patch storage living on the accelerator.

    ``gather(window_idx)`` returns ``(S, P, 49, 49, 3)`` uint8 on device,
    bitwise-equal to the host-assembled ``big_patches`` batch (padded ped
    rows and ``window_idx == -1`` pad scenes are zero).
    """

    def __init__(self, ds: SceneDataset, max_peds: int, device=None,
                 mesh=None):
        import jax
        import jax.numpy as jnp

        n = len(ds.trajectories)
        dense = np.zeros((n, max_peds, BIG_PATCH, BIG_PATCH, 3), np.uint8)
        for wi, patches in enumerate(ds.big_patches):
            dense[wi, : len(patches)] = patches
        # Stored 2D (rows = windows): XLA lowers a 2D row gather as bulk
        # dynamic-slices (~5 ms/batch on v5e through the tunnel), while the
        # same take on the 5D layout is ~40x slower.
        arr = jnp.asarray(dense.reshape(n, -1))
        if mesh is not None:
            # Replicate across the mesh so gathers run on every device and
            # the downstream shard_batch relayout is a local slice, not a
            # host round-trip (the DP feed keeps the bank's batch rate).
            from jax.sharding import NamedSharding, PartitionSpec

            arr = jax.device_put(arr, NamedSharding(mesh, PartitionSpec()))
        elif device is not None:
            arr = jax.device_put(arr, device)
        self.arr = arr
        self.nbytes = int(arr.nbytes)
        self.max_peds = max_peds

        @jax.jit
        def _gather(bank, idx):
            rows = jnp.take(bank, jnp.maximum(idx, 0), axis=0)
            rows = jnp.where((idx >= 0)[:, None], rows, jnp.uint8(0))
            return rows.reshape(
                idx.shape[0], max_peds, BIG_PATCH, BIG_PATCH, 3
            )

        self._gather = _gather

    def gather(self, window_idx: np.ndarray):
        import jax.numpy as jnp

        return self._gather(self.arr, jnp.asarray(window_idx, jnp.int32))


def maybe_build_bank(
    ds: SceneDataset,
    max_peds: int,
    enabled: bool = True,
    max_bytes: int = DEFAULT_MAX_BYTES,
    mesh=None,
):
    """Build a bank when enabled, patches exist, and the split fits the
    remaining global HBM budget; otherwise None (callers keep the host
    assembly path)."""
    if not enabled or ds.big_patches is None:
        return None
    if bank_nbytes(len(ds.trajectories), max_peds) + live_bank_bytes() > max_bytes:
        return None
    if mesh is not None:
        import jax

        if jax.process_count() > 1:
            # SHARD-LOCAL bank: a mesh-replicated bank would be a global
            # array jax assumes holds IDENTICAL values on every process,
            # but on a pod each host builds it from its own disjoint
            # elastic window shard (data/elastic.py) — so instead each
            # process banks ONLY its shard on its first addressable
            # device. Gathered rows are process-local (exactly this
            # host's scene rows) and re-enter the global batch through
            # elastic.make_global_batch, which accepts device leaves.
            bank = DevicePatchBank(ds, max_peds,
                                   device=jax.local_devices()[0])
            _LIVE_BANKS.add(bank)
            return bank
    bank = DevicePatchBank(ds, max_peds, mesh=mesh)
    _LIVE_BANKS.add(bank)
    return bank
