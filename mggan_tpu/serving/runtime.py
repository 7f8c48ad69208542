"""Serving-side model wrapper + micro-batching queue.

``ServingModel`` adapts variable-sized requests (one scene of p pedestrians,
8 observed steps each) to the fixed ``(scenes, peds, 20, 2)`` shape an
exported artifact (cli/export.py) was ahead-of-time compiled for: scenes are
padded/stripped at the edge, never recompiled. ``MicroBatcher`` aggregates
concurrent single-scene requests into one device call (classic serving-side
dynamic batching — the device batch is the throughput lever on TPU, see
BASELINE.md's flat batch scaling).

The reference has no equivalent (no serving path at all); shapes follow its
data contract: OBS_LEN=8 observed positions in, (num, peds, 12, 2) absolute
future positions out (BaseTrajectories.py:30-31).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from pathlib import Path

import numpy as np

from mggan_tpu.config import OBS_LEN

PRED_LEN = 12
SEQ_LEN = 20
PATCH_HW = 33
PATCH_C = 4


class ServingModel:
    """Fixed-shape inference front-end.

    call(xy (S,P,20,2) f32, ped_mask (S,P) bool, patches (S,P,33,33,4) f32,
    seed i32) -> pred_abs (num, S, P, 12, 2) — the cli/export.py serving
    contract, backed either by a deserialized artifact or a live Predictor.
    """

    def __init__(self, call, scenes: int, peds: int, num: int, *,
                 strategy: str = "?", source: str = "?"):
        self._call = call
        self.scenes = scenes
        self.peds = peds
        self.num = num
        self.strategy = strategy
        self.source = source
        self._zero_patches = np.zeros(
            (scenes, peds, PATCH_HW, PATCH_HW, PATCH_C), np.float32
        )

    # ------------------------------------------------------------- builders
    @classmethod
    def from_artifact(cls, path) -> "ServingModel":
        """Load a serialized ``jax.export`` artifact; shapes come from its
        input avals, so the artifact is fully self-describing."""
        from mggan_tpu.cli.export import load_artifact

        exported = load_artifact(path)
        s, p = exported.in_avals[0].shape[:2]
        num = exported.out_avals[0].shape[0]  # pred_abs (num, S, P, 12, 2)
        return cls(exported.call, s, p, num,
                   strategy="artifact", source=str(Path(path)))

    @classmethod
    def from_predictor(cls, predictor, strategy: str, scenes: int, peds: int,
                       num: int) -> "ServingModel":
        """Live (non-exported) path: jit the same serving function."""
        import functools

        import jax

        from mggan_tpu.cli.export import build_serving_fn

        serve = jax.jit(functools.partial(
            build_serving_fn(predictor, strategy), num=num
        ))
        return cls(serve, scenes, peds, num, strategy=strategy, source="live")

    @classmethod
    def from_version_dir(cls, version_dir, strategy="sampling", scenes=64,
                         peds=16, num=20, checkpoint="best") -> "ServingModel":
        from mggan_tpu.training.loop import Trainer

        trainer, _ = Trainer.load_from_path(Path(version_dir), checkpoint)
        m = cls.from_predictor(trainer.predictor(), strategy, scenes, peds, num)
        m.source = str(Path(version_dir))
        return m

    # ------------------------------------------------------------- predict
    def predict_batch(self, scene_obs, patches=None, seed: int = 0):
        """Run one device call over up to ``self.scenes`` scenes.

        Args:
            scene_obs: list of (p_i, >=OBS_LEN, 2) float arrays — the last
                OBS_LEN rows are the observed positions.
            patches: optional list of (p_i, 33, 33, 4) scene patches
                (zeros for scene-less models).
            seed: RNG seed for the sampling strategies.

        Returns:
            list of (num, p_i, 12, 2) absolute future positions.
        """
        s, p = self.scenes, self.peds
        if len(scene_obs) > s:
            raise ValueError(f"{len(scene_obs)} scenes > compiled batch {s}")
        xy = np.zeros((s, p, SEQ_LEN, 2), np.float32)
        mask = np.zeros((s, p), bool)
        pat = self._zero_patches.copy() if patches is not None else self._zero_patches
        for i, obs in enumerate(scene_obs):
            obs = np.asarray(obs, np.float32)
            if obs.ndim != 3 or obs.shape[-1] != 2 or obs.shape[1] < OBS_LEN:
                raise ValueError(
                    f"scene {i}: expected (peds, >={OBS_LEN}, 2), got {obs.shape}"
                )
            n = obs.shape[0]
            if n > p:
                raise ValueError(f"scene {i}: {n} peds > compiled max {p}")
            xy[i, :n, :OBS_LEN] = obs[:, -OBS_LEN:]
            # pad the unobserved future with the last observed position so
            # any (masked-out) consumption of those steps stays finite
            xy[i, :n, OBS_LEN:] = obs[:, -1:, :]
            mask[i, :n] = True
            if patches is not None and patches[i] is not None:
                pat[i, :n] = np.asarray(patches[i], np.float32)
        out = np.asarray(self._call(xy, mask, pat, np.int32(seed)))
        return [out[:, i, : o.shape[0]] for i, o in enumerate(scene_obs)]

    def predict(self, obs, patches=None, seed: int = 0):
        """Single scene: (p, >=8, 2) -> (num, p, 12, 2)."""
        return self.predict_batch(
            [obs], None if patches is None else [patches], seed
        )[0]


class _Request:
    __slots__ = ("obs", "patches", "seed", "future")

    def __init__(self, obs, patches, seed):
        self.obs = obs
        self.patches = patches
        self.seed = seed
        self.future: Future = Future()


class MicroBatcher:
    """Cross-request dynamic batching.

    Requests (one scene each) queue up; a worker thread drains up to
    ``model.scenes`` of them — waiting at most ``max_wait_ms`` after the
    first — and issues ONE device call. The device takes a single scalar
    seed per batch; it is derived by folding EVERY request's seed in queue
    order, and scene noise is drawn per batch slot, so identical concurrent
    requests still get distinct samples while replaying the same request
    stream reproduces the same predictions. Shut down with ``close()``
    (also a context manager).
    """

    def __init__(self, model: ServingModel, max_wait_ms: float = 5.0):
        self.model = model
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self.batches_run = 0
        self.requests_served = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, obs, patches=None, seed: int = 0) -> Future:
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        req = _Request(np.asarray(obs, np.float32), patches, int(seed))
        self._q.put(req)
        return req.future

    def predict(self, obs, patches=None, seed: int = 0, timeout=60.0):
        return self.submit(obs, patches, seed).result(timeout)

    # ------------------------------------------------------------ internals
    def _drain(self):
        """Block for one request, then collect more until the batch is full
        or max_wait elapses. Returns [] only on shutdown."""
        import time

        try:
            first = self._q.get(timeout=0.1)
        except queue.Empty:
            return []
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.model.scenes:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-signal shutdown after this batch
                break
            batch.append(nxt)
        return batch

    def _run(self):
        while True:
            if self._closed and self._q.empty():
                return
            batch = self._drain()
            if not batch:
                if self._closed:
                    return
                continue
            try:
                # one device seed per batch (the artifact takes a scalar):
                # fold every request's seed in queue order — deterministic
                # given the request stream, distinct when any seed differs
                seed = 0
                for r in batch:
                    seed = (seed * 1_000_003 + r.seed + 1) % 2**31
                patches = (
                    None
                    if all(r.patches is None for r in batch)
                    else [r.patches for r in batch]
                )
                outs = self.model.predict_batch(
                    [r.obs for r in batch], patches, seed
                )
                self.batches_run += 1
                self.requests_served += len(batch)
                for r, o in zip(batch, outs):
                    r.future.set_result(o)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def close(self):
        self._closed = True
        self._q.put(None)
        self._worker.join(timeout=10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
