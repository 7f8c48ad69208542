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
import warnings
from concurrent.futures import Future
from pathlib import Path

import numpy as np

from mggan_tpu.config import OBS_LEN
from mggan_tpu.data.dataset import BIG_MARGIN, MARGIN, extract_big_patches

PRED_LEN = 12
SEQ_LEN = 20
PATCH_HW = 33
PATCH_C = 4


class MissingSceneInputError(ValueError):
    """A scene-conditioned model (scene CNN in the graph) was asked to
    predict without scene patches. The reference treats the 4x33x33 scene
    patch as a first-class model input (BaseTrajectories.py:254-288);
    serving on zero patches silently degrades predictions, so it is an
    error unless ``allow_missing_scene`` opts in explicitly."""


def finish_patches_center(big_patches: np.ndarray) -> np.ndarray:
    """uint8 (N,49,49,3) big patches -> (N,33,33,4) float32 model patches.

    Numpy twin of ``data/augment.py::identity_patches`` (the eval-time
    identity transform: pure centre crop, [-1,1) normalisation
    (BaseTrajectories.py:283), one-hot centre channel) — bit-identical, so
    server-side cropping matches the training/eval feed exactly
    (tests/test_serving.py::test_finish_patches_center_matches_identity).
    """
    n = big_patches.shape[0]
    off = BIG_MARGIN - MARGIN
    rgb = big_patches[:, off : off + PATCH_HW, off : off + PATCH_HW].astype(
        np.float32
    )
    rgb = -1.0 + rgb * 2.0 / 256.0
    pos = np.zeros((n, PATCH_HW, PATCH_HW, 1), np.float32)
    pos[:, MARGIN, MARGIN, 0] = 1.0
    return np.concatenate([rgb, pos], axis=-1)


class ServingModel:
    """Fixed-shape inference front-end.

    call(xy (S,P,20,2) f32, ped_mask (S,P) bool, patches (S,P,33,33,4) f32,
    seed i32) -> pred_abs (num, S, P, 12, 2) — the cli/export.py serving
    contract, backed either by a deserialized artifact or a live Predictor.

    ``wants_scene`` records whether the underlying model has a scene CNN
    (GeneratorSpec.scene_dim > 0; None = unknown, e.g. a legacy artifact
    without a metadata header). When True and a request carries no scene
    input, prediction raises ``MissingSceneInputError`` unless the model
    was built with ``allow_missing_scene=True`` (then it warns once).
    Scene input arrives either as ready-made (p,33,33,4) patches or by
    registering a scene image (``register_scene``) and letting
    ``crop_patches`` cut them server-side at each ped's last observed
    position — the same centre-crop the eval pipeline uses.

    ``calls`` maps scene-count buckets to compiled programs: a request of
    n scenes is padded only to the smallest bucket >= n, so a 1-scene
    request moves (1,P,33,33,4) patch bytes over the interconnect instead
    of the full max-batch tensor (64x less host<->device traffic at the
    default shapes — the dominant single-request cost through a remote
    tunnel, see BASELINE.md's serving table). ``scenes`` is the largest
    bucket; a plain single-program model is the ``{scenes: call}`` case.
    """

    def __init__(self, calls, scenes: int, peds: int, num: int, *,
                 strategy: str = "?", source: str = "?",
                 wants_scene: bool | None = None,
                 allow_missing_scene: bool = False):
        if callable(calls):
            calls = {scenes: calls}
        self._calls = dict(sorted(calls.items()))
        self.buckets = tuple(self._calls)
        assert scenes == self.buckets[-1], (
            f"scenes={scenes} must equal the largest bucket {self.buckets}"
        )
        self.scenes = scenes
        self.peds = peds
        self.num = num
        self.strategy = strategy
        self.source = source
        self.wants_scene = wants_scene
        self.allow_missing_scene = allow_missing_scene
        self._warned_missing = False
        # name -> {"small": HxWx3 uint8 half-res scene image,
        #          "px_per_meter": pixels per meter of that image}
        self.scene_registry: dict = {}
        self._zero_patches = np.zeros(
            (scenes, peds, PATCH_HW, PATCH_HW, PATCH_C), np.float32
        )

    # ------------------------------------------------------------- builders
    @classmethod
    def from_artifact(cls, path, allow_missing_scene: bool = False) -> "ServingModel":
        """Load a serialized ``jax.export`` artifact; shapes come from its
        input avals and ``wants_scene`` from the metadata header (None for
        legacy header-less artifacts). Multi-bucket artifacts
        (cli/export.py ``--scenes 1,8,64``) load every bucket program."""
        from mggan_tpu.cli.export import load_artifact_all

        exporteds, meta = load_artifact_all(path)
        calls = {e.in_avals[0].shape[0]: e.call for e in exporteds}
        p = exporteds[0].in_avals[0].shape[1]
        num = exporteds[0].out_avals[0].shape[0]  # pred_abs (num,S,P,12,2)
        return cls(calls, max(calls), p, num,
                   strategy=meta.get("strategy", "artifact"),
                   source=str(Path(path)),
                   wants_scene=meta.get("wants_scene"),
                   allow_missing_scene=allow_missing_scene)

    @classmethod
    def from_predictor(cls, predictor, strategy: str, scenes: int, peds: int,
                       num: int, allow_missing_scene: bool = False,
                       scene_buckets=None) -> "ServingModel":
        """Live (non-exported) path: jit the same serving function.

        ``scene_buckets``: optional ascending scene-count paddings (the
        largest must equal ``scenes``); one jitted program per bucket,
        compiled lazily on first use of that shape."""
        import functools

        import jax

        from mggan_tpu.cli.export import build_serving_fn

        serve = jax.jit(functools.partial(
            build_serving_fn(predictor, strategy), num=num
        ))
        buckets = tuple(scene_buckets) if scene_buckets else (scenes,)
        return cls({b: serve for b in buckets}, scenes, peds, num,
                   strategy=strategy, source="live",
                   wants_scene=predictor.g_spec.scene_dim > 0,
                   allow_missing_scene=allow_missing_scene)

    @classmethod
    def from_version_dir(cls, version_dir, strategy="sampling", scenes=64,
                         peds=16, num=20, checkpoint="best",
                         allow_missing_scene: bool = False,
                         scene_buckets=None) -> "ServingModel":
        from mggan_tpu.training.loop import Trainer

        trainer, _ = Trainer.load_from_path(Path(version_dir), checkpoint)
        m = cls.from_predictor(trainer.predictor(), strategy, scenes, peds,
                               num, allow_missing_scene=allow_missing_scene,
                               scene_buckets=scene_buckets)
        m.source = str(Path(version_dir))
        return m

    # -------------------------------------------------------- scene context
    def register_scene(self, name: str, image, px_per_meter: float):
        """Register a half-resolution scene image for server-side patch
        cropping. ``image``: (H,W,3) uint8 RGB at the training pipeline's
        "small" resolution (data/parsing.py::build_image_entry);
        ``px_per_meter``: its pixels-per-meter (1/scaling_small)."""
        img = np.ascontiguousarray(np.asarray(image, dtype=np.uint8))
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"scene image must be (H,W,3) uint8, got {img.shape}")
        self.scene_registry[name] = {
            "small": img, "px_per_meter": float(px_per_meter)
        }

    def crop_patches(self, scene_name: str, obs) -> np.ndarray:
        """Cut (p,33,33,4) model patches from a registered scene at each
        ped's last observed position — the training-time crop
        (data/parsing.py:254-256) followed by the eval identity transform."""
        if scene_name not in self.scene_registry:
            raise KeyError(
                f"scene {scene_name!r} not registered (have "
                f"{sorted(self.scene_registry)}); POST /v1/scenes or call "
                f"register_scene() first"
            )
        entry = self.scene_registry[scene_name]
        obs = np.asarray(obs, np.float32)
        centers_px = obs[:, -1] * entry["px_per_meter"]  # last observed pos
        big = extract_big_patches(entry["small"], centers_px)
        return finish_patches_center(big)

    def check_scene_input(self, have_patches: bool):
        """Enforce the scene contract for one request. Raises
        ``MissingSceneInputError`` for a scene-conditioned model with no
        scene input (warns instead when allow_missing_scene / unknown)."""
        if have_patches or self.wants_scene is False:
            return
        if self.wants_scene and not self.allow_missing_scene:
            raise MissingSceneInputError(
                "this model conditions on scene patches but the request "
                "carries none — pass per-scene (p,33,33,4) patches, or "
                "register a scene image and reference it, or opt out "
                "explicitly with allow_missing_scene=True "
                "(--allow_missing_scene) to serve degraded zero-patch "
                "predictions"
            )
        if not self._warned_missing:
            self._warned_missing = True
            reason = (
                "allow_missing_scene=True" if self.wants_scene
                else "wants_scene unknown (legacy artifact without a "
                     "metadata header)"
            )
            warnings.warn(
                f"serving without scene patches ({reason}): a "
                "scene-conditioned model will produce degraded "
                "zero-patch predictions",
                stacklevel=2,
            )

    # ------------------------------------------------------------- predict
    def predict_batch(self, scene_obs, patches=None, seed: int = 0):
        """Run one device call over up to ``self.scenes`` scenes.

        Args:
            scene_obs: list of (p_i, >=OBS_LEN, 2) float arrays — the last
                OBS_LEN rows are the observed positions.
            patches: optional list of (p_i, 33, 33, 4) scene patches
                (zeros for scene-less models). Required per scene when
                ``wants_scene`` is True (see ``check_scene_input``).
            seed: RNG seed for the sampling strategies.

        Returns:
            list of (num, p_i, 12, 2) absolute future positions.
        """
        n, p = len(scene_obs), self.peds
        if n > self.scenes:
            raise ValueError(f"{n} scenes > compiled batch {self.scenes}")
        # smallest bucket that fits: small requests dispatch small programs
        s = next(b for b in self.buckets if b >= n)
        for i in range(n):
            self.check_scene_input(
                patches is not None and patches[i] is not None
            )
        xy = np.zeros((s, p, SEQ_LEN, 2), np.float32)
        mask = np.zeros((s, p), bool)
        pat = (self._zero_patches[:s].copy() if patches is not None
               else self._zero_patches[:s])
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
        out = np.asarray(self._calls[s](xy, mask, pat, np.int32(seed)))
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
    first — and issues ONE device call. Draining is BUCKET-AWARE: whenever
    the queue is empty and the batch collected so far exactly fills one of
    the model's compiled scene-count buckets, the batch dispatches
    immediately instead of waiting out ``max_wait_ms`` toward the largest
    batch — under low or bursty load a lone request gets the small-bucket
    program's latency (the regime buckets exist for), while a backed-up
    queue still grows batches to the next bucket without any extra wait
    (``queue.get`` on a non-empty queue returns instantly). A single-bucket
    model behaves exactly as before. ``early_dispatches`` counts
    bucket-boundary dispatches for observability. The device takes a single scalar
    seed per batch; it is derived by folding EVERY request's seed in queue
    order, and scene noise is drawn per batch slot. Guarantees (and their
    limits): requests CO-BATCHED with distinct seeds (or in distinct batch
    slots) get distinct samples, but two same-seed requests of identical
    composition landing in SEPARATE batches return identical samples —
    sampling clients should pass a distinct seed per request. Replaying a
    request stream reproduces the same predictions only when the batch
    boundaries replay identically (timing-dependent under concurrency;
    exact for sequential ``predict`` calls). Shut down with ``close()``
    (also a context manager).
    """

    def __init__(self, model: ServingModel, max_wait_ms: float = 5.0):
        self.model = model
        self.max_wait = max_wait_ms / 1000.0
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self.batches_run = 0
        self.requests_served = 0
        self.early_dispatches = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, obs, patches=None, seed: int = 0) -> Future:
        if self._closed:
            raise RuntimeError("MicroBatcher is closed")
        # Enforce the scene contract BEFORE queueing so one patch-less
        # request can't poison the whole micro-batch it would land in.
        self.model.check_scene_input(patches is not None)
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
        buckets = self.model.buckets
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.model.scenes:
            # bucket-aware early dispatch (VERDICT r4 #4): with nothing
            # queued and the batch exactly filling a compiled bucket,
            # waiting longer can only add latency — the next request would
            # force the next-larger program anyway
            if len(batch) in buckets and self._q.empty():
                self.early_dispatches += 1
                break
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
