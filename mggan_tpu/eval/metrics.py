"""ADE/FDE/Mode metrics, fully batched over padded scenes.

Reference semantics (metrics.py:6-141, evaluation.py:43-78):
* ADE/FDE at k use the JOINT scene minimum: min over the first k samples of
  the error summed over the scene's valid agents.
* Accumulation is (sum, count) pairs across scenes; ADE's count is
  ``pred_len * n_agents``, FDE's and Mode's is ``n_agents``.
* Mode = fraction of agents whose per-agent min-FDE over k samples is
  < 3 m (mode_thresh; the reference's ``"raw"``-shifted call is a spec bug,
  SURVEY.md §2.4 — we implement the intent).
* For pixel datasets (SDD/GOFP) errors are rescaled per scene by 1/ratio.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MODE_THRESH = 3.0


def displacement_errors(pred_abs, gt_xy, scale):
    """Per-agent ADE-sum and FDE per sample.

    Args:
        pred_abs: (K, S, P, T, 2); gt_xy: (S, P, T, 2) (NaNs zeroed upstream —
            invalid agents must be excluded via the mask later).
        scale: (S,) per-scene rescaling.

    Returns:
        (ades (K,S,P) summed over T, fdes (K,S,P)).
    """
    sc = scale[None, :, None, None, None]
    diff = (pred_abs - gt_xy[None]) * sc
    d = jnp.linalg.norm(diff, axis=-1)  # (K,S,P,T)
    return d.sum(-1), d[..., -1]


def batch_metric_sums(pred_abs, gt_xy, loss_mask, scale, ks, pred_len=12):
    """(sum, count) accumulators for one padded batch, all ks at once.

    Returns dict {f"{name} k={k}": (sum, count)} with jnp scalars.
    """
    ades, fdes = displacement_errors(pred_abs, gt_xy, scale)
    m = loss_mask[None].astype(ades.dtype)
    ades = ades * m
    fdes = fdes * m
    scene_ade = ades.sum(-1)  # (K, S) summed over valid agents
    scene_fde = fdes.sum(-1)
    n_agents = loss_mask.sum(-1)  # (S,)
    total_agents = n_agents.sum()

    out = {}
    for k in ks:
        min_ade = scene_ade[:k].min(0).sum()
        min_fde = scene_fde[:k].min(0).sum()
        # per-agent min-FDE over k (metrics.py:136), masked
        agent_min_fde = jnp.where(loss_mask, fdes[:k].min(0), jnp.inf)
        mode = (agent_min_fde < MODE_THRESH).sum()
        out[f"ADE k={k}"] = (min_ade, pred_len * total_agents)
        out[f"FDE k={k}"] = (min_fde, total_agents)
        out[f"Mode k={k}"] = (mode.astype(jnp.float32), total_agents)
    return out


class MetricAccumulator:
    """Host-side (sum, count) accumulation across batches
    (evaluation.py:52-78)."""

    def __init__(self):
        self.sums = {}

    def update(self, batch_sums):
        for key, (v, c) in batch_sums.items():
            v, c = float(v), float(c)
            s, n = self.sums.get(key, (0.0, 0.0))
            self.sums[key] = (s + v, n + c)

    def result(self):
        return {k: (s / n if n else float("nan")) for k, (s, n) in self.sums.items()}


def allreduce_sums(sums):
    """Sum per-process ``{key: (sum, count)}`` dicts across a
    ``jax.distributed`` pod; identity when single-process.

    Pod processes evaluate disjoint window shards (data/elastic.py), so the
    exact global metric is the element-wise sum of every host's pairs. The
    result is identical on every process — callers may branch on it without
    diverging pod control flow (e.g. collective best-checkpoint saves).
    Every process must call this (it is a collective) with the SAME key set
    (an empty-shard process must still contribute zero-count pairs for every
    key); the key sets are cross-checked and a mismatch raises rather than
    failing with an opaque shape error inside the collective.

    The host accumulators are float64; the gather ships each value as a
    (hi, lo) float32 pair (hi = f32(x), lo = f32(x - hi) — a 2-word Dekker
    split, exact for |x| < 2^97) and re-sums in float64, so multi-host
    metrics match a single host bit-for-bit instead of losing the low 29
    mantissa bits to a float32 downcast.
    """
    import jax

    if jax.process_count() == 1:
        return dict(sums)
    import zlib

    from jax.experimental import multihost_utils

    keys = sorted(sums)
    digest = zlib.crc32("\n".join(keys).encode()) & 0x7FFFFFFF
    digests = multihost_utils.process_allgather(
        np.asarray([digest, len(keys)], np.int32)
    )
    if not (digests == digests[0]).all():
        raise ValueError(
            "allreduce_sums key sets differ across pod processes "
            f"(crc32/len per process: {digests.tolist()}); every process "
            "must contribute the same metric keys (zero counts for empty "
            "shards)"
        )
    flat = np.asarray([sums[k] for k in keys], np.float64)  # (len(keys), 2)
    hi = flat.astype(np.float32)
    lo = (flat - hi.astype(np.float64)).astype(np.float32)
    gathered = multihost_utils.process_allgather(
        np.stack([hi, lo])  # (2, len(keys), 2) f32
    ).astype(np.float64)  # (num_processes, 2, len(keys), 2)
    total = gathered.sum(axis=(0, 1))  # (len(keys), 2) f64
    return {k: (float(total[i, 0]), float(total[i, 1])) for i, k in enumerate(keys)}


def pred_diversity(preds):
    """Mean 1 - cosine similarity over sample pairs (metrics.py:71-96).

    preds: (T, K, 2) relative predictions for one agent -> scalar in [0, 1].
    """
    k = preds.shape[1]
    flat = np.asarray(preds).transpose(1, 0, 2).reshape(k, -1)
    norm = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-8)
    cos = norm @ norm.T
    off_diag = (cos.sum() - np.trace(cos)) / (k * (k - 1))
    return 1.0 - off_diag
