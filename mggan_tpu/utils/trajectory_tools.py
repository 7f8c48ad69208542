"""Trajectory analysis utilities (reference utils.py:86-94, 168-199,
276-375): 4D state augmentation, gradient-norm logging, pseudo-multi-modal
GT mining, SGHMC noise helpers."""

from __future__ import annotations

from collections import defaultdict

import jax
import numpy as np

from mggan_tpu.utils.pytree import tree_global_norm


def get_traj_4d(obsv_p: np.ndarray, pred_p=None):
    """Positions -> positions + velocities (utils.py:86-94).

    obsv_p: (B, T, 2). Velocity of step 0 repeats step 1's.
    """
    obsv_v = np.diff(obsv_p, axis=1)
    obsv_v = np.concatenate([obsv_v[:, :1], obsv_v], axis=1)
    if pred_p is None:
        return obsv_p, obsv_v
    prev = np.concatenate([obsv_p[:, -1:], pred_p[:, :-1]], axis=1)
    pred_v = pred_p - prev
    return obsv_p, obsv_v, pred_p, pred_v


class GradNormLogger:
    """Per-module gradient-norm accumulation (utils.py:168-199), adapted to
    pytrees: top-level keys of the grad tree play the role of module names.
    """

    def __init__(self):
        self.grad_norms = defaultdict(list)

    def update(self, grads):
        total_sq = 0.0
        for name, sub in grads.items():
            norm = float(tree_global_norm(sub))
            self.grad_norms[name].append(round(norm, 3))
            total_sq += norm**2
        self.grad_norms["grad_norm_total"].append(round(np.sqrt(total_sq), 3))

    def update_scalars(self, module: str, values):
        """Append already-computed per-step norms for one module (the jitted
        train step emits them as ``gradnorm/<prefix>/<module>`` metrics; NaN
        sentinels from skipped D-steps are dropped, matching the reference's
        no-append on skipped iterations)."""
        vals = [float(v) for v in values]
        self.grad_norms[module].extend(v for v in vals if not np.isnan(v))

    def reset(self):
        self.grad_norms = defaultdict(list)

    def write(self, writer, global_step):
        """Emit per-module gradient histograms to the experiment writer's
        TensorBoard backend (utils.py:195-199)."""
        tb = getattr(writer, "_tb", None)
        if tb is not None:
            for module, vals in self.grad_norms.items():
                tb.add_histogram(
                    f"gradient_histograms/{module}", np.array(vals), global_step
                )
        self.reset()


def sghmc_noise_like(params):
    """Zero buffers matching the parameter tree (utils.py:28-31)."""
    return jax.tree.map(lambda p: np.zeros_like(p), params)


def noise_loss(params, key, alpha: float):
    """SGHMC noise loss: sum_p <p, n>, n ~ N(0, alpha) (utils.py:10-15)."""
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    total = 0.0
    for p, k in zip(leaves, keys):
        n = jax.random.normal(k, p.shape, p.dtype) * alpha
        total = total + jnp.sum(p * n)
    return total


def pandas_to_latex(df_table, index=True, multicolumn=False, **kwargs) -> str:
    """DataFrame -> LaTeX with cmidrule separators under multi-column
    headers (utils.py:251-273)."""
    latex = df_table.to_latex(multicolumn=multicolumn, index=index, **kwargs)
    if multicolumn:
        lines = latex.splitlines()
        insert_at = 3
        for j, _ in enumerate(df_table.columns.levels[:-1]):
            codes = np.array(df_table.columns.codes[j])
            breaks = np.nonzero(codes[:-1] != codes[1:])[0].tolist()
            rule = ""
            for start, end in zip([-1] + breaks, breaks + [len(codes) - 1]):
                if end - start > 1:
                    rule += f"\\cmidrule(l){{{start + 2}-{end + 1}}} "
            lines.insert(insert_at, rule)
            insert_at += j + 2
        latex = "\n".join(lines)
    return latex


def get_similar_trajectories(
    ds,
    distance_threshold: float,
    direction_threshold: float,
    speed_threshold: float,
    radius: float = 2.0,
    filter_hist_colliding: bool = False,
):
    """Mine pseudo-multi-modal ground truth (utils.py:276-375): for each
    trajectory, find same-scene trajectories whose last observed position,
    heading, and speed are similar; shift their futures to the query's frame;
    optionally drop futures that would collide with scene peers.

    Returns {traj_idx: (m, pred_len, 2) candidate futures}.
    """
    obs = ds.obs_traj  # (N, 8, 2)
    gt = ds.pred_traj  # (N, 12, 2)
    obs_rel = np.diff(obs, axis=1)
    framerate = 1.0 / 0.4
    ped_ids = (
        np.concatenate(ds.ped_ids)
        if ds.ped_ids is not None
        else np.arange(len(obs))
    )
    mask = np.isnan(gt).any(-1).any(-1)

    scene_to_idxs = defaultdict(list)
    idx_to_others = {}
    for i, (start, end) in enumerate(ds.seq_start_end):
        scene_to_idxs[ds.scene_names[i]].extend(range(start, end))
        for j in range(start, end):
            idx_to_others[j] = [k for k in range(start, end) if k != j]

    last_v = obs_rel[:, -1]
    speed_len = np.linalg.norm(last_v, axis=1, keepdims=True)
    direction = last_v / (speed_len + 1e-7)

    out = {}
    for i, (start, end) in enumerate(ds.seq_start_end):
        for idx in range(start, end):
            if idx in out or mask[idx]:
                continue
            cand = np.array(scene_to_idxs[ds.scene_names[i]])
            cand = cand[~mask[cand]]
            d = np.linalg.norm(obs[idx, -1][None] - obs[cand, -1], axis=-1)
            cand = cand[d < distance_threshold]
            if not np.isclose(speed_len[idx], 0.0):
                cos = direction[cand] @ direction[idx]
                cand = cand[cos > direction_threshold]
            dv = np.abs(speed_len[idx] - speed_len[cand, 0]) * framerate
            cand = cand[dv < speed_threshold]

            cand_ped_ids = ped_ids[cand]
            for sim in cand:
                # one (closest) trajectory per distinct ped id
                keep = [sim]
                others = cand[cand_ped_ids != ped_ids[sim]]
                other_ids = cand_ped_ids[cand_ped_ids != ped_ids[sim]]
                for pid in np.unique(other_ids):
                    group = others[other_ids == pid]
                    dd = np.linalg.norm(
                        obs[sim, -1][None] - obs[group, -1], axis=-1
                    )
                    keep.append(group[np.argmin(dd)])
                keep = np.array(keep)
                offset = obs[keep, -1] - obs[sim, -1]
                futures = gt[keep] - offset[:, None]
                if filter_hist_colliding and idx_to_others[sim]:
                    collide = np.zeros(len(futures), bool)
                    for other in idx_to_others[sim]:
                        d2 = np.linalg.norm(
                            futures - gt[other][None], axis=-1
                        )
                        collide |= (d2 < radius).any(1)
                    futures = futures[~collide]
                out[sim] = futures
    return out
