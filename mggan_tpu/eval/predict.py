"""The seven inference strategies (reference train.py:259-576).

Everything runs on device: decode-all, the deterministic slot-allocation of
``expected``/``uniform_expected``/``smart_expected`` (vectorised jnp twins
of the reference's per-agent loops — the numpy implementations at the bottom
of this module are the fuzz-tested oracles), and the
(occurrence, generator) sample gather.

Strategy map (train.py:553-576):
    sampling          -> PM-categorical sampling
    expected          -> proportional allocation + ranked filler
    uniform_expected  -> round-robin over gens with prob > 0
    smart_expected    -> round-robin over gens with prob > 1/G
    smart_sampling    -> uniform categorical over gens with prob > 1/G^2
    uniform_sampling  -> uniform categorical over all gens
    rejection         -> single-gen Jacobian-norm rejection (arXiv:2006.04596)
"""

from __future__ import annotations

import functools
from math import ceil

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.config import Config
from mggan_tpu.models import generator as G_mod
from mggan_tpu.ops import sampling
from mggan_tpu.training.steps import batch_views

STRATEGIES = (
    "uniform_expected",
    "sampling",
    "expected",
    "rejection",
    "smart_expected",
    "smart_sampling",
    "uniform_sampling",
)


def gather_by_occurrence(decoded, gen_idxs):
    """out[j] = decoded[occurrence_j, gen_j] per agent.

    decoded: (K, G, S, P, T, 2) with K >= max occurrence count;
    gen_idxs: (S, P, num) -> out (num, S, P, T, 2).

    This reproduces the reference's ``sample_idxs + offsets * num_gens``
    flat-gather (train.py:339-349) with static shapes.
    """
    k, g, s, p, t, _ = decoded.shape
    occ = sampling.selection_indices(gen_idxs)
    flat_idx = occ * g + gen_idxs  # (S,P,num) into sample-major (K*G)
    dec = jnp.moveaxis(decoded.reshape(k * g, s, p, t, 2), 0, 2)  # (S,P,KG,T,2)
    out = jnp.take_along_axis(
        dec, flat_idx[..., None, None], axis=2
    )  # (S,P,num,T,2)
    return jnp.moveaxis(out, 2, 0)


class Predictor:
    """Jitted inference front-end over a trained generator."""

    def __init__(self, config: Config, g_spec, g_params, g_state,
                 compute_dtype=None):
        self.config = config
        self.g_spec = g_spec
        self.g_params = g_params
        self.g_state = g_state
        self.compute_dtype = compute_dtype

        compute_dtype = self.compute_dtype

        @functools.partial(jax.jit, static_argnames=("num",))
        def _decode_all(g_params, g_state, batch, rng, num):
            bv = batch_views(batch)
            enc_h, social_feats, _ = G_mod.encode(
                g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
                bv.patches, train=False, compute_dtype=compute_dtype,
            )
            logits = G_mod.pm_logits(g_params, g_spec, enc_h)
            s, p = bv.ped_mask.shape
            noise = sampling.global_noise(rng, num, s, p, config.noise_dim)
            out = G_mod.decode_all(
                g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
                enc_h, social_feats, noise, compute_dtype,
            )
            return out.abs, out.rel, logits, noise

        self._decode_all = _decode_all

        @functools.partial(jax.jit, static_argnames=("num",))
        def _decode_with_noise(g_params, g_state, batch, noise, num):
            bv = batch_views(batch)
            enc_h, social_feats, _ = G_mod.encode(
                g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
                bv.patches, train=False, compute_dtype=compute_dtype,
            )
            out = G_mod.decode_all(
                g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
                enc_h, social_feats, noise, compute_dtype,
            )
            return out.abs

        self._decode_with_noise = _decode_with_noise

        @functools.partial(jax.jit, static_argnames=("num",))
        def _decode_sampled(g_params, g_state, batch, rng, num):
            """PM-categorical sampling with the fused-selection decode
            (never materialises the all-generator output; falls back to
            decode_all + gather off-TPU)."""
            k1, k2 = jax.random.split(rng)
            bv = batch_views(batch)
            enc_h, social_feats, _ = G_mod.encode(
                g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy, bv.ped_mask,
                bv.patches, train=False, compute_dtype=compute_dtype,
            )
            logits = G_mod.pm_logits(g_params, g_spec, enc_h)
            gen_idxs = sampling.categorical(k2, logits, num)
            s, p = bv.ped_mask.shape
            noise = sampling.global_noise(k1, num, s, p, config.noise_dim)
            out = G_mod.decode_select(
                g_params, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
                enc_h, social_feats, noise, gen_idxs, compute_dtype,
            )
            return out.abs, out.rel, jax.nn.softmax(logits, -1), gen_idxs

        self._decode_sampled = _decode_sampled
        self._mesh = None

    def shard_to(self, mesh):
        """Enable data-parallel sampling: batches are scene-sharded over the
        mesh's ``data`` axis, params replicated; GSPMD partitions the decode
        (the TPU eval analog of SURVEY.md §5 'pmapped batched sampling')."""
        from mggan_tpu.parallel.mesh import replicated

        self._mesh = mesh
        rep = replicated(mesh)
        self.g_params = jax.device_put(self.g_params, rep)
        self.g_state = jax.device_put(self.g_state, rep)
        return self

    def _maybe_shard(self, batch):
        if self._mesh is None:
            return batch
        from mggan_tpu.parallel.dp import shard_batch

        return shard_batch(self._mesh, batch)

    # ------------------------------------------------------------- helpers
    def _run(self, batch, rng, num):
        batch = self._maybe_shard(batch)
        abs_all, rel_all, logits, noise = self._decode_all(
            self.g_params, self.g_state, batch, rng, num
        )
        probs = jax.nn.softmax(logits, axis=-1)
        return abs_all, rel_all, logits, probs, noise

    @staticmethod
    def _gather(abs_all, rel_all, gen_idxs):
        return (
            gather_by_occurrence(abs_all, gen_idxs),
            gather_by_occurrence(rel_all, gen_idxs),
        )

    # ---------------------------------------------------------- strategies
    def predict(self, batch, rng, num=20):
        """PM-net categorical sampling (train.py:259-289), fused-selection
        decode on TPU."""
        batch = self._maybe_shard(batch)
        return self._decode_sampled(
            self.g_params, self.g_state, batch, rng, num
        )

    def _select_expected(self, run, num):
        abs_all, rel_all, _, probs, _ = run
        s, p, g = probs.shape
        gen_idxs = expected_selection_jax(
            probs.reshape(-1, g), num
        ).reshape(s, p, num)
        out_abs, out_rel = self._gather(abs_all, rel_all, gen_idxs)
        return out_abs, out_rel, probs, gen_idxs

    def _select_uniform(self, run, num, eps):
        abs_all, rel_all, _, probs, _ = run
        s, p, g = probs.shape
        gen_idxs = uniform_selection_jax(
            probs.reshape(-1, g), num, eps
        ).reshape(s, p, num)
        out_abs, out_rel = self._gather(abs_all, rel_all, gen_idxs)
        return out_abs, out_rel, probs, gen_idxs

    def _select_smart_sampling(self, run, k2, num, eps):
        abs_all, rel_all, _, probs, _ = run
        over = probs > eps
        none_over = ~over.any(-1, keepdims=True)
        over = jnp.where(none_over, True, over)
        logits_u = jnp.where(over, 0.0, -1e9)
        gen_idxs = sampling.categorical(k2, logits_u, num)
        out_abs, out_rel = self._gather(abs_all, rel_all, gen_idxs)
        return out_abs, out_rel, probs, gen_idxs

    def predict_expected(self, batch, rng, num=20):
        """Deterministic proportional allocation (train.py:291-351).

        Selection runs on device (expected_selection_jax; fuzz-verified
        against the numpy reference implementation below).
        """
        return self._select_expected(self._run(batch, rng, num), num)

    def predict_uniform(self, batch, rng, num=20, eps=0.0):
        """Threshold + descending-prob round robin (train.py:353-412).
        Selection on device (uniform_selection_jax)."""
        return self._select_uniform(self._run(batch, rng, num), num, eps)

    def predict_smart_sampling(self, batch, rng, num=20, eps=0.0):
        """Uniform categorical over gens above threshold (train.py:414-465)."""
        k1, k2 = jax.random.split(rng)
        return self._select_smart_sampling(
            self._run(batch, k1, num), k2, num, eps
        )

    def predict_multi(self, batch, rng, strategies, num=20):
        """Run several strategies over one batch, sharing decode passes.

        The decode-all output depends only on (batch, rng, num), so
        strategies whose selection consumes the same rng stream share one
        device pass: expected/uniform_expected/smart_expected share
        ``_run(batch, rng)``; smart_sampling/uniform_sampling share
        ``_run(batch, k1)``. Outputs are bitwise equal to calling each
        strategy method separately with the same (batch, rng, num). The
        reference instead re-runs the full forward per strategy sweep
        (scripts/evaluate.py:114-118, train.py:553-576); on the evaluate
        CLI this cuts device passes per batch from len(strategies) to the
        number of rng families present.

        Returns {strategy: (out_abs, out_rel, probs, gen_idxs)}.
        """
        for s in strategies:
            assert s in STRATEGIES, s
        n = self.config.num_gens
        out = {}
        exp_fam = [s for s in strategies
                   if s in ("expected", "uniform_expected", "smart_expected")]
        if exp_fam:
            run = self._run(batch, rng, num)
            for s in exp_fam:
                if s == "expected":
                    out[s] = self._select_expected(run, num)
                else:
                    eps = 0.0 if s == "uniform_expected" else 1.0 / n
                    out[s] = self._select_uniform(run, num, eps)
        samp_fam = [s for s in strategies
                    if s in ("smart_sampling", "uniform_sampling")]
        if samp_fam:
            k1, k2 = jax.random.split(rng)
            run = self._run(batch, k1, num)
            for s in samp_fam:
                eps = 0.0 if s == "uniform_sampling" else 1.0 / n**2
                out[s] = self._select_smart_sampling(run, k2, num, eps)
        if "sampling" in strategies:
            out["sampling"] = self.predict(batch, rng, num)
        if "rejection" in strategies:
            out["rejection"] = self.predict_rejection(batch, rng, num)
        return out

    def predict_rejection(self, batch, rng, num=20, sigma=1e-3, n_estimate=10,
                          truncation_ratio=0.7):
        """Jacobian-Frobenius-norm rejection for single-generator models
        ("no GAN's land", train.py:467-551)."""
        assert self.config.num_gens == 1, "Only implemented for single generator"
        assert 0.0 < truncation_ratio <= 1.0
        batch = self._maybe_shard(batch)
        total = num + ceil((1 - truncation_ratio) * num)

        k0, k1 = jax.random.split(rng)
        abs_all, rel_all, logits, noise = self._decode_all(
            self.g_params, self.g_state, batch, k0, total
        )
        probs = jax.nn.softmax(logits, axis=-1)
        base = abs_all[:, 0]  # (total,S,P,T,2)

        # All N perturbation rollouts in ONE decode batch (the reference
        # loops N sequential forwards, train.py:515-533).
        eps = jax.random.normal(k1, (n_estimate,) + noise.shape) * sigma**2
        pert_noise = (noise[None] + eps).reshape((-1,) + noise.shape[1:])
        pert = self._decode_with_noise(
            self.g_params, self.g_state, batch, pert_noise, n_estimate * total
        )[:, 0]
        pert = pert.reshape((n_estimate, total) + pert.shape[1:])
        sq = ((pert - base[None]) ** 2).sum((-1, -2)) / sigma**2  # (N,total,S,P)
        jac = jnp.moveaxis(sq.mean(0), 0, -1)  # (S,P,total)

        order = jnp.argsort(jac, axis=-1)[..., :num]  # (S,P,num)
        pick = lambda x: jnp.moveaxis(
            jnp.take_along_axis(
                jnp.moveaxis(x[:, 0], 0, 2), order[..., None, None], axis=2
            ),
            2,
            0,
        )
        gen_idxs = jnp.zeros(order.shape, jnp.int32)
        return pick(abs_all), pick(rel_all), probs, gen_idxs

    def get_predict_func(self, strategy: str):
        """Dispatch incl. eps defaults (train.py:553-576)."""
        assert strategy in STRATEGIES, strategy
        n = self.config.num_gens
        if strategy == "expected":
            return self.predict_expected
        if strategy == "rejection":
            return self.predict_rejection
        if strategy == "uniform_expected":
            return self.predict_uniform
        if strategy == "smart_expected":
            return functools.partial(self.predict_uniform, eps=1.0 / n)
        if strategy == "smart_sampling":
            return functools.partial(self.predict_smart_sampling, eps=1.0 / n**2)
        if strategy == "uniform_sampling":
            return functools.partial(self.predict_smart_sampling, eps=0.0)
        return self.predict


# --------------------------------------------------------------- on-device
def _round_robin_emit_jax(counts, order, num: int):
    """jnp twin of ``_round_robin_emit`` (static shapes; rounds = num)."""
    b, g = counts.shape
    c_sorted = jnp.take_along_axis(counts, order, axis=1)
    r = jnp.arange(num)[None, :, None]
    valid = (c_sorted[:, None, :] > r).reshape(b, -1)  # (B, num*G)
    flat_gen = jnp.broadcast_to(order[:, None, :], (b, num, g)).reshape(b, -1)
    pos = jnp.cumsum(valid, axis=1)  # 1-based emission slot per valid entry
    # out[b, j] = flat_gen at the unique position where pos == j+1 (valid)
    slot = jnp.arange(1, num + 1)
    hits = valid[:, None, :] & (pos[:, None, :] == slot[None, :, None])
    return (hits * flat_gen[:, None, :]).sum(-1).astype(jnp.int32)


def expected_selection_jax(probs, num: int):
    """On-device twin of :func:`expected_selection` (train.py:309-337)."""
    b, g = probs.shape
    expected = jnp.round(probs * num).astype(jnp.int32)
    order = jnp.argsort(-expected, axis=-1, stable=True)
    missing = num - expected.sum(1)
    m_abs = jnp.abs(missing)
    base, rem = m_abs // g, m_abs % g
    per_rank = base[:, None] + (jnp.arange(g)[None, :] < rem[:, None])
    filler = jnp.zeros_like(expected).at[jnp.arange(b)[:, None], order].set(per_rank)
    expected = expected + jnp.sign(missing)[:, None] * filler
    return _round_robin_emit_jax(expected, order, num)


def uniform_selection_jax(probs, num: int, eps: float):
    """On-device twin of :func:`uniform_selection` (train.py:382-405)."""
    b, g = probs.shape
    over = probs > eps
    over = jnp.where(~over.any(1, keepdims=True), True, over)
    counts = jnp.where(over, num, 0).astype(jnp.int32)
    masked = jnp.where(over, probs, -jnp.inf)
    order = jnp.argsort(-masked, axis=1, stable=True)
    return _round_robin_emit_jax(counts, order, num)


# ---------------------------------------------------------------- host-side
def _round_robin_emit(counts: np.ndarray, order: np.ndarray, num: int):
    """Vectorised round-robin emission: repeatedly walk ``order`` emitting
    gens with remaining count, until ``num`` slots are filled per row.

    counts: (B, G) slots per gen; order: (B, G) emission priority.
    """
    b, g = counts.shape
    c_sorted = np.take_along_axis(counts, order, axis=1)  # (B, G)
    # each round emits >=1 slot (or none ever again), so `num` rounds suffice
    rounds = int(min(counts.sum(1).max(), num)) if b else 0
    rounds = max(rounds, 1)
    r = np.arange(rounds)[None, :, None]  # (1, R, 1)
    valid = c_sorted[:, None, :] > r  # (B, R, G): emit order[k] in round r
    flat_valid = valid.reshape(b, -1)  # r-major, priority-minor
    flat_gen = np.broadcast_to(order[:, None, :], valid.shape).reshape(b, -1)
    # stable-select the first `num` valid entries per row
    pos = np.cumsum(flat_valid, axis=1)
    take = flat_valid & (pos <= num)
    out = np.zeros((b, num), np.int32)
    rows, cols = np.nonzero(take)
    out[rows, pos[rows, cols] - 1] = flat_gen[rows, cols]
    return out


def expected_selection(probs: np.ndarray, num: int) -> np.ndarray:
    """Reference ``predict_expected`` allocation (train.py:309-337).

    probs: (B, G) -> int32 (B, num) emission order.
    round(p*num) slots per gen, the rounding residue distributed over gens in
    descending-allocation order, then emitted round-robin in that order.
    Fully vectorised (no per-agent Python loops).
    """
    b, g = probs.shape
    expected = np.round(probs * num).astype(np.int64)
    sort_idxs = np.argsort(-expected, axis=-1, kind="stable")
    missing = (num - expected.sum(1)).astype(np.int64)  # (B,)
    # residue of |m| slots distributed over the first |m| entries of the
    # tiled priority order == floor/ceil split over ranks (train.py:313-324)
    m_abs = np.abs(missing)
    base, rem = m_abs // g, m_abs % g
    per_rank = base[:, None] + (np.arange(g)[None, :] < rem[:, None])
    filler = np.zeros_like(expected)
    np.put_along_axis(filler, sort_idxs, per_rank, axis=1)
    expected = expected + np.sign(missing)[:, None] * filler
    assert (expected.sum(1) == num).all()
    return _round_robin_emit(expected, sort_idxs, num)


def uniform_selection(probs: np.ndarray, num: int, eps: float) -> np.ndarray:
    """Reference ``predict_uniform`` selection (train.py:382-405).

    Gens with prob > eps (all if none), sorted by descending prob, emitted
    round-robin. Vectorised.
    """
    b, g = probs.shape
    over = probs > eps
    none = ~over.any(1)
    over[none] = True
    counts = np.where(over, num, 0).astype(np.int64)  # enough for round robin
    masked = np.where(over, probs, -np.inf)
    order = np.argsort(-masked, axis=1, kind="stable")
    return _round_robin_emit(counts, order, num)
