"""A/B the evaluate-CLI strategy sweep: per-strategy prediction passes vs
``Predictor.predict_multi``'s shared-decode sweep.

The reference evaluates each (model, strategy) job as an independent full
forward sweep (scripts/evaluate.py:114-118). The TPU build's default sweep
(--pred_strat all = smart_expected + expected + sampling) shares the
decode-all pass between the two rng-identical expected-family strategies,
cutting device passes per batch from 3 to 2 with bitwise-equal outputs
(tests/test_eval.py::test_predict_multi_matches_strategy_methods).

Run: python benchmarks/multi_strategy_eval.py   (real TPU chip, ~3 min incl.
two program compiles through the remote-compile service).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.models import factory

S, P, K = 4096, 16, 20
STRATS = ("smart_expected", "expected", "sampling")  # the CLI's --pred_strat all


def _fence(outs):
    """Value fetch is the only reliable fence through the axon tunnel."""
    tot = 0.0
    for out in outs:
        tot += float(jnp.asarray(out[0]).sum())
    return tot


def main():
    cfg = bench._flagship_config()
    g_params, g_state, g_spec = factory.construct_model(
        cfg, jax.random.PRNGKey(0)
    )[0]
    predictor = Predictor(cfg, g_spec, g_params, g_state)
    batch = bench._make_batch(S, P)
    rng = jax.random.PRNGKey(1)

    # compile both programs once (decode_all via expected; decode_select via
    # sampling) before timing either path
    _fence(predictor.predict_multi(batch, rng, STRATS, num=K).values())

    def timed(fn, reps=3):
        best = float("inf")
        for i in range(reps):
            t0 = time.perf_counter()
            _fence(fn(jax.random.fold_in(rng, i)))
            best = min(best, time.perf_counter() - t0)
        return best

    t_single = timed(lambda r: [
        predictor.get_predict_func(s)(batch, r, num=K) for s in STRATS
    ])
    t_multi = timed(
        lambda r: list(predictor.predict_multi(batch, r, STRATS, num=K).values())
    )

    res = {
        "scenes": S, "peds": P, "k": K, "strategies": list(STRATS),
        "per_strategy_ms": round(t_single * 1000, 1),
        "predict_multi_ms": round(t_multi * 1000, 1),
        "speedup": round(t_single / t_multi, 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
