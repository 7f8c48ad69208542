"""Serving export (cli/export.py): serialize -> deserialize -> call
roundtrip matches the live Predictor exactly, and the CLI exports a
trained version dir end-to-end."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mggan_tpu.cli.export import (
    build_serving_fn,
    export_predictor,
    load_artifact,
    save_artifact,
)
from mggan_tpu.config import Config
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.models import factory

S, P, K = 4, 3, 5


def tiny_predictor():
    cfg = Config(
        dataset="synthetic_memory", num_gens=2, h_dim=16, decoder_h_dim=16,
        noise_dim=8, batch_size=S, weighting_target="ml",
    )
    (g_params, g_state, g_spec), _ = factory.construct_model(
        cfg, jax.random.PRNGKey(0)
    )
    return Predictor(cfg, g_spec, g_params, g_state)


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    xy = jnp.asarray(rng.randn(S, P, 20, 2).astype(np.float32).cumsum(2) * 0.1)
    mask = jnp.ones((S, P), bool)
    patches = jnp.asarray(
        rng.uniform(-1, 1, (S, P, 33, 33, 4)).astype(np.float32)
    )
    return xy, mask, patches


@pytest.mark.parametrize("strategy", ["sampling", "expected"])
def test_export_roundtrip_matches_live(tmp_path, strategy):
    predictor = tiny_predictor()
    xy, mask, patches = make_inputs()

    exported = export_predictor(predictor, strategy, S, P, K)
    path = tmp_path / "model.jaxexport"
    save_artifact(exported, path)
    assert path.stat().st_size > 0

    pred_art = load_artifact(path)[0].call(xy, mask, patches, jnp.int32(7))

    serve = build_serving_fn(predictor, strategy)
    pred_live = serve(xy, mask, patches, jnp.int32(7), num=K)
    assert pred_art.shape == (K, S, P, 12, 2)
    np.testing.assert_allclose(
        np.asarray(pred_art), np.asarray(pred_live), atol=1e-6
    )


def test_export_cli_from_version_dir(tmp_path):
    from mggan_tpu.cli.export import main as export_main
    from mggan_tpu.cli.train import main as train_main

    log_dir = tmp_path / "logs"
    train_main([
        "--dataset", "synthetic_memory", "--epochs", "1", "--num_gens", "2",
        "--batch_size", "4", "--h_dim", "16", "--decoder_h_dim", "16",
        "--num_samples", "4", "--top_k_test", "3",
        "--log_dir", str(log_dir), "--name", "exp_export",
    ])
    version_dirs = list(log_dir.glob("**/version_*"))
    assert version_dirs
    out = tmp_path / "served.jaxexport"
    export_main([
        "--model_dir", str(version_dirs[0]), "--out", str(out),
        "--scenes", str(S), "--peds", str(P), "--num", str(K),
    ])
    xy, mask, patches = make_inputs(1)
    exported, meta = load_artifact(out)
    pred = exported.call(xy, mask, patches, jnp.int32(3))
    assert pred.shape == (K, S, P, 12, 2)
    assert np.isfinite(np.asarray(pred)).all()
    # the CLI records scene provenance in the metadata header
    assert meta["wants_scene"] is True
    assert meta["strategy"] == "sampling"
    assert meta["dataset"] == "synthetic_memory"


def test_legacy_headerless_artifact_loads(tmp_path):
    """Round-3 artifacts are raw jax.export bytes; they must keep loading
    (empty metadata -> ServingModel.wants_scene None)."""
    from pathlib import Path

    from mggan_tpu.serving.runtime import ServingModel

    predictor = tiny_predictor()
    exported = export_predictor(predictor, "sampling", S, P, K)
    path = tmp_path / "legacy.jaxexport"
    Path(path).write_bytes(exported.serialize())  # no header

    loaded, meta = load_artifact(path)
    assert meta == {}
    m = ServingModel.from_artifact(path)
    assert m.wants_scene is None
