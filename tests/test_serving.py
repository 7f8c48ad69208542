"""Serving runtime (mggan_tpu/serving/): padding-edge correctness, artifact
self-description, micro-batching, the HTTP server, and the offline CLI.

The reference has no serving path; the contract under test is
cli/export.py's fixed-shape serving function wrapped by ServingModel."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mggan_tpu.cli.export import build_serving_fn, export_predictor, save_artifact
from mggan_tpu.config import Config
from mggan_tpu.eval.predict import Predictor
from mggan_tpu.models import factory
from mggan_tpu.serving.runtime import MicroBatcher, ServingModel
from mggan_tpu.serving.server import start_background

S, P, K = 4, 3, 5


@pytest.fixture(scope="module")
def predictor():
    cfg = Config(
        dataset="synthetic_memory", num_gens=2, h_dim=16, decoder_h_dim=16,
        noise_dim=8, batch_size=S, weighting_target="ml",
    )
    (g_params, g_state, g_spec), _ = factory.construct_model(
        cfg, jax.random.PRNGKey(0)
    )
    return Predictor(cfg, g_spec, g_params, g_state)


@pytest.fixture(scope="module")
def model(predictor):
    return ServingModel.from_predictor(predictor, "sampling", S, P, K)


def make_obs(peds, seed=0, steps=8):
    rng = np.random.RandomState(seed)
    return rng.randn(peds, steps, 2).astype(np.float32).cumsum(1) * 0.1


def test_padding_edge_matches_direct_call(predictor, model):
    """predict_batch pads (scenes, peds) and strips back; the padded rows
    must not change the real rows' outputs (mask correctness end-to-end)."""
    obs = [make_obs(2, seed=1), make_obs(3, seed=2)]
    outs = model.predict_batch(obs, seed=7)
    assert [o.shape for o in outs] == [(K, 2, 12, 2), (K, 3, 12, 2)]

    # direct fixed-shape call with the same padding layout
    serve = build_serving_fn(predictor, "sampling")
    xy = np.zeros((S, P, 20, 2), np.float32)
    mask = np.zeros((S, P), bool)
    for i, o in enumerate(obs):
        xy[i, : o.shape[0], :8] = o
        xy[i, : o.shape[0], 8:] = o[:, -1:, :]
        mask[i, : o.shape[0]] = True
    ref = np.asarray(serve(
        jnp.asarray(xy), jnp.asarray(mask),
        jnp.zeros((S, P, 33, 33, 4), jnp.float32), jnp.int32(7), num=K,
    ))
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, ref[:, i, : o.shape[1]], atol=1e-6)
    assert np.isfinite(np.concatenate([o.ravel() for o in outs])).all()


def test_artifact_is_self_describing(predictor, tmp_path):
    exported = export_predictor(predictor, "sampling", S, P, K)
    path = tmp_path / "m.jaxexport"
    save_artifact(exported, path)
    m = ServingModel.from_artifact(path)
    assert (m.scenes, m.peds, m.num) == (S, P, K)
    out = m.predict(make_obs(2), seed=3)
    assert out.shape == (K, 2, 12, 2)
    assert np.isfinite(out).all()


def test_input_validation(model):
    with pytest.raises(ValueError):
        model.predict(make_obs(P + 1))  # too many peds
    with pytest.raises(ValueError):
        model.predict(np.zeros((2, 4, 2), np.float32))  # too few steps
    with pytest.raises(ValueError):
        model.predict_batch([make_obs(1)] * (S + 1))  # too many scenes


def test_microbatcher_groups_and_matches(model):
    """Concurrent submits coalesce into fewer device calls, and each caller
    gets the slice matching a direct predict_batch of the same batch."""
    with MicroBatcher(model, max_wait_ms=200.0) as mb:
        obs = [make_obs(1 + i % P, seed=i) for i in range(S)]
        futures = [mb.submit(o, seed=11) for o in obs]
        outs = [f.result(timeout=120) for f in futures]
        assert mb.batches_run < len(obs)  # actually batched
        assert mb.requests_served == len(obs)
    for o, r in zip(obs, outs):
        assert r.shape == (K, o.shape[0], 12, 2)
    # reproduce the worker's call exactly: same composition + the seed fold
    # over every request's seed in queue order (serving/runtime.py::_run)
    seed = 0
    for _ in obs:
        seed = (seed * 1_000_003 + 11 + 1) % 2**31
    direct = model.predict_batch(obs, seed=seed)
    for got, want in zip(outs, direct):
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_microbatcher_error_propagates(model):
    with MicroBatcher(model, max_wait_ms=1.0) as mb:
        f = mb.submit(np.zeros((P + 2, 8, 2), np.float32))
        with pytest.raises(ValueError):
            f.result(timeout=60)
        # the batcher survives a poison request
        ok = mb.predict(make_obs(1), timeout=60)
        assert ok.shape == (K, 1, 12, 2)


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_server_end_to_end(model):
    server, batcher, port = start_background(model, max_wait_ms=50.0)
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"

        out = _post(port, {"scenes": [make_obs(2).tolist()], "seed": 5})
        arr = np.asarray(out["predictions"][0])
        assert arr.shape == (K, 2, 12, 2)
        assert np.isfinite(arr).all()

        # concurrent clients
        results = {}

        def hit(i):
            results[i] = _post(port, {"scenes": [make_obs(1, seed=i).tolist()]})

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        assert all(
            np.asarray(results[i]["predictions"][0]).shape == (K, 1, 12, 2)
            for i in range(3)
        )

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/metadata", timeout=30
        ) as r:
            meta = json.loads(r.read())
        assert meta["scenes"] == S and meta["num"] == K
        assert meta["requests_served"] >= 4

        # malformed request -> 400 with an error body, server stays up
        try:
            _post(port, {"scenes": "nope"})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())
    finally:
        server.shutdown()
        batcher.close()


def test_offline_cli_txt_to_npz(predictor, tmp_path):
    """mggan-serve --input obs.txt --output preds.npz over an artifact."""
    from mggan_tpu.cli.serve import main as serve_main

    exported = export_predictor(predictor, "sampling", S, P, K)
    art = tmp_path / "m.jaxexport"
    save_artifact(exported, art)

    # two peds fully present for 10 frames -> 3 sliding 8-frame windows
    # (serving uses the inclusive floor((F-seq)/skip)+1 count so the
    # window ending at the newest frame is produced; the reference's
    # ceil formula is training-window parity only)
    rows = []
    for f in range(10):
        for pid in (1, 2):
            rows.append(f"{f} {pid} {0.1 * f + pid:.3f} {0.05 * f:.3f}")
    txt = tmp_path / "obs.txt"
    txt.write_text("\n".join(rows) + "\n")

    out = tmp_path / "preds.npz"
    serve_main([
        "--artifact", str(art), "--input", str(txt), "--output", str(out),
    ])
    z = np.load(out)
    windows = [k for k in z.files if k.startswith("window_")]
    assert len(windows) == 3
    for k in windows:
        assert z[k].shape == (K, 2, 12, 2)
        assert np.isfinite(z[k]).all()
    np.testing.assert_array_equal(z["ped_ids_00000"], [1, 2])


def test_microbatcher_seed_reproducible(model):
    """The batch seed is a pure fold of the request seeds: replaying the
    same request gives the same samples; a different seed gives different
    ones (regression: the old fold included the batch counter, so no
    request was ever reproducible)."""
    obs = make_obs(2, seed=5)
    with MicroBatcher(model, max_wait_ms=1.0) as mb:
        a = mb.predict(obs, seed=7)
        b = mb.predict(obs, seed=7)
        c = mb.predict(obs, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
