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
from mggan_tpu.serving.runtime import (
    MicroBatcher,
    MissingSceneInputError,
    ServingModel,
    finish_patches_center,
)
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
    # Every model in this framework has a scene CNN (SCENE_DIM constant,
    # mirroring the reference's first-class 4x33x33 patch input); these
    # padding/batching tests exercise the trajectory path only, so opt into
    # patch-less (zero-patch) serving explicitly.
    with pytest.warns(UserWarning, match="without scene patches"):
        m = ServingModel.from_predictor(
            predictor, "sampling", S, P, K, allow_missing_scene=True
        )
        m.predict(make_obs(1))  # trigger the one-time degradation warning
    return m


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
        assert meta["scene_buckets"] == [S]
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


# --------------------------------------------------------------------------
# Scene-context contract (VERDICT r3 #1): a scene-conditioned model must not
# silently serve zero-patch predictions. Reference data contract:
# BaseTrajectories.py:254-288 (the 4x33x33 patch is a first-class input).
# --------------------------------------------------------------------------

def make_patches(peds, seed=0):
    rng = np.random.RandomState(100 + seed)
    return rng.rand(peds, 33, 33, 4).astype(np.float32)


def make_scene_img(h=64, w=80, seed=0):
    rng = np.random.RandomState(200 + seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def strict_model(predictor):
    return ServingModel.from_predictor(predictor, "sampling", S, P, K)


def test_missing_scene_raises(strict_model):
    """A scene-conditioned model without allow_missing_scene refuses
    patch-less requests — predict_batch AND the MicroBatcher front door."""
    assert strict_model.wants_scene is True
    with pytest.raises(MissingSceneInputError):
        strict_model.predict(make_obs(2))
    with MicroBatcher(strict_model, max_wait_ms=1.0) as mb:
        with pytest.raises(MissingSceneInputError):
            mb.submit(make_obs(2))  # rejected before queueing
        # a patch-carrying request on the same batcher still works
        out = mb.predict(make_obs(2), patches=make_patches(2), timeout=120)
    assert out.shape == (K, 2, 12, 2)


def test_predict_with_patches_matches_live(predictor, strict_model):
    """Serving with real patches must equal the live Predictor's serving fn
    on the same padded arrays — patches flow through, not zeros."""
    obs = [make_obs(2, seed=1), make_obs(3, seed=2)]
    pats = [make_patches(2, seed=1), make_patches(3, seed=2)]
    outs = strict_model.predict_batch(obs, pats, seed=9)

    # jit the reference call exactly like ServingModel.from_predictor does,
    # so exact equality is the right claim (unjitted op-by-op execution
    # fuses differently and differs in the last ulp)
    import functools

    serve = jax.jit(
        functools.partial(build_serving_fn(predictor, "sampling"), num=K)
    )
    xy = np.zeros((S, P, 20, 2), np.float32)
    mask = np.zeros((S, P), bool)
    pat = np.zeros((S, P, 33, 33, 4), np.float32)
    for i, (o, q) in enumerate(zip(obs, pats)):
        xy[i, : o.shape[0], :8] = o
        xy[i, : o.shape[0], 8:] = o[:, -1:, :]
        mask[i, : o.shape[0]] = True
        pat[i, : o.shape[0]] = q
    ref = np.asarray(serve(
        jnp.asarray(xy), jnp.asarray(mask), jnp.asarray(pat), jnp.int32(9)
    ))
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, ref[:, i, : o.shape[1]])
    # and the patches actually conditioned the output
    zero = ServingModel.from_predictor(
        predictor, "sampling", S, P, K, allow_missing_scene=True
    ).predict_batch(obs, seed=9)
    assert not np.array_equal(outs[0], zero[0])


def test_finish_patches_center_matches_identity():
    """finish_patches_center (numpy, serving) must be bit-identical to
    data/augment.py::identity_patches (jax, eval pipeline)."""
    from mggan_tpu.data.augment import identity_patches

    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, (5, 49, 49, 3), dtype=np.uint8)
    got = finish_patches_center(big)
    want = np.asarray(identity_patches(jnp.asarray(big[None])))[0]
    np.testing.assert_array_equal(got, want)


def test_crop_patches_matches_eval_pipeline(strict_model):
    """register_scene + crop_patches == the data pipeline's own crop
    (extract_big_patches at last-obs px + identity transform)."""
    from mggan_tpu.data.dataset import extract_big_patches
    from mggan_tpu.data.augment import identity_patches

    img = make_scene_img()
    ppm = 2.0
    strict_model.register_scene("unit", img, ppm)
    obs = make_obs(3, seed=4) + 8.0  # keep crops mostly in-bounds
    got = strict_model.crop_patches("unit", obs)

    centers_px = (obs[:, -1] * ppm).astype(np.float32)
    big = extract_big_patches(img, centers_px)
    want = np.asarray(identity_patches(jnp.asarray(big[None])))[0]
    np.testing.assert_array_equal(got, want)

    with pytest.raises(KeyError):
        strict_model.crop_patches("nope", obs)

    # end-to-end: server-side cropped patches == client-side ready-made ones
    a = strict_model.predict(obs, patches=got, seed=5)
    b = strict_model.predict_batch([obs], [strict_model.crop_patches("unit", obs)],
                                   seed=5)[0]
    np.testing.assert_array_equal(a, b)


def test_http_scene_contract(predictor):
    """Strict HTTP server: patch-less predict -> 400; /v1/scenes + scene_ids
    -> served with server-side crops; explicit patches accepted; metadata
    reports wants_scene + registered scenes."""
    m = ServingModel.from_predictor(predictor, "sampling", S, P, K)
    server, batcher, port = start_background(m, max_wait_ms=5.0)
    try:
        # metadata advertises the scene requirement
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/metadata", timeout=30
        ) as r:
            meta = json.loads(r.read())
        assert meta["wants_scene"] is True
        assert meta["allow_missing_scene"] is False
        assert meta["registered_scenes"] == []

        obs = make_obs(2, seed=6)
        # 1) no scene input -> 400 MissingSceneInputError
        try:
            _post(port, {"scenes": [obs.tolist()]})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "MissingSceneInputError" in json.loads(e.read())["error"]

        # 2) register a scene, then reference it per request
        img = make_scene_img(seed=1)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/scenes",
            data=json.dumps({
                "name": "lobby", "image": img.tolist(), "px_per_meter": 2.0,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["scenes"] == ["lobby"]

        out = _post(port, {
            "scenes": [obs.tolist()], "scene_ids": ["lobby"], "seed": 3,
        })
        assert "warning" not in out
        arr = np.asarray(out["predictions"][0])
        assert arr.shape == (K, 2, 12, 2) and np.isfinite(arr).all()
        # equals a direct call with the same server-side crop + seed fold
        fold = (0 * 1_000_003 + 3 + 1) % 2**31
        want = m.predict_batch([obs], [m.crop_patches("lobby", obs)],
                               seed=fold)[0]
        np.testing.assert_allclose(arr, want, atol=1e-6)

        # 3) ready-made patches in the request body
        pats = make_patches(2, seed=6)
        out = _post(port, {
            "scenes": [obs.tolist()], "patches": [pats.tolist()], "seed": 3,
        })
        want = m.predict_batch([obs], [pats], seed=fold)[0]
        np.testing.assert_allclose(
            np.asarray(out["predictions"][0]), want, atol=1e-6
        )

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/metadata", timeout=30
        ) as r:
            assert json.loads(r.read())["registered_scenes"] == ["lobby"]
    finally:
        server.shutdown()
        batcher.close()


def test_http_allow_missing_scene_warns(model):
    """Permissive server (--allow_missing_scene): patch-less requests are
    served but the response carries an explicit degradation warning."""
    server, batcher, port = start_background(model, max_wait_ms=5.0)
    try:
        out = _post(port, {"scenes": [make_obs(1).tolist()]})
        assert "degraded" in out.get("warning", "")
        assert np.isfinite(np.asarray(out["predictions"][0])).all()
    finally:
        server.shutdown()
        batcher.close()


def test_offline_cli_scene_img(predictor, tmp_path):
    """mggan-serve --scene_img crops patches server-side; without it a
    scene-conditioned artifact errors unless --allow_missing_scene."""
    import cv2

    from mggan_tpu.cli.serve import main as serve_main

    exported = export_predictor(predictor, "sampling", S, P, K)
    art = tmp_path / "m.jaxexport"
    save_artifact(exported, art, {"wants_scene": True, "strategy": "sampling"})

    rows = []
    for f in range(10):
        for pid in (1, 2):
            rows.append(f"{f} {pid} {0.1 * f + pid:.3f} {0.05 * f:.3f}")
    txt = tmp_path / "obs.txt"
    txt.write_text("\n".join(rows) + "\n")
    img = make_scene_img(seed=2)
    img_path = tmp_path / "scene.png"
    cv2.imwrite(str(img_path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    # scene-conditioned artifact + no scene input -> hard error
    with pytest.raises(MissingSceneInputError):
        serve_main([
            "--artifact", str(art), "--input", str(txt),
            "--output", str(tmp_path / "x.npz"),
        ])

    out = tmp_path / "preds.npz"
    serve_main([
        "--artifact", str(art), "--input", str(txt), "--output", str(out),
        "--scene_img", str(img_path), "--px_per_meter", "2.0",
    ])
    z = np.load(out)
    windows = [k for k in z.files if k.startswith("window_")]
    assert len(windows) == 3
    assert all(np.isfinite(z[k]).all() for k in windows)

    # --allow_missing_scene opts into zero-patch serving, and it differs
    out2 = tmp_path / "preds_noscene.npz"
    with pytest.warns(UserWarning, match="without scene patches"):
        serve_main([
            "--artifact", str(art), "--input", str(txt),
            "--output", str(out2), "--allow_missing_scene",
        ])
    z2 = np.load(out2)
    assert not np.array_equal(z["window_00000"], z2["window_00000"])


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


def zero_patches(peds):
    return np.zeros((peds, 33, 33, 4), np.float32)


def test_bucketed_dispatch_and_equality(predictor):
    """A bucketed model pads a request only to the smallest bucket that
    fits (small requests move small tensors) and its output equals a plain
    model compiled at exactly that bucket size — same program, same padded
    input, same seed."""
    bucketed = ServingModel.from_predictor(
        predictor, "sampling", S, P, K, scene_buckets=(1, 2, S)
    )
    assert bucketed.buckets == (1, 2, S)

    # spy on which bucket program each request dispatches
    dispatched = []
    real_calls = dict(bucketed._calls)

    def spy(b):
        def call(xy, mask, pat, seed):
            dispatched.append(b)
            assert xy.shape[0] == b
            return real_calls[b](xy, mask, pat, seed)
        return call

    bucketed._calls = {b: spy(b) for b in bucketed.buckets}

    obs1, obs2, obs3 = make_obs(2, seed=1), make_obs(3, seed=2), make_obs(1, seed=3)
    out1 = bucketed.predict(obs1, patches=zero_patches(2), seed=7)
    out2 = bucketed.predict_batch(
        [obs2, obs3], [zero_patches(3), zero_patches(1)], seed=9
    )
    out3 = bucketed.predict_batch(
        [obs1, obs2, obs3],
        [zero_patches(2), zero_patches(3), zero_patches(1)], seed=11,
    )
    assert dispatched == [1, 2, S]  # n=1 -> 1, n=2 -> 2, n=3 -> 4

    for n, plain_outs, seed, req in [
        (1, [out1], 7, [(obs1, zero_patches(2))]),
        (2, out2, 9, [(obs2, zero_patches(3)), (obs3, zero_patches(1))]),
    ]:
        plain = ServingModel.from_predictor(
            predictor, "sampling", n, P, K
        )
        ref = plain.predict_batch(
            [o for o, _ in req], [p for _, p in req], seed=seed
        )
        for a, b in zip(plain_outs, ref):
            np.testing.assert_array_equal(a, b)
    assert all(np.isfinite(o).all() for o in out3)

    with pytest.raises(ValueError, match="scenes > compiled batch"):
        bucketed.predict_batch([obs1] * (S + 1))


def test_microbatcher_bucket_early_dispatch_equality(predictor):
    """A lone request against a bucketed model must dispatch as soon as it
    fills the 1-scene bucket — NOT wait out max_wait toward the max batch —
    and the early-dispatched result must equal the direct small-bucket call
    with the worker's folded seed (serving/runtime.py::_run)."""
    import time as _time

    bucketed = ServingModel.from_predictor(
        predictor, "sampling", S, P, K, scene_buckets=(1, 2, S)
    )
    obs = make_obs(2, seed=6)
    pat = zero_patches(2)
    bucketed.predict(obs, patches=pat)  # compile outside the timed window

    with MicroBatcher(bucketed, max_wait_ms=10_000.0) as mb:
        t0 = _time.monotonic()
        out = mb.predict(obs, patches=pat, seed=7, timeout=60.0)
        dt = _time.monotonic() - t0
        assert mb.early_dispatches == 1
    # far below the 10 s max_wait the old drain would have slept
    assert dt < 5.0
    # the worker folds each request seed: one request of seed 7 -> 8
    direct = bucketed.predict(obs, patches=pat, seed=8)
    np.testing.assert_array_equal(out, direct)


def test_microbatcher_bucket_growth_under_backlog():
    """With a backlog queued, draining grows past the small bucket without
    waiting (non-empty queue pops instantly); with the queue empty it stops
    at the bucket boundary. Deterministic via a blockable fake model."""
    import threading as _threading

    release = _threading.Event()
    sizes = []

    def make_call(b):
        def call(xy, mask, pat, seed):
            sizes.append(b)
            release.wait(timeout=30.0)
            return np.zeros((K, b, P, 12, 2), np.float32)
        return call

    fake = ServingModel(
        {b: make_call(b) for b in (1, 2, 4)}, 4, P, K, wants_scene=False
    )
    obs = make_obs(1, seed=0)
    with MicroBatcher(fake, max_wait_ms=10_000.0) as mb:
        f0 = mb.submit(obs)  # worker takes it and blocks inside the call
        while not sizes:  # wait until the worker is inside call #1
            _time_sleep(0.005)
        f1, f2 = mb.submit(obs), mb.submit(obs)  # backlog while blocked
        release.set()
        for f in (f0, f1, f2):
            f.result(timeout=30.0)
        # batch 1: the lone first request (bucket 1, early);
        # batch 2: both backlogged requests drained instantly (bucket 2,
        # early at the boundary instead of growing toward 4)
        assert sizes == [1, 2]
        assert mb.early_dispatches == 2


def _time_sleep(s):
    import time as _t

    _t.sleep(s)


def test_multibucket_artifact_roundtrip(predictor, tmp_path):
    """One artifact carries every bucket program; from_artifact loads them
    all and load_artifact (backwards-compat surface) picks the largest."""
    from mggan_tpu.cli.export import load_artifact

    exporteds = [
        export_predictor(predictor, "sampling", s, P, K) for s in (1, S)
    ]
    path = tmp_path / "buckets.jaxexport"
    save_artifact(exporteds, path, {"wants_scene": True, "strategy": "sampling"})

    m = ServingModel.from_artifact(path)
    assert m.buckets == (1, S) and (m.scenes, m.peds, m.num) == (S, P, K)

    obs = make_obs(2, seed=4)
    out = m.predict(obs, patches=zero_patches(2), seed=3)
    live = ServingModel.from_predictor(predictor, "sampling", 1, P, K)
    ref = live.predict(obs, patches=zero_patches(2), seed=3)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    largest, meta = load_artifact(path)
    assert largest.in_avals[0].shape[0] == S
    assert meta["strategy"] == "sampling"
