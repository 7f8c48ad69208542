"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 5):
DP sharding compiles/executes and matches the single-device step bitwise-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mggan_tpu.config import Config
from mggan_tpu.data.loaders import get_dataloader
from mggan_tpu.models import factory
from mggan_tpu.parallel import dp, mesh as mesh_lib
from mggan_tpu.training.state import init_train_state
from mggan_tpu.training.steps import build_train_step


def setup(num_gens=2, gp=1):
    cfg = Config(
        dataset="synthetic_memory", batch_size=8, num_gens=num_gens,
        num_samples=4, h_dim=16, decoder_h_dim=16,
        gan_type="mgan", weighting_target="ml",
    )
    key = jax.random.PRNGKey(0)
    g_pack, d_pack = factory.construct_model(cfg, key)
    state = init_train_state(cfg, g_pack, d_pack, jax.random.PRNGKey(1))
    loader = get_dataloader(cfg.dataset, "train", batch_size=8, shuffle=False)
    batch = next(iter(loader))
    # patches must be non-degenerate: all-identical patches give BatchNorm
    # zero batch variance, where gradients are numerically knife-edged and
    # legitimately differ across reduction orders/shardings
    patches = jax.random.uniform(
        jax.random.PRNGKey(5), batch["xy"].shape[:2] + (33, 33, 4),
        minval=-1.0, maxval=1.0,
    )
    model_batch = {
        "xy": jnp.asarray(batch["xy"]),
        "ped_mask": jnp.asarray(batch["ped_mask"]),
        "patches": patches,
    }
    return cfg, g_pack, d_pack, state, model_batch


def test_dp_matches_single_device():
    cfg, g_pack, d_pack, state, batch = setup()
    single_step = build_train_step(cfg, g_pack[2], d_pack[2])
    s1, m1 = single_step(jax.tree.map(jnp.copy, state), batch)

    mesh = mesh_lib.make_mesh(dp=4, gp=1)
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, batch
    )
    s2, m2 = pstep(pstate, dp.shard_batch(mesh, batch))

    assert_steps_match(s1, m1, s2, m2)


def assert_steps_match(s1, m1, s2, m2):
    """DP == single device, asserted at the strongest meaningful level:

    * every scalar metric to 1e-5 relative;
    * GRADIENTS elementwise via the Adam moments (mu = (1-b1)*g after one
      step) to ~1e-7 absolute — the real invariant;
    * parameters to 2e-3: Adam's step-1 update is lr*g/(|g|+eps) ~= +-lr,
      so reduction-order noise on near-zero gradients legitimately flips
      update signs and params can differ by O(lr) even with matching grads.
    """
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    for name in ("g_opt", "d_opt"):
        t1, t2 = jax.device_get((getattr(s1, name), getattr(s2, name)))
        for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
                err_msg=f"{name} moment mismatch",
            )
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s1.g_params, jax.device_get(s2.g_params),
    )
    assert max(jax.tree.leaves(diffs)) < 2e-3


def test_dp_uneven_batch_pads_and_matches():
    """batch_size not divisible by --dp: shard_batch pads with fully-masked
    scenes and the sharded step equals the single-device step on the same
    padded batch (noise draws are shape-keyed, so the unpadded batch is not
    the comparison point — padding must happen identically on both sides)."""
    cfg, g_pack, d_pack, state, batch = setup()
    batch6 = jax.tree.map(lambda x: x[:6], batch)  # 6 scenes, dp=4
    padded = dp.pad_scenes_to_multiple(batch6, 4)
    assert jax.tree.leaves(padded)[0].shape[0] == 8
    assert not bool(padded["ped_mask"][6:].any())  # pad scenes fully masked

    single_step = build_train_step(cfg, g_pack[2], d_pack[2])
    s1, m1 = single_step(jax.tree.map(jnp.copy, state), padded)

    mesh = mesh_lib.make_mesh(dp=4, gp=1)
    sharded = dp.shard_batch(mesh, batch6)  # pads internally to 8
    assert jax.tree.leaves(sharded)[0].shape[0] == 8
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, sharded
    )
    s2, m2 = pstep(pstate, sharded)
    assert_steps_match(s1, m1, s2, m2)


def test_generator_parallel_executes():
    cfg, g_pack, d_pack, state, batch = setup(num_gens=4)
    mesh = mesh_lib.make_mesh(dp=2, gp=2)
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, batch
    )
    s2, m2 = pstep(pstate, dp.shard_batch(mesh, batch))
    for k, v in m2.items():
        assert np.isfinite(float(v)), k


def test_trainer_dp_cli_path(tmp_path):
    """Trainer with --dp builds the sharded step lazily and trains/validates."""
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter

    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=1,
        num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
        gan_type="mgan", weighting_target="ml", dp=4, log_dir=str(tmp_path),
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=21,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer).train()
    assert int(tr.state.step) > 0


def test_multislice_mesh_matches_single_device():
    """(slice=2, data=2, model=2) mesh on the 8-device virtual backend:
    scenes shard over (slice, data), gradients all-reduce across slices
    (DCN axis on real pods); result equals the single-device step."""
    cfg, g_pack, d_pack, state, batch = setup(num_gens=4)
    single_step = build_train_step(cfg, g_pack[2], d_pack[2])
    s1, m1 = single_step(jax.tree.map(jnp.copy, state), batch)

    mesh = mesh_lib.make_mesh(dp=2, gp=2, slices=2)
    assert mesh.axis_names == ("slice", "data", "model")
    assert mesh_lib.data_shard_count(mesh) == 4
    pstep, pstate = dp.make_parallel_train_step(
        cfg, g_pack[2], d_pack[2], mesh, state, batch
    )
    s2, m2 = pstep(pstate, dp.shard_batch(mesh, batch))
    assert_steps_match(s1, m1, s2, m2)


def test_patch_bank_on_mesh_matches_host_assembly():
    """Mesh-replicated patch bank: device gathers bitwise-match host patch
    assembly, so DP training keeps the fast device-side feed
    (data/patch_bank.py, VERDICT r2 item 4)."""
    from mggan_tpu.data.batcher import PaddedBatcher
    from mggan_tpu.data.patch_bank import DevicePatchBank
    from mggan_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_windows=10, max_peds=5, seed=3)
    mesh = mesh_lib.make_mesh(dp=4, gp=1)
    bank = DevicePatchBank(ds, max_peds=5, mesh=mesh)
    host = PaddedBatcher(ds, batch_size=4, max_peds=5, shuffle=False)
    banked = PaddedBatcher(ds, batch_size=4, max_peds=5, shuffle=False,
                           patch_bank=bank)
    assert not banked.include_patches
    for bh, bb in zip(host, banked):
        np.testing.assert_array_equal(
            np.asarray(bb["big_patches"]), bh["big_patches"]
        )


def test_trainer_dp_with_patch_bank(tmp_path):
    """Trainer --dp 4 --patch_bank 1 trains end-to-end with the replicated
    bank (previously the mesh path silently fell back to host assembly)."""
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter

    cfg = Config(
        dataset="synthetic_memory", batch_size=4, num_gens=2, epochs=1,
        num_samples=4, h_dim=16, decoder_h_dim=16, top_k_test=3,
        gan_type="mgan", weighting_target="ml", dp=4, patch_bank=1,
        augment=1, log_dir=str(tmp_path),
    )
    writer = ExperimentWriter(tmp_path, cfg.experiment, cfg.name, version=22,
                              config=cfg, tensorboard=False)
    tr = Trainer(cfg, writer).train()
    assert int(tr.state.step) > 0


def test_pallas_decode_under_mesh_interpret():
    """Pallas kernels under shard_map on the 8-device mesh (interpret mode):
    pins the semantics the factory's pallas-x-mesh gate protects
    (models/factory.py:34-39) so real multi-chip hardware has ready
    scaffolding — rows batch-sharded, weights replicated, both the
    fused-selection forward and the train fwd+bwd custom-VJP path must
    equal the single-device run."""
    from jax.sharding import PartitionSpec as P
    from test_pallas_decoder import make_inputs
    from mggan_tpu.ops.pallas import decoder as dec

    G, N = 2, 64  # 8 rows per device
    stacked, xy, dxdy, soc, h0 = make_inputs("rel", G=G, N=N, EMB=8, H=16,
                                             F=4, seed=7)
    idx = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, G)
    onehot = jax.nn.one_hot(idx, G)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))

    dec.INTERPRET = True
    try:
        # --- fused-selection forward, batch-sharded over the mesh
        def select(st, xy, dxdy, soc, h0, oh):
            a, r = dec.pallas_decode_select(st, xy, dxdy, soc, h0, oh, 12,
                                            "rel")
            return a, r

        # check_vma=False: pallas_call's out_shape carries no vma info
        sharded_select = jax.jit(jax.shard_map(
            select, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                      P("data")),
            out_specs=(P("data"), P("data")), check_vma=False,
        ))
        got_abs, got_rel = sharded_select(stacked, xy, dxdy, soc, h0, onehot)
        want_abs, want_rel = select(stacked, xy, dxdy, soc, h0, onehot)
        np.testing.assert_allclose(np.asarray(got_abs), np.asarray(want_abs),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_rel), np.asarray(want_rel),
                                   atol=2e-5)

        # --- train fwd + fused backward kernel (custom VJP) under the mesh
        def loss(p, xy, dxdy, soc, h0):
            a, r = dec.pallas_decode_all(p, xy, dxdy, soc, h0, 12, "rel")
            return (a ** 2).sum() + (r * 0.3).sum()

        def shard_grad(p, xy, dxdy, soc, h0):
            g = jax.grad(loss)(p, xy, dxdy, soc, h0)
            # params are replicated: per-shard partial grads -> global
            return jax.tree.map(lambda t: jax.lax.psum(t, "data"), g)

        grads_mesh = jax.jit(jax.shard_map(
            shard_grad, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data"), P("data")),
            out_specs=P(), check_vma=False,
        ))(stacked, xy, dxdy, soc, h0)
        grads_one = jax.grad(loss)(stacked, xy, dxdy, soc, h0)
        for a, b in zip(jax.tree.leaves(grads_mesh),
                        jax.tree.leaves(grads_one)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)
    finally:
        dec.INTERPRET = False
