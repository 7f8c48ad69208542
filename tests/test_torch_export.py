"""Reverse checkpoint export (models/torch_export.py): our trained pytrees
-> reference-format torch state dicts.

Pins both directions of interop:
* roundtrip — export -> torch_import gives back bitwise-identical pytrees
  (the import side is itself parity-pinned against torch twins);
* strict torch load — the exported generator state dict loads with
  ``strict=True`` into the assembled reference-key-named twin
  (tests/test_assembled_import.py) and the twin's forward then matches our
  model numerically: a model trained HERE evaluates identically in
  reference-shaped torch code.
"""

import numpy as np
import torch
import jax
import jax.numpy as jnp

from mggan_tpu.models import discriminator as D_mod
from mggan_tpu.models import generator as G_mod
from mggan_tpu.models import torch_export, torch_import

from test_assembled_import import (  # noqa: F401
    NG, PRED_LEN, Z, TFullDisc, TFullGen, _disc_spec, _fixture_batch,
    _gen_spec, _to_ours,
)


def _assert_trees_equal(a, b):
    ta = jax.tree_util.tree_structure(a)
    tb = jax.tree_util.tree_structure(b)
    assert ta == tb, f"{ta}\n!=\n{tb}"
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_generator_export_roundtrip():
    spec = _gen_spec()
    params, state = G_mod.init(jax.random.PRNGKey(0), spec)
    sd = torch_export.export_generator(params, state, spec)
    params2, state2 = torch_import.import_generator(sd, spec)
    _assert_trees_equal(params, params2)
    _assert_trees_equal(state, state2)


def test_discriminator_export_roundtrip():
    spec = _disc_spec()
    params, state = D_mod.init(jax.random.PRNGKey(1), spec)
    sd = torch_export.export_discriminator(params, state, spec)
    params2, state2 = torch_import.import_discriminator(sd, spec)
    _assert_trees_equal(params, params2)
    # probgan-only state (hist len counter) is not exported; mgan has none
    _assert_trees_equal(state, state2)


def test_discrete_generator_export_roundtrip():
    import dataclasses

    spec = dataclasses.replace(_gen_spec(), discrete=True)
    params, state = G_mod.init(jax.random.PRNGKey(2), spec)
    sd = torch_export.export_generator(params, state, spec)
    params2, state2 = torch_import.import_generator(sd, spec)
    _assert_trees_equal(params, params2)
    _assert_trees_equal(state, state2)


def test_exported_generator_strict_loads_and_matches():
    """strict=True catches any missing/extra key; forward parity catches any
    layout mistake."""
    spec = _gen_spec()
    params, state = G_mod.init(jax.random.PRNGKey(3), spec)
    sd = torch_export.export_generator(params, state, spec)

    twin = TFullGen().eval()
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )

    s, p, k = 2, 3, 2
    in_xy_t, in_dxdy_t, img_t, noise_t, sub_batches = _fixture_batch(s, p, k)
    ref_abs, ref_rel, ref_logits = twin(
        in_xy_t, in_dxdy_t, img_t, sub_batches, noise_t
    )

    in_xy, in_dxdy, patches, noise = _to_ours(
        in_xy_t, in_dxdy_t, img_t, noise_t, s, p
    )
    mask = jnp.ones((s, p), bool)
    enc_h, social_feats, _ = G_mod.encode(
        params, state, spec, in_xy, in_dxdy, mask, patches, train=False
    )
    logits = G_mod.pm_logits(params, spec, enc_h)
    np.testing.assert_allclose(
        np.asarray(logits).reshape(s * p, NG), ref_logits.numpy(), atol=2e-5
    )
    out = G_mod.decode_all(
        params, spec, in_xy[:, :, -1], in_dxdy[:, :, -1], enc_h, social_feats,
        noise,
    )
    ours_abs = np.asarray(out.abs).reshape(k, NG, s * p, PRED_LEN, 2)
    np.testing.assert_allclose(
        ours_abs.transpose(3, 0, 1, 2, 4), ref_abs.numpy(), atol=1e-4
    )


def test_exported_discriminator_strict_loads(tmp_path):
    spec = _disc_spec()
    params, state = D_mod.init(jax.random.PRNGKey(4), spec)
    sd = torch_export.export_discriminator(params, state, spec)
    twin = TFullDisc().eval()
    twin.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    # save/load through torch.save to pin the .pth container too
    torch_export.save_torch_checkpoint(
        tmp_path / "c.pth",
        torch_export.export_generator(*G_mod.init(jax.random.PRNGKey(5),
                                                  _gen_spec()), _gen_spec()),
        sd,
    )
    obj = torch.load(tmp_path / "c.pth", weights_only=False)
    assert set(obj) == {"generator", "discriminator"}
    np.testing.assert_array_equal(
        obj["discriminator"]["discs.0.0.weight"].numpy(), sd["discs.0.0.weight"]
    )
