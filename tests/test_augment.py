"""Augmentation invariants: identity path, rigid-motion preservation, and
patch-content equivalence under rotation/flip."""

import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.data import augment as aug
from mggan_tpu.data.dataset import BIG_MARGIN, MARGIN, PATCH


def test_identity_transform():
    rng = np.random.RandomState(0)
    xy = jnp.asarray(rng.randn(2, 3, 20, 2).astype(np.float32))
    wh = jnp.asarray(np.full((2, 2), 10.0, np.float32))
    out = aug.augment_trajectories(
        xy, wh, jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(xy), atol=1e-5)


def test_rotation_preserves_pairwise_geometry():
    rng = np.random.RandomState(1)
    xy = jnp.asarray(rng.rand(1, 4, 20, 2).astype(np.float32) * 10)
    wh = jnp.asarray(np.full((1, 2), 10.0, np.float32))
    out = aug.augment_trajectories(
        xy, wh, jnp.zeros(1, jnp.int32), jnp.asarray([1.1], jnp.float32)
    )
    d0 = np.linalg.norm(np.asarray(xy)[0, :, None] - np.asarray(xy)[0, None], axis=-1)
    d1 = np.linalg.norm(np.asarray(out)[0, :, None] - np.asarray(out)[0, None], axis=-1)
    np.testing.assert_allclose(d1, d0, atol=1e-4)
    # offsets (velocities) have preserved magnitude
    v0 = np.diff(np.asarray(xy)[0], axis=1)
    v1 = np.diff(np.asarray(out)[0], axis=1)
    np.testing.assert_allclose(
        np.linalg.norm(v1, axis=-1), np.linalg.norm(v0, axis=-1), atol=1e-4
    )


def test_flip_lr():
    xy = jnp.asarray(np.array([[[[1.0, 2.0]] * 20]], np.float32))  # (1,1,20,2)
    wh = jnp.asarray(np.array([[10.0, 8.0]], np.float32))
    out = aug.augment_trajectories(
        xy, wh, jnp.asarray([1], jnp.int32), jnp.zeros(1, jnp.float32)
    )
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], [9.0, 2.0], atol=1e-5)


def test_patch_identity_center_crop():
    rng = np.random.RandomState(2)
    big = rng.randint(0, 255, (1, 1, 2 * BIG_MARGIN + 1, 2 * BIG_MARGIN + 1, 3),
                      np.uint8)
    out = np.asarray(
        aug.finish_patches(
            jnp.asarray(big), jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.float32)
        )
    )
    assert out.shape == (1, 1, PATCH, PATCH, 4)
    lo = BIG_MARGIN - MARGIN
    hi = BIG_MARGIN + MARGIN + 1
    expected = -1.0 + big[0, 0, lo:hi, lo:hi].astype(np.float32) * 2.0 / 256.0
    np.testing.assert_allclose(out[0, 0, :, :, :3], expected, atol=1e-4)
    # centre position channel
    assert out[0, 0, MARGIN, MARGIN, 3] == 1.0
    assert out[0, 0, :, :, 3].sum() == 1.0


def test_patch_90deg_rotation_matches_trajectory_rotation():
    """A point feature in the scene must stay at the same position relative
    to the (rotated) trajectory: rotating by alpha and sampling the patch
    should move a bright pixel the same way rotate_points moves a point."""
    big = np.zeros((1, 1, 2 * BIG_MARGIN + 1, 2 * BIG_MARGIN + 1, 3), np.uint8)
    # bright pixel at offset (dx=6, dy=0) from centre
    big[0, 0, BIG_MARGIN, BIG_MARGIN + 6] = 255
    alpha = np.pi / 2
    out = np.asarray(
        aug.finish_patches(
            jnp.asarray(big), jnp.zeros(1, jnp.int32),
            jnp.asarray([alpha], np.float32),
        )
    )[0, 0, :, :, 0]
    # coordinate transform: (6,0) -> (6*cos, -6*sin) = (0, -6) => row 16-6
    r, c = np.unravel_index(np.argmax(out), out.shape)
    assert (r, c) == (MARGIN - 6, MARGIN)


def test_patch_flip_lr():
    big = np.zeros((1, 1, 2 * BIG_MARGIN + 1, 2 * BIG_MARGIN + 1, 3), np.uint8)
    big[0, 0, BIG_MARGIN, BIG_MARGIN + 6] = 255
    out = np.asarray(
        aug.finish_patches(
            jnp.asarray(big), jnp.asarray([1], jnp.int32),
            jnp.zeros(1, np.float32),
        )
    )[0, 0, :, :, 0]
    r, c = np.unravel_index(np.argmax(out), out.shape)
    assert (r, c) == (MARGIN, MARGIN - 6)


def test_finish_patches_matches_map_coordinates_oracle():
    """The separable-matmul bilinear resample equals the per-ped
    map_coordinates formulation (augment.py::_sample_patch) exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mggan_tpu.data import augment as aug

    rng = np.random.RandomState(3)
    s, p = 5, 3
    big = jnp.asarray(rng.randint(0, 255, (s, p, 49, 49, 3), np.uint8))
    flip = jnp.asarray(rng.randint(0, 3, (s,)))
    alpha = jnp.asarray(rng.uniform(0, 2 * np.pi, (s,)).astype(np.float32))

    out = aug.finish_patches(big, flip, alpha, "bilinear")

    flat = big.astype(jnp.float32).reshape(s * p, 49, 49, 3)
    rgb_ref = jax.vmap(aug._sample_patch)(
        flat, jnp.repeat(flip, p), jnp.repeat(alpha, p)
    )
    rgb_ref = (-1.0 + rgb_ref * 2.0 / 256.0).reshape(s, p, 33, 33, 3)
    np.testing.assert_allclose(
        np.asarray(out[..., :3]), np.asarray(rgb_ref), atol=2e-4
    )
    # one-hot centre channel intact
    assert float(out[0, 0, 16, 16, 3]) == 1.0
    assert float(jnp.abs(out[..., 3]).sum()) == s * p


def test_identity_patches_equals_zero_transform():
    """Eval fast path (centre crop) == finish_patches with flip=0, alpha=0."""
    import jax.numpy as jnp
    import numpy as np
    from mggan_tpu.data import augment as aug

    rng = np.random.RandomState(7)
    big = jnp.asarray(rng.randint(0, 255, (3, 2, 49, 49, 3), np.uint8))
    zero_f = jnp.zeros((3,), jnp.int32)
    zero_a = jnp.zeros((3,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(aug.identity_patches(big)),
        np.asarray(aug.finish_patches(big, zero_f, zero_a)),
        atol=1e-5,
    )


def test_finish_patches_nearest_mode():
    """interp="nearest" (the reference's PIL rotate resample, kept for A/B
    isolation of deviation 5): identity transform still equals the centre
    crop, and every output pixel equals SOME single source pixel (one-hot
    tap weights — no blending)."""
    import jax.numpy as jnp
    import numpy as np
    from mggan_tpu.data import augment as aug

    rng = np.random.RandomState(11)
    big = jnp.asarray(rng.randint(0, 255, (3, 2, 49, 49, 3), np.uint8))
    zero_f = jnp.zeros((3,), jnp.int32)
    zero_a = jnp.zeros((3,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(aug.finish_patches(big, zero_f, zero_a, "nearest")),
        np.asarray(aug.identity_patches(big)),
        atol=1e-6,
    )

    flip = jnp.asarray(rng.randint(0, 3, (3,)))
    alpha = jnp.asarray(rng.uniform(0, 2 * np.pi, (3,)).astype(np.float32))
    out = np.asarray(
        aug.finish_patches(big, flip, alpha, "nearest")[..., :3])
    src = -1.0 + np.asarray(big, np.float32) * 2.0 / 256.0
    # no blending: every non-zero output value exists in the source patch
    vals = {round(float(v), 5) for v in np.unique(src)} | {0.0}
    got = {round(float(v), 5) for v in np.unique(out)}
    assert got <= vals
