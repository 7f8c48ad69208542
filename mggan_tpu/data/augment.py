"""On-device batched augmentation + patch finishing.

The reference augments per-item on the host: random LR/TB flip and an
arbitrary rotation of the scene image about its centre, applied to both the
trajectories and the per-ped 33x33 patch crops
(trajectories_scene.py:276-317, BaseTrajectories.py:254-288).

TPU re-design: host work stops at a per-ped 49x49 uint8 "big patch" crop
around the (unaugmented) last observed position.  Because rotation is rigid,
rotating the scene about its centre and re-cropping at the rotated position
equals rotating the patch about its own centre — so the device can apply
flip+rotation to trajectories analytically and to patches with one bilinear
gather (``map_coordinates``), fully batched over (scenes, peds).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mggan_tpu.data.dataset import MARGIN, PATCH, BIG_MARGIN


def rotate_points(xy, center, alpha):
    """Rotate points about ``center`` (trajectories_scene.py:15-29 convention:
    x' = +cos*dx + sin*dy, y' = -sin*dx + cos*dy)."""
    d = xy - center
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    x = d[..., 0] * ca + d[..., 1] * sa
    y = -d[..., 0] * sa + d[..., 1] * ca
    return jnp.stack([x, y], -1) + center


def augment_trajectories(xy, wh_m, flip, alpha):
    """Flip + rotate + re-offset scene trajectories.

    Args:
        xy:    (S, P, T, 2) meters (NaNs pass through).
        wh_m:  (S, 2) scene image extent in meters.
        flip:  (S,) int in {0,1,2} (none / LR / TB).
        alpha: (S,) rotation angle (radians).

    Returns:
        (S, P, T, 2) augmented coordinates, shifted so the rotated image's
        min corner is at the origin (trajectories_scene.py:300-317).
    """
    w = wh_m[:, 0][:, None, None]
    h = wh_m[:, 1][:, None, None]
    f = flip[:, None, None]
    x = jnp.where(f == 1, w - xy[..., 0], xy[..., 0])
    y = jnp.where(f == 2, h - xy[..., 1], xy[..., 1])
    pts = jnp.stack([x, y], -1)

    center = wh_m[:, None, None, :] / 2.0
    a = alpha[:, None, None]
    rot = rotate_points(pts, center, a)

    corners = jnp.stack(
        [
            jnp.zeros_like(wh_m),
            jnp.stack([jnp.zeros_like(wh_m[:, 0]), wh_m[:, 1]], -1),
            wh_m,
            jnp.stack([wh_m[:, 0], jnp.zeros_like(wh_m[:, 1])], -1),
        ],
        axis=1,
    )  # (S, 4, 2)
    corners_rot = rotate_points(corners, wh_m[:, None, :] / 2.0, alpha[:, None])
    offset = corners_rot.min(axis=1)  # (S, 2)
    return rot - offset[:, None, None, :]


def _sample_patch(big, flip, alpha):
    """Cut an augmented 33x33 RGB window out of one 49x49 big patch.

    big: (49, 49, 3) float; returns (33, 33, 3).
    Source coordinate for output offset p: center + F(R^-1 p), where R^-1 is
    the inverse of the trajectory rotation and F the flip.
    """
    p = jnp.arange(PATCH, dtype=jnp.float32) - MARGIN
    px, py = jnp.meshgrid(p, p, indexing="xy")  # (33,33) x right, y down
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    # inverse rotation (transpose of rotate_points' matrix)
    qx = px * ca - py * sa
    qy = px * sa + py * ca
    qx = jnp.where(flip == 1, -qx, qx)
    qy = jnp.where(flip == 2, -qy, qy)
    rows = BIG_MARGIN + qy
    cols = BIG_MARGIN + qx
    sample = lambda ch: jax.scipy.ndimage.map_coordinates(
        ch, [rows, cols], order=1, mode="constant", cval=0.0
    )
    return jnp.stack([sample(big[..., c]) for c in range(3)], axis=-1)


def finish_patches(big_patches, flip, alpha, interp="nearest"):
    """uint8 (S,P,49,49,3) -> model patches (S,P,33,33,4) float32.

    Applies flip/rotation per scene, normalises to [-1, 1)
    (BaseTrajectories.py:283: ``-1 + raw * 2/256``) and appends the one-hot
    centre position channel (BaseTrajectories.py:278-284).

    TPU implementation: bilinear sampling factors per output pixel o into
    separable tap weights ``w = relu(1-|sx_o-ix|) * relu(1-|sy_o-iy|)``
    (identical to ``map_coordinates(order=1, mode="constant", cval=0)``),
    so the whole resample becomes one MXU contraction over source columns
    plus a weighted reduce over source rows — shared per scene across peds
    and channels. The per-ped ``map_coordinates`` gathers this replaces
    were ~900 ms/batch on v5e; this is ~milliseconds. The einsum is chunked
    over scenes to cap the (Sc, P, O, 49, 3) intermediate.
    """
    s, p = big_patches.shape[:2]

    # per-scene source coordinates for each of the O=33*33 output pixels
    # (same inverse-rotation + flip convention as the trajectories)
    pcoord = jnp.arange(PATCH, dtype=jnp.float32) - MARGIN
    px, py = jnp.meshgrid(pcoord, pcoord, indexing="xy")
    px, py = px.ravel(), py.ravel()  # (O,), o = y*33 + x
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    qx = px[None] * ca[:, None] - py[None] * sa[:, None]
    qy = px[None] * sa[:, None] + py[None] * ca[:, None]
    qx = jnp.where(flip[:, None] == 1, -qx, qx)
    qy = jnp.where(flip[:, None] == 2, -qy, qy)
    sx = BIG_MARGIN + qx  # (S, O) source columns
    sy = BIG_MARGIN + qy  # (S, O) source rows

    grid = jnp.arange(2 * BIG_MARGIN + 1, dtype=jnp.float32)
    if interp == "nearest":
        # PIL-rotate-NEAREST semantics (the reference's resample mode,
        # PARITY deviation 5): each output pixel takes the single source
        # pixel nearest to its inverse-transformed coordinate — same
        # contraction with one-hot tap weights
        wx = (jnp.round(sx)[:, :, None] == grid[None, None]).astype(
            jnp.float32)
        wy = (jnp.round(sy)[:, :, None] == grid[None, None]).astype(
            jnp.float32)
    else:
        assert interp == "bilinear", interp
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs(sx[:, :, None] - grid[None, None]))
        wy = jnp.maximum(
            0.0, 1.0 - jnp.abs(sy[:, :, None] - grid[None, None]))

    big = big_patches.astype(jnp.float32)

    def resample(args):
        bigc, wxc, wyc = args
        # contract source columns on the MXU, then weighted-reduce rows
        tmp = jnp.einsum("spyxc,sox->spoyc", bigc, wxc)
        return jnp.sum(tmp * wyc[:, None, :, :, None], axis=3)  # (Sc,P,O,C)

    chunk = 32
    if s % chunk == 0 and s > chunk:
        rs = lambda x: x.reshape((s // chunk, chunk) + x.shape[1:])
        rgb = jax.lax.map(resample, (rs(big), rs(wx), rs(wy)))
        rgb = rgb.reshape(s, p, PATCH * PATCH, 3)
    else:
        rgb = resample((big, wx, wy))
    rgb = rgb.reshape(s, p, PATCH, PATCH, 3)
    rgb = -1.0 + rgb * 2.0 / 256.0

    pos = jnp.zeros((s, p, PATCH, PATCH, 1), jnp.float32)
    pos = pos.at[:, :, MARGIN, MARGIN, 0].set(1.0)
    return jnp.concatenate([rgb, pos], axis=-1)


def sample_aug_params(rng, s):
    """Per-scene augmentation draws (trajectories_scene.py:276-281):
    flip ~ uniform{0,1,2}, alpha ~ U(0, 2*pi)."""
    k1, k2 = jax.random.split(rng)
    flip = jax.random.randint(k1, (s,), 0, 3)
    alpha = jax.random.uniform(k2, (s,), maxval=2.0 * jnp.pi)
    return flip, alpha


def identity_patches(big_patches):
    """Identity-transform finishing: the 33x33 window is a pure centre
    crop of the 49x49 big patch (zero rotation -> integer source coords,
    bilinear weight 1), normalised + centre channel like finish_patches."""
    s, p = big_patches.shape[:2]
    off = BIG_MARGIN - MARGIN
    rgb = big_patches[:, :, off : off + PATCH, off : off + PATCH].astype(
        jnp.float32
    )
    rgb = -1.0 + rgb * 2.0 / 256.0
    pos = jnp.zeros((s, p, PATCH, PATCH, 1), jnp.float32)
    pos = pos.at[:, :, MARGIN, MARGIN, 0].set(1.0)
    return jnp.concatenate([rgb, pos], axis=-1)


def augment_batch(rng, batch, train: bool, interp="nearest"):
    """Produce augmented trajectories + finished model patches for a batch.

    batch keys: xy (S,P,20,2), big_patches (S,P,49,49,3) uint8 or absent,
    wh_m (S,2).  Identity transform when ``train`` is False.
    ``interp``: patch resampling. The signature default matches
    Config.patch_interp ("nearest", the reference's PIL resample mode and
    the measured-better r5 default — PARITY deviation 5, resolved) so a
    caller that does not thread the config cannot diverge from training;
    "bilinear" is the r1-r4 behavior, kept for A/B isolation.
    """
    s = batch["xy"].shape[0]
    out = dict(batch)
    has_patches = "big_patches" in batch and batch["big_patches"] is not None
    if train:
        flip, alpha = sample_aug_params(rng, s)
        out["xy"] = augment_trajectories(batch["xy"], batch["wh_m"], flip, alpha)
        if has_patches:
            out["patches"] = finish_patches(
                batch["big_patches"], flip, alpha, interp)
    else:
        out["xy"] = batch["xy"]
        if has_patches:
            out["patches"] = identity_patches(batch["big_patches"])
    if has_patches:
        out.pop("big_patches")
    return out
