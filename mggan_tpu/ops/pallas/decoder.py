"""Pallas TPU kernel: fused multi-generator autoregressive decoder.

The hottest op in the framework is the 12-step rollout of N generator
decoders over (samples x scenes x peds) rows (reference: Python loop over
``self.gs`` of per-step cuDNN LSTM calls, standard.py:255-261 +
common_modules.py:112-128).

Design (v2 — "generators packed into lanes"):

* The generator axis is folded into the LANE dimension: the recurrent state
  is ``h, c : (TILE, G*H)`` (G=4, H=32 -> 128 lanes, a full VPU register
  row), instead of looping generators sequentially over (TILE, 32) slabs.
* Gate weights are packed GATE-TYPE-MAJOR into block-diagonal matrices
  ``(G*H, 4*G*H)`` so each step is ONE full-depth (K=128) MXU contraction
  producing all generators' gates at once; the i/f/g/o splits are then
  contiguous 128-lane slices.
* The whole rollout runs in VMEM: h/c/xy never touch HBM between steps, and
  the 12 steps' outputs are concatenated into one wide (TILE, 12*4*G) store
  (the v1 kernel's 2-wide column stores were its bottleneck).
* Row inputs (h0, packed social contribution, seed positions) are read from
  HBM once per row tile; weights stay resident in VMEM across the grid.
* Optional bf16 compute for the recurrent matmuls (serving fast path).

Training integration: ``pallas_decode_all`` carries a ``jax.custom_vjp``
whose backward recomputes through the XLA scan path
(``stacked_decoders_apply``), so the kernel is safe under ``jax.grad`` —
the D-step and PM-step rollouts are under ``stop_gradient`` and get the
kernel's forward speed for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 1024

# Tests on CPU flip this to run the kernel through the Pallas interpreter.
INTERPRET = False


def _packed_weights(stacked, inp_format: str):
    """Stacked per-generator params -> lane-packed block-diagonal weights.

    Returns:
        w_emb (G*in, 4*G*H)   embedding folded into the input-gate matmul,
                               gate-type-major columns (all gens' i, then f,
                               then g, then o), block-diagonal over gens;
        w_hh  (G*H, 4*G*H)    recurrent weights, same column layout;
        b     (4*G*H,)        fused bias;
        w1    (G*H, G*hid)    hidden2pos first layer (block-diagonal);
        w2    (G*hid, G*2)    hidden2pos second layer (block-diagonal);
        b2    (G*2,)
    """
    emb_w = stacked["spatial_embedding"]["w"]  # (G, in, emb)
    emb_b = stacked["spatial_embedding"]["b"]  # (G, emb)
    w_ih = stacked["lstm"]["w_ih"]  # (G, emb, 4h)
    w_hh = stacked["lstm"]["w_hh"]  # (G, h, 4h)
    g, in_dim, _ = emb_w.shape
    h = w_hh.shape[1]

    # per-gen fused gate weights (embedding has no nonlinearity before the
    # LSTM, common_modules.py:118-119 — algebraic fold, see models/common.py)
    wi = jnp.einsum("gie,geh->gih", emb_w, w_ih)  # (G, in, 4h)
    bc = (
        jnp.einsum("ge,geh->gh", emb_b, w_ih)
        + stacked["lstm"]["b_ih"]
        + stacked["lstm"]["b_hh"]
    )  # (G, 4h)

    def pack_gates(w, rows):  # (G, rows, 4h) -> (G*rows, 4*G*h) block-diag
        out = jnp.zeros((g, rows, 4, g, h), w.dtype)
        src = w.reshape(g, rows, 4, h)  # gate order i,f,g,o
        idx = jnp.arange(g)
        out = out.at[idx, :, :, idx, :].set(src)
        return out.reshape(g * rows, 4 * g * h)

    w_emb = pack_gates(wi, in_dim)
    w_hh_p = pack_gates(w_hh, h)
    b = jnp.moveaxis(bc.reshape(g, 4, h), 1, 0).reshape(4 * g * h)

    w1 = stacked["hidden2pos"]["lin0"]["w"]  # (G, H+F, hid)
    w1h = w1[:, :h]  # (G, H, hid)
    hid = w1h.shape[-1]
    idx = jnp.arange(g)
    w1_p = jnp.zeros((g, h, g, hid), w1h.dtype).at[idx, :, idx, :].set(w1h)
    w1_p = w1_p.reshape(g * h, g * hid)

    w2 = stacked["hidden2pos"]["lin1"]["w"]  # (G, hid, 2)
    w2_p = jnp.zeros((g, hid, g, 2), w2.dtype).at[idx, :, idx, :].set(w2)
    w2_p = w2_p.reshape(g * hid, g * 2)
    b2 = stacked["hidden2pos"]["lin1"]["b"].reshape(g * 2)
    return w_emb, w_hh_p, b, w1_p, w2_p, b2


def _decoder_kernel(
    wemb_ref, whh_ref, b_ref, w1_ref, w2_ref, b2_ref,
    h0_ref, socb_ref, xy0_ref, dxdy0_ref,
    out_ref,
    *, num_gens: int, pred_len: int, inp_format: str, h_dim: int,
    compute_dtype,
):
    g = num_gens
    gh = g * h_dim
    f32 = jnp.float32
    cd = compute_dtype or f32

    wemb = wemb_ref[:].astype(cd)
    whh = whh_ref[:].astype(cd)
    b = b_ref[:]
    w1 = w1_ref[:].astype(cd)
    w2 = w2_ref[:]
    b2 = b2_ref[:]
    socb = socb_ref[:]

    # broadcast the shared seed position to every generator's lane block
    xy = jnp.concatenate([xy0_ref[:]] * g, axis=-1)  # (T, G*2)
    dxdy = jnp.concatenate([dxdy0_ref[:]] * g, axis=-1)
    h = jnp.concatenate([h0_ref[:]] * g, axis=-1).astype(cd)  # (T, G*H)
    c = jnp.zeros_like(h, dtype=f32)

    steps = []
    for _ in range(pred_len):
        if inp_format == "rel":
            to_embed = dxdy
        elif inp_format == "abs":
            to_embed = xy
        else:
            # (T, G*4): per-gen [x y dx dy] blocks
            t = xy.shape[0]
            to_embed = jnp.concatenate(
                [xy.reshape(t, g, 2), dxdy.reshape(t, g, 2)], axis=-1
            ).reshape(t, g * 4)
        gates = (
            jnp.dot(to_embed.astype(cd), wemb, preferred_element_type=f32)
            + jnp.dot(h, whh, preferred_element_type=f32)
            + b
        )  # (T, 4*G*H), gate-type-major: full-lane slices below
        i = jax.nn.sigmoid(gates[:, :gh])
        f = jax.nn.sigmoid(gates[:, gh : 2 * gh])
        gg = jnp.tanh(gates[:, 2 * gh : 3 * gh])
        o = jax.nn.sigmoid(gates[:, 3 * gh :])
        c = f * c + i * gg
        h = (o * jnp.tanh(c)).astype(cd)
        hid = jnp.dot(h, w1, preferred_element_type=f32) + socb
        hid = jnp.where(hid > 0, hid, 0.01 * hid)  # LeakyReLU(0.01)
        nd = jnp.dot(hid.astype(cd), w2, preferred_element_type=f32) + b2
        xy = xy + nd
        dxdy = nd
        steps.append(xy)
        steps.append(nd)
    # one wide store: (T, pred_len * 2 * G*2)
    out_ref[:] = jnp.concatenate(steps, axis=-1)


def _decode_impl(stacked, last_xy, last_dxdy, social_feats, h0, pred_len,
                 inp_format, compute_dtype=None, interpret=False):
    n, h_dim = h0.shape
    num_gens = stacked["lstm"]["w_hh"].shape[0]
    w_emb, w_hh, b, w1, w2, b2 = _packed_weights(stacked, inp_format)

    # social contribution is constant over steps; pack gen-major on lanes
    w1s = stacked["hidden2pos"]["lin0"]["w"][:, h_dim:]  # (G, F, hid)
    b1 = stacked["hidden2pos"]["lin0"]["b"]  # (G, hid)
    socb = jnp.einsum("nf,gfh->ngh", social_feats, w1s) + b1[None]
    socb = socb.reshape(n, -1)  # (N, G*hid)

    pad = (-n) % ROW_TILE
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
        h0, last_xy, last_dxdy, socb = (
            padf(h0), padf(last_xy), padf(last_dxdy), padf(socb)
        )
    n_padded = n + pad

    kernel = functools.partial(
        _decoder_kernel,
        num_gens=num_gens,
        pred_len=pred_len,
        inp_format=inp_format,
        h_dim=h_dim,
        compute_dtype=compute_dtype,
    )
    grid = (n_padded // ROW_TILE,)
    ghid = socb.shape[1]
    out_cols = pred_len * 2 * num_gens * 2
    wspec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            wspec(w_emb), wspec(w_hh), wspec(b), wspec(w1), wspec(w2),
            wspec(b2),
            pl.BlockSpec((ROW_TILE, h_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, ghid), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, out_cols), jnp.float32),
        interpret=interpret or INTERPRET,
    )(w_emb, w_hh, b, w1, w2, b2, h0, socb, last_xy, last_dxdy)

    # (N, pred, 2, G, 2): axis 2 is [abs, rel]
    out = out[:n].reshape(n, pred_len, 2, num_gens, 2)
    out = jnp.moveaxis(out, 3, 0)  # (G, N, pred, 2, 2)
    return out[..., 0, :], out[..., 1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def pallas_decode_all(stacked, last_xy, last_dxdy, social_feats, h0,
                      pred_len, inp_format):
    """Drop-in replacement for ``stacked_decoders_apply``.

    Forward runs the fused Pallas kernel; backward recomputes through the
    XLA scan path (models/common.py::stacked_decoders_apply), so the op is
    differentiable. Returns (abs, rel): each (G, N, pred_len, 2).
    """
    return _decode_impl(stacked, last_xy, last_dxdy, social_feats, h0,
                        pred_len, inp_format)


def _fwd(stacked, last_xy, last_dxdy, social_feats, h0, pred_len, inp_format):
    out = pallas_decode_all(stacked, last_xy, last_dxdy, social_feats, h0,
                            pred_len, inp_format)
    return out, (stacked, last_xy, last_dxdy, social_feats, h0)


def _bwd(pred_len, inp_format, residuals, g):
    from mggan_tpu.models.common import stacked_decoders_apply

    stacked, last_xy, last_dxdy, social_feats, h0 = residuals
    _, vjp = jax.vjp(
        lambda *a: stacked_decoders_apply(*a, pred_len, inp_format),
        stacked, last_xy, last_dxdy, social_feats, h0,
    )
    return vjp(g)


pallas_decode_all.defvjp(_fwd, _bwd)


def pallas_decode_all_interpret(stacked, last_xy, last_dxdy, social_feats,
                                h0, pred_len, inp_format):
    """Interpreter-mode twin for CPU tests."""
    return _decode_impl(stacked, last_xy, last_dxdy, social_feats, h0,
                        pred_len, inp_format, interpret=True)
