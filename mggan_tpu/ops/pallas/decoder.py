"""Pallas TPU kernel: fused multi-generator autoregressive decoder.

The hottest op in the framework is the 12-step rollout of N generator
decoders over (samples x scenes x peds) rows (reference: Python loop over
``self.gs`` of per-step cuDNN LSTM calls, standard.py:255-261 +
common_modules.py:112-128).

This kernel runs the ENTIRE rollout for ALL generators in one
``pallas_call``:

* all per-generator weights live in VMEM for the whole kernel (they are a
  few KB each — far below the ~16 MB VMEM budget);
* row inputs (initial hidden state, social contribution, seed positions)
  are read from HBM ONCE per row-tile and reused by every generator,
  instead of once per generator;
* the recurrent carry (h, c, xy, dxdy) never leaves VMEM between steps;
* each step is one MXU matmul of the pre-fused gate weights
  ``[to_embed, h] @ W_comb`` (see models/common.py for the algebraic
  fusion) plus the two small hidden2pos matmuls.

The kernel is inference-only (no custom VJP yet); training uses the XLA
scan path, which autodiffs. Equivalence with the XLA path is tested in
interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 512


def _fuse_weights(stacked, inp_format: str):
    """Per-generator algebraic fusion (same as models/common.py):
    W_comb (G, in+h, 4h), b_comb (G, 4h)."""
    emb_w = stacked["spatial_embedding"]["w"]  # (G, in, emb)
    emb_b = stacked["spatial_embedding"]["b"]  # (G, emb)
    w_ih = stacked["lstm"]["w_ih"]  # (G, emb, 4h)
    w_hh = stacked["lstm"]["w_hh"]  # (G, h, 4h)
    w_comb = jnp.concatenate([jnp.einsum("gie,geh->gih", emb_w, w_ih), w_hh], 1)
    b_comb = (
        jnp.einsum("ge,geh->gh", emb_b, w_ih)
        + stacked["lstm"]["b_ih"]
        + stacked["lstm"]["b_hh"]
    )
    return w_comb, b_comb


def _decoder_kernel(
    wcomb_ref, bcomb_ref, w1h_ref, w2_ref, b2_ref,
    h0_ref, socb_ref, xy0_ref, dxdy0_ref,
    out_ref, acc_ref,
    *, num_gens: int, pred_len: int, inp_format: str, h_dim: int,
):
    h0 = h0_ref[:]
    xy0 = xy0_ref[:]
    dxdy0 = dxdy0_ref[:]
    f32 = jnp.float32
    in_dim = wcomb_ref.shape[1] - h_dim

    for g in range(num_gens):
        # split gate weights: avoids a per-step concat of [to_embed, h]
        wc_in = wcomb_ref[g, :in_dim]
        wc_h = wcomb_ref[g, in_dim:]
        bc = bcomb_ref[g]
        w1h = w1h_ref[g]
        w2 = w2_ref[g]
        b2 = b2_ref[g]
        socb = socb_ref[g]
        h, c, xy, dxdy = h0, jnp.zeros_like(h0), xy0, dxdy0
        for t in range(pred_len):
            if inp_format == "rel":
                to_embed = dxdy
            elif inp_format == "abs":
                to_embed = xy
            else:
                to_embed = jnp.concatenate([xy, dxdy], axis=-1)
            gates = (
                jnp.dot(to_embed, wc_in, preferred_element_type=f32)
                + jnp.dot(h, wc_h, preferred_element_type=f32)
                + bc
            )
            i = jax.nn.sigmoid(gates[:, :h_dim])
            f = jax.nn.sigmoid(gates[:, h_dim : 2 * h_dim])
            gg = jnp.tanh(gates[:, 2 * h_dim : 3 * h_dim])
            o = jax.nn.sigmoid(gates[:, 3 * h_dim :])
            c = f * c + i * gg
            h = o * jnp.tanh(c)
            hid = jnp.dot(h, w1h, preferred_element_type=f32) + socb
            hid = jnp.where(hid > 0, hid, 0.01 * hid)  # LeakyReLU(0.01)
            nd = jnp.dot(hid, w2, preferred_element_type=f32) + b2
            xy = xy + nd
            dxdy = nd
            # accumulate in VMEM scratch; one contiguous store per generator
            acc_ref[:, 4 * t : 4 * t + 2] = xy
            acc_ref[:, 4 * t + 2 : 4 * t + 4] = nd
        out_ref[g] = acc_ref[:]


def pallas_decode_all(stacked, last_xy, last_dxdy, social_feats, h0,
                      pred_len: int, inp_format: str, interpret: bool = False):
    """Drop-in replacement for ``stacked_decoders_apply`` (inference only).

    Args:
        stacked: stacked decoder params (leading axis G).
        last_xy/last_dxdy: (N, 2); social_feats: (N, F); h0: (N, H).

    Returns:
        (abs, rel): each (G, N, pred_len, 2).
    """
    n, h_dim = h0.shape
    num_gens = stacked["lstm"]["w_hh"].shape[0]
    w_comb, b_comb = _fuse_weights(stacked, inp_format)
    w1 = stacked["hidden2pos"]["lin0"]["w"]  # (G, H+F, hid)
    w1h = w1[:, :h_dim]
    w1s = w1[:, h_dim:]
    b1 = stacked["hidden2pos"]["lin0"]["b"]
    w2 = stacked["hidden2pos"]["lin1"]["w"]
    b2 = stacked["hidden2pos"]["lin1"]["b"]

    # social contribution differs per generator only through w1s; the
    # reference shares social feats across gens, so fold per-gen here:
    # socb (G, N, hid). To keep row-tile reuse, precompute per-gen outside.
    socb = jnp.einsum("nf,gfh->gnh", social_feats, w1s) + b1[:, None, :]

    pad = (-n) % ROW_TILE
    if pad:
        padf = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        h0, last_xy, last_dxdy = padf(h0), padf(last_xy), padf(last_dxdy)
        socb = jnp.pad(socb, ((0, 0), (0, pad), (0, 0)))
    n_padded = n + pad

    kernel = functools.partial(
        _decoder_kernel,
        num_gens=num_gens,
        pred_len=pred_len,
        inp_format=inp_format,
        h_dim=h_dim,
    )
    grid = (n_padded // ROW_TILE,)
    hid = w2.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(w_comb.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b_comb.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1h.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, h_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_gens, ROW_TILE, hid), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((ROW_TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_gens, ROW_TILE, pred_len * 4), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_gens, n_padded, pred_len * 4), jnp.float32
        ),
        scratch_shapes=[pltpu.VMEM((ROW_TILE, pred_len * 4), jnp.float32)],
        interpret=interpret,
    )(w_comb, b_comb, w1h, w2, b2, h0, socb, last_xy, last_dxdy)

    out = out[:, :n].reshape(num_gens, n, pred_len, 4)
    return out[..., :2], out[..., 2:]
