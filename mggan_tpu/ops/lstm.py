"""LSTM cells as ``lax.scan`` bodies with fused gate matmuls.

The reference runs cuDNN LSTMs over 7/8 observation steps and a 12-step
Python-loop autoregressive decode (``common_modules.py:44-66,112-128``).
On TPU both become a single fused gate matmul per step inside ``lax.scan``:
``x @ W_ih + h @ W_hh + b`` produces all four gates at once, which XLA maps
onto one MXU pass; the scan carry holds ``(h, c)``.

Gate order is PyTorch's ``(i, f, g, o)`` and weights are stored transposed
as ``(in, 4h)`` / ``(h, 4h)``, so released torch checkpoints convert by a
single transpose (see ``models/torch_import.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def lstm_init(key, input_size: int, hidden_size: int, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(hidden_size)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (input_size, 4 * hidden_size)),
        "w_hh": u(ks[1], (hidden_size, 4 * hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm_cell(params, x, h, c):
    """One LSTM step. x: (..., in), h/c: (..., hidden)."""
    gates = x @ params["w_ih"] + h @ params["w_hh"] + params["b_ih"] + params["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(params, xs, h0=None, c0=None):
    """Run an LSTM over the leading time axis.

    TPU optimisation: the input contribution ``x @ W_ih + b`` for ALL
    timesteps is one big (T*N, in)x(in, 4h) MXU matmul hoisted out of the
    scan; the recurrent step only does ``h @ W_hh`` + pointwise gates.

    Args:
        xs: (T, N, in) time-major inputs.
        h0/c0: optional (N, hidden) initial state (defaults zero, matching
            torch's ``nn.LSTM`` when no state is passed).

    Returns:
        (hs, (h_T, c_T)) where hs is (T, N, hidden).
    """
    n = xs.shape[1]
    hidden = params["w_hh"].shape[0]
    dtype = xs.dtype
    if h0 is None:
        h0 = jnp.zeros((n, hidden), dtype)
    if c0 is None:
        c0 = jnp.zeros((n, hidden), dtype)

    x_gates = xs @ params["w_ih"] + (params["b_ih"] + params["b_hh"])

    def step(carry, xg):
        h, c = carry
        gates = xg + h @ params["w_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    (h_t, c_t), hs = jax.lax.scan(step, (h0, c0), x_gates)
    return hs, (h_t, c_t)
