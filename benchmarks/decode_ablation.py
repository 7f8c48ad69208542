"""Decode-select kernel ablations at the sampling flagship shape (1.31M
rows): attribute the ~58 ms decode stage (BASELINE.md r3 breakdown) to VPU
transcendentals vs everything else, and A/B bf16 activations.

Variants (defined here, NOT shipped — only `prod` is the real kernel):
  prod     — ops/pallas/decoder.py::pallas_decode_select as shipped
  bf16act  — gate activations computed in bf16 (sigmoid/tanh on bf16
             registers pack 2 lanes/word; diagnostic for a possible 2x
             VPU-rate win; numerics would need a tolerance review)
  linact   — sigmoid/tanh replaced by linear stand-ins (WRONG numerics;
             pure diagnostic upper bound for "what if activations were
             free")

Run: python benchmarks/decode_ablation.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mggan_tpu.ops.pallas import decoder as dec

N = 1_310_720  # 4096 scenes x 16 peds x K=20
G, H, EMB, F, T = 4, 32, 16, 32, 12
TILE = dec.ROW_TILE


def variant_kernel(act):
    """A copy of _fwd_select_kernel's recurrence with pluggable activations.
    act: 'f32' (mirrors prod), 'bf16', or 'lin'."""

    def kernel(wemb_ref, whh_ref, b_ref, w1_ref, w2_ref, b2_ref,
               h0_ref, socb_ref, xy0_ref, dxdy0_ref, oh2_ref, out_ref,
               num_gens: int, pred_len: int, h_dim: int):
        g = num_gens
        gh = g * h_dim
        f32 = jnp.float32

        if act == "bf16":
            # jax.nn.sigmoid/jnp.tanh on bf16 vectors trip a Mosaic
            # verifier bug (f32 scalar const broadcast into a bf16
            # vector), so spell the activations out with ones_like
            # constants that inherit the vector dtype.
            def sig(x):
                e = jnp.exp(-x.astype(jnp.bfloat16))
                one = jnp.ones_like(e)
                return (one / (one + e)).astype(f32)

            def tnh(x):
                xb = x.astype(jnp.bfloat16)
                e = jnp.exp(xb + xb)
                one = jnp.ones_like(e)
                return ((e - one) / (e + one)).astype(f32)
        elif act == "lin":
            def sig(x):
                return x * 0.25 + 0.5

            def tnh(x):
                return x * 0.5
        else:
            sig, tnh = jax.nn.sigmoid, jnp.tanh

        wemb = wemb_ref[:]
        whh = whh_ref[:]
        b = b_ref[:]
        w1 = w1_ref[:]
        w2 = w2_ref[:]
        b2 = b2_ref[:]
        socb = socb_ref[:]
        oh2 = oh2_ref[:]

        xy = jnp.concatenate([xy0_ref[:]] * g, axis=-1)
        dxdy = jnp.concatenate([dxdy0_ref[:]] * g, axis=-1)
        h = jnp.concatenate([h0_ref[:]] * g, axis=-1)
        c = jnp.zeros_like(h, dtype=f32)

        steps = []
        for _ in range(pred_len):
            te = dxdy  # rel input format
            gates = (
                jnp.dot(te, wemb, preferred_element_type=f32)
                + jnp.dot(h, whh, preferred_element_type=f32)
                + b
            )
            i = sig(gates[:, :gh])
            f = sig(gates[:, gh: 2 * gh])
            gg = tnh(gates[:, 2 * gh: 3 * gh])
            o = sig(gates[:, 3 * gh:])
            c = f * c + i * gg
            h = o * tnh(c)
            hid = jnp.dot(h, w1, preferred_element_type=f32) + socb
            hid = jnp.where(hid > 0, hid, 0.01 * hid)
            nd = jnp.dot(hid, w2, preferred_element_type=f32) + b2
            xy = xy + nd
            dxdy = nd
            steps.append(dec._sum_gen_blocks(oh2 * xy, g, 2))
            steps.append(dec._sum_gen_blocks(oh2 * nd, g, 2))
        out_ref[:] = jnp.concatenate(steps, axis=-1)

    return kernel


def run_variant(act, packed_inputs):
    w_emb, w_hh, b, w1, w2, b2, socb, h0, xy, dxdy, oh2 = packed_inputs
    n = h0.shape[0]
    kernel = functools.partial(
        variant_kernel(act), num_gens=G, pred_len=T, h_dim=H
    )
    ghid = socb.shape[1]
    out_cols = T * 4
    wspec = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM
    )
    rowspec = lambda cols: pl.BlockSpec(
        (TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n // TILE,),
        in_specs=[
            wspec(w_emb), wspec(w_hh), wspec(b), wspec(w1), wspec(w2),
            wspec(b2), rowspec(H), rowspec(ghid), rowspec(2), rowspec(2),
            rowspec(2 * G),
        ],
        out_specs=rowspec(out_cols),
        out_shape=jax.ShapeDtypeStruct((n, out_cols), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(w_emb, w_hh, b, w1, w2, b2, h0, socb, xy, dxdy, oh2)


def main():
    from mggan_tpu.models import common

    key = jax.random.PRNGKey(0)
    stacked = common.stacked_decoders_init(key, G, EMB, H, "rel", F)
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    xy = jax.random.normal(ks[0], (N, 2))
    dxdy = jax.random.normal(ks[1], (N, 2)) * 0.1
    soc = jax.random.normal(ks[2], (N, F))
    h0 = jax.random.normal(ks[3], (N, H))
    idx = jax.random.randint(ks[4], (N,), 0, G)
    onehot = jax.nn.one_hot(idx, G, dtype=jnp.float32)

    results = {}

    def timeit(name, fn, *args):
        out = fn(*args)
        float(jnp.asarray(out).sum())  # compile + tunnel-safe fence
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*args)
            float(jnp.asarray(out).sum())
            best = min(best, (time.perf_counter() - t0) / 5)
        results[name] = round(best * 1e3, 2)
        print(name, results[name], "ms", flush=True)

    # prod path (includes _pack_all on every call, like the sampling jit)
    prod = jax.jit(
        lambda st, x, d, s, h, oh: dec.pallas_decode_select(
            st, x, d, s, h, oh, T, "rel"
        )[0].sum()
    )
    timeit("prod_select", prod, stacked, xy, dxdy, soc, h0, onehot)

    # variants share pre-packed inputs (packing excluded from their timing
    # is fine: XLA overlaps it; prod shows the fused total anyway)
    packed = dec._pack_all(stacked, soc, "rel")
    w_emb, w_hh, b, w1, w2, b2, socb = packed
    oh2 = jnp.repeat(onehot, 2, axis=-1)
    inputs = tuple(
        jax.device_put(x)
        for x in (w_emb, w_hh, b, w1, w2, b2, socb, h0, xy, dxdy, oh2)
    )
    for act in ("f32", "bf16", "lin"):
        timeit(f"kernel_{act}", jax.jit(lambda *a, _act=act: run_variant(_act, a).sum()), *inputs)

    print("DECODEABL " + json.dumps(results))


if __name__ == "__main__":
    main()
