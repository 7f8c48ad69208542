"""Piece-wise timing of the sorted-by-generator decode_select ablation
(ops/pallas/decoder.py::pallas_decode_select_sorted — a measured NEGATIVE
result, see its docstring): the single-generator kernel vs the XLA
permutation costs around it (index math, row gather, output gather),
plus the standalone costs of the index-building primitives
(bincount / cumsum-of-one-hot / scatter / argsort) at 1.31M rows.

r3 numbers (single v5e, forced value-fetch sync): bincount 17.6,
cumsum_oh 21.2, scatter_inv 11.7, argsort 8.9, row_gather68 22.7,
kernel_only 41.3, out_gather 109.2 ms — vs 63 ms for the whole
lane-packed pallas_decode_select. Run: python benchmarks/sorted_select_ablation.py
"""

import sys, time, json, functools, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from mggan_tpu.ops.pallas import decoder as dec
from mggan_tpu.models import common

N = 1_310_720
G, H, EMB, F, T = 4, 32, 16, 32, 12
tile = dec.ROW_TILE
i32, f32 = jnp.int32, jnp.float32
key = jax.random.PRNGKey(0)
stacked = common.stacked_decoders_init(key, G, EMB, H, 'rel', F)
ks = jax.random.split(jax.random.PRNGKey(1), 6)
xy = jax.random.normal(ks[0], (N, 2))
dxdy = jax.random.normal(ks[1], (N, 2)) * 0.1
soc = jax.random.normal(ks[2], (N, F))
h0 = jax.random.normal(ks[3], (N, H))
idx = jax.random.randint(ks[4], (N,), 0, G).astype(i32)

results = {}
def timeit(name, fn, *args):
    try:
        out = fn(*args)
        jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*args)
            jax.tree.map(lambda x: float(jnp.asarray(x).sum()), out)
            best = min(best, (time.perf_counter() - t0) / 5)
        results[name] = round(best * 1e3, 2)
        print(name, results[name], 'ms', flush=True)
    except Exception as e:
        print(name, 'FAILED', str(e)[:200], flush=True)

n_buf = ((N + tile - 1) // tile) * tile + G * tile

# pieces of the index prologue
timeit('bincount', jax.jit(lambda gi: jnp.bincount(gi, length=G).sum()), idx)
timeit('cumsum_oh', jax.jit(lambda gi: jnp.take_along_axis(jnp.cumsum(jax.nn.one_hot(gi, G, dtype=i32), axis=0), gi[:, None], 1).sum()), idx)
timeit('scatter_inv', jax.jit(lambda d: jnp.full((n_buf,), N, i32).at[d].set(jnp.arange(N, dtype=i32)).sum()), jnp.arange(N, dtype=i32) * 1)
timeit('argsort', jax.jit(lambda gi: jnp.argsort(gi).sum()), idx)

# row gather at the real width
rows = jnp.concatenate([h0, soc, xy, dxdy], -1)
inv_dummy = jnp.arange(n_buf, dtype=i32) % N
timeit('row_gather68', jax.jit(lambda r, iv: r[iv].sum()), rows, inv_dummy)

# kernel alone on pre-permuted inputs (all passed as args)
emb_w = stacked['spatial_embedding']['w']; emb_b = stacked['spatial_embedding']['b']
w_ih = stacked['lstm']['w_ih']; w_hh_s = stacked['lstm']['w_hh']
wemb = jnp.einsum('gie,geh->gih', emb_w, w_ih)
b = (jnp.einsum('ge,geh->gh', emb_b, w_ih) + stacked['lstm']['b_ih'] + stacked['lstm']['b_hh'])[:, None, :]
w1 = stacked['hidden2pos']['lin0']['w']; b1 = stacked['hidden2pos']['lin0']['b'][:, None, :]
w2 = stacked['hidden2pos']['lin1']['w']; b2 = stacked['hidden2pos']['lin1']['b'][:, None, :]
num_tiles = n_buf // tile
tile_gen = (jnp.arange(num_tiles, dtype=i32) * G // num_tiles)
h0b = jnp.pad(h0, ((0, n_buf - N), (0, 0))); socb = jnp.pad(soc, ((0, n_buf - N), (0, 0)))
xyb = jnp.pad(xy, ((0, n_buf - N), (0, 0))); dxdyb = jnp.pad(dxdy, ((0, n_buf - N), (0, 0)))

def kernel_only(tile_gen, wemb, w_hh_s, b, w1, b1, w2, b2, h0b, socb, xyb, dxdyb):
    kernel = functools.partial(dec._fwd_sorted_kernel, pred_len=T, inp_format='rel', h_dim=H, has_soc=True, compute_dtype=None)
    gspec = lambda a: pl.BlockSpec((1,) + a.shape[1:], (lambda i, tg: (tg[i],) + (0,) * (a.ndim - 1)), memory_space=pltpu.VMEM)
    rowspec = lambda cols: pl.BlockSpec((tile, cols), lambda i, tg: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(num_scalar_prefetch=1, grid=(num_tiles,),
            in_specs=[gspec(wemb), gspec(w_hh_s), gspec(b), gspec(w1), gspec(b1), gspec(w2), gspec(b2), rowspec(H), rowspec(F), rowspec(2), rowspec(2)],
            out_specs=rowspec(T*4)),
        out_shape=jax.ShapeDtypeStruct((n_buf, T*4), f32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(tile_gen, wemb, w_hh_s, b, w1, b1, w2, b2, h0b, socb, xyb, dxdyb)
    return out.sum()
timeit('kernel_only', jax.jit(kernel_only), tile_gen, wemb, w_hh_s, b, w1, b1, w2, b2, h0b, socb, xyb, dxdyb)

outbuf = jnp.zeros((n_buf, T*4))
timeit('out_gather', jax.jit(lambda ob, d: ob[d].sum()), outbuf, jnp.arange(N, dtype=i32))
print('SORTEDPARTS ' + json.dumps(results))
