"""G-step sub-attribution, single-scalar fences (per-leaf fetches cost
~25 ms each through the tunnel and wrecked the first attempt).

r3 result (ms, each standalone jit includes a ~8 ms dispatch+fence floor
— see adamw_update, ~0.1 ms of real compute): dscore_fwd 9.2,
dscore_fwdbwd 10.24, g_encode_fwdbwd 14.37, decode_all_fwdbwd 16.93,
adamw_update 8.07. Run: python benchmarks/gstep_attribution.py"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import bench
from mggan_tpu.models import factory, discriminator as D_mod, generator as G_mod
from mggan_tpu.training.steps import batch_views
from mggan_tpu.ops import sampling

S, P, K = 256, 16, 20
cfg = bench._flagship_config(batch_size=S)
g_pack, d_pack = factory.construct_model(cfg, jax.random.PRNGKey(0))
g_params, g_state, g_spec = g_pack
d_params, d_state, d_spec = d_pack
batch = bench._make_batch(S, P)
bv = batch_views(batch)
key = jax.random.PRNGKey(1)

results = {}
def timeit(name, fn, *args):
    out = fn(*args)
    float(out)
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / 5)
    results[name] = round(best * 1e3, 2)
    print(name, results[name], 'ms', flush=True)

tsum = lambda t: sum(jnp.sum(l) for l in jax.tree.leaves(t))

noise = sampling.global_noise(key, K, S, P, cfg.noise_dim)
enc_h, soc, _ = G_mod.encode(g_params, g_state, g_spec, bv.in_xy, bv.in_dxdy,
                             bv.ped_mask, bv.patches, train=True)
gen_idxs = sampling.categorical(key, G_mod.pm_logits(g_params, g_spec, enc_h), K)
pred = G_mod.decode_select(g_params, g_spec, bv.in_xy[:, :, -1],
                           bv.in_dxdy[:, :, -1], enc_h, soc, noise, gen_idxs)
pred_xy, pred_dxdy = jax.device_put((pred.abs, pred.rel))
enc_h, soc, noise = jax.device_put((enc_h, soc, noise))
future_valid = bv.ped_mask

def dscore(pxy, pdxdy):
    s, b, _ = D_mod.apply(d_params, d_state, d_spec, bv.in_xy, bv.in_dxdy,
                          pxy, pdxdy, bv.ped_mask, future_valid,
                          patches=bv.patches, train=True)
    return s.sum() + (b.sum() if b is not None else 0.0)
timeit('dscore_fwd', jax.jit(dscore), pred_xy, pred_dxdy)
timeit('dscore_fwdbwd', jax.jit(lambda a, b: tsum(jax.grad(dscore, argnums=(0, 1))(a, b))), pred_xy, pred_dxdy)

def genc(p):
    e, s, _ = G_mod.encode(p, g_state, g_spec, bv.in_xy, bv.in_dxdy,
                           bv.ped_mask, bv.patches, train=True)
    return e.sum() + s.sum()
timeit('g_encode_fwdbwd', jax.jit(lambda p: tsum(jax.grad(genc)(p))), g_params)

def dec_loss(p, eh, sc, nz):
    out = G_mod.decode_all(p, g_spec, bv.in_xy[:, :, -1], bv.in_dxdy[:, :, -1],
                           eh, sc, nz)
    return (out.abs ** 2).sum() * 1e-6
timeit('decode_all_fwdbwd', jax.jit(lambda p, eh, sc, nz: tsum(jax.grad(dec_loss)(p, eh, sc, nz))), g_params, enc_h, soc, noise)

import optax
opt = optax.adamw(1e-3)
opt_state = opt.init(g_params)
def upd(p, os):
    g = jax.tree.map(jnp.ones_like, p)
    u, os2 = opt.update(g, os, p)
    return tsum(optax.apply_updates(p, u)) + tsum(os2)
timeit('adamw_update', jax.jit(upd), g_params, opt_state)
print('GSTEPPARTS ' + json.dumps(results))
