"""Pallas fused decoder vs XLA scan on the real TPU chip.

Run: python benchmarks/pallas_decoder_bench.py
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from mggan_tpu.models import common
from mggan_tpu.ops.pallas.decoder import pallas_decode_all


def bench(fn, args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    G, EMB, H, F = 4, 16, 32, 32
    key = jax.random.PRNGKey(0)
    stacked = common.stacked_decoders_init(key, G, EMB, H, "rel", F)
    for n in (163840, 1310720):
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        xy = jax.random.normal(ks[0], (n, 2))
        dxdy = jax.random.normal(ks[1], (n, 2))
        soc = jax.random.normal(ks[2], (n, F))
        h0 = jax.random.normal(ks[3], (n, H))
        args = (stacked, xy, dxdy, soc, h0)

        scan = jax.jit(lambda *a: common.stacked_decoders_apply(*a, 12, "rel"))
        plk = jax.jit(lambda *a: pallas_decode_all(*a, 12, "rel"))
        t_scan = bench(scan, args)
        t_pl = bench(plk, args)
        print(f"N={n}: scan {t_scan*1e3:.2f} ms | pallas {t_pl*1e3:.2f} ms "
              f"| speedup {t_scan/t_pl:.2f}x")


if __name__ == "__main__":
    main()
