"""Probe: does JAX's persistent compilation cache work through the axon
remote-TPU tunnel?

tests/test_compilation_cache.py proves populate + cross-process hit on CPU;
this runs the same experiment on the real chip (default backend), where
compiles go through a remote-compile service. Two sequential child
processes share one cache dir and time the first call of an identical
jitted program; session init (a trivial jit) is timed separately so the
program compile is attributed honestly.

Usage: python benchmarks/axon_cache_probe.py [cache_dir] [--train]
Prints one JSON verdict line. With --train the probed program is the REAL
fused D+G+PM train step including both Pallas decoder kernels (bench.py
shapes) — the case the round-3 note guessed was unsupported through the
remote-compile service.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

CHILD = """
import json, os, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, %(repo)r)
from mggan_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache(sys.argv[1])

t0 = time.perf_counter()
float(jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((128, 128))))
session_s = time.perf_counter() - t0

if "--train" in sys.argv:
    import bench
    t0 = time.perf_counter()
    _, compile_s, _ = bench.bench_train_step()
else:
    def f(x):
        for i in range(6):
            x = jnp.tanh(x @ jnp.full((512, 512), 0.01, x.dtype)) + x * (i + 1)
        return x.sum()

    t0 = time.perf_counter()
    out = float(jax.jit(f)(jnp.ones((512, 512))))
    compile_s = time.perf_counter() - t0
print("PROBE " + json.dumps({
    "backend": jax.default_backend(),
    "session_init_s": round(session_s, 2),
    "program_first_call_s": round(compile_s, 3),
    "cache_files": len(os.listdir(sys.argv[1])),
}))
"""


def run_child(cache_dir: str, extra=()) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": repo}, cache_dir, *extra],
        capture_output=True, text=True, timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE "):
            return json.loads(line[len("PROBE "):])
    raise RuntimeError(f"child failed:\n{r.stdout}\n{r.stderr}")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    extra = tuple(a for a in sys.argv[1:] if a.startswith("--"))
    cache_dir = pos[0] if pos else tempfile.mkdtemp(prefix="axon_cache_probe_")
    cold = run_child(cache_dir, extra)
    warm = run_child(cache_dir, extra)
    hit = (
        warm["cache_files"] > 0
        and warm["program_first_call_s"] < 0.5 * cold["program_first_call_s"]
    )
    print(json.dumps({
        "cache_dir": cache_dir,
        "cold": cold,
        "warm": warm,
        "second_process_hit": hit,
    }))


if __name__ == "__main__":
    main()
