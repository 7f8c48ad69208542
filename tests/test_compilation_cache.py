"""Persistent compilation cache wiring (utils/profiling.py::
enable_compilation_cache, --compilation_cache_dir).

The reference has no equivalent (PyTorch eager recompiles nothing); here a
warm train-step compile costs 41-56 s through the remote-compile service,
so repeat CLI runs reuse serialized executables. Runs in subprocesses so
the cache config never leaks into this (shared) test process.
"""

import os
import subprocess
import sys

SCRIPT = """
import os, sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from mggan_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache(sys.argv[1])
f = jax.jit(lambda a: (a * 2.75 + jnp.tanh(a)).sum())
print("RESULT", float(f(jnp.arange(193.0))))
print("NFILES", len(os.listdir(sys.argv[1])))
"""


def _run(cache_dir):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(cache_dir)],
        capture_output=True,
        text=True,
        env=env,
        check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout
    lines = dict(l.split() for l in out.splitlines() if l)
    return float(lines["RESULT"]), int(lines["NFILES"])


def test_cache_populates_and_second_process_hits(tmp_path):
    cache = tmp_path / "jaxcache"
    res1, n1 = _run(cache)
    assert n1 >= 1, "first process should serialize at least one executable"
    res2, n2 = _run(cache)
    # Same program, same key: the second process deserializes instead of
    # adding a new entry.
    assert n2 == n1, f"expected a cache hit, but entries grew {n1} -> {n2}"
    assert res1 == res2
