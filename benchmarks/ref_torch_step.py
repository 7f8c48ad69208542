"""Time the REFERENCE's torch train step on CPU — the BASELINE.md throughput
denominator ("≥10× reference training throughput per chip").

Drives the reference's own ``PiNetMultiGeneratorGAN`` steps
(/root/reference/mggan/abstract_train.py:109-166 per-batch body:
discriminator_step + generator_step + net_chooser_step) on a synthetic batch
shaped like the flagship bench config (mgan, 4 generators, ml weighting,
h_dim=decoder_h_dim=32, scenes of 16 peds).

Caveat (documented in BASELINE.md): the reference targets a CUDA 10.2-era
GPU; this environment has no NVIDIA GPU, so the denominator is torch CPU.
The measured number is recorded in ``benchmarks/ref_torch_cpu.json`` and
consumed by ``bench.py`` — rerun this script only when the bench config
changes:

    python benchmarks/ref_torch_step.py [--agents 4096] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
import types
from collections import defaultdict
from pathlib import Path


def _stub_test_tube():
    """The reference imports test_tube (not installed here) for the
    Experiment logger and HyperOptArgumentParser; neither affects step
    timing, so provide minimal stand-ins before importing mggan."""
    import argparse as ap

    mod = types.ModuleType("test_tube")

    class Experiment:  # only __init__-time surface is touched
        def __init__(self, *a, **k):
            self.name, self.version = "bench", 0

        def get_data_path(self, name, version):
            return tempfile.mkdtemp(prefix="ref_bench_")

    class HyperOptArgumentParser(ap.ArgumentParser):
        def __init__(self, *a, strategy=None, **k):
            super().__init__(*a, **k)

        def opt_list(self, *args, options=None, tunable=None, **kwargs):
            return self.add_argument(*args, **kwargs)

    mod.Experiment = Experiment
    mod.HyperOptArgumentParser = HyperOptArgumentParser
    sys.modules["test_tube"] = mod

    # shapely is only used by the reference's manifold plotting, pulled in
    # transitively via mggan.evaluation; stub the two imported names.
    shp = types.ModuleType("shapely")
    geom = types.ModuleType("shapely.geometry")
    geom.Polygon = object
    geom.MultiPolygon = object
    ops = types.ModuleType("shapely.ops")
    ops.unary_union = lambda *a, **k: None
    shp.geometry, shp.ops = geom, ops
    shp.__path__ = []  # mark as package so submodule imports resolve
    sys.modules.setdefault("shapely", shp)
    sys.modules.setdefault("shapely.geometry", geom)
    sys.modules.setdefault("shapely.ops", ops)
    return mod


def main():
    cli = argparse.ArgumentParser()
    # 64 agents is the largest size that keeps one reference iteration under
    # ~6 min on CPU: generator_step's backward zero-fills the full
    # (K*N, 32, 33, 33) scene-CNN activation gradient once per autograd
    # select node (~5.4k aten::fill_ calls, 228s of 335s at n=64 — measured
    # with torch.profiler), a CUDA-era design cost that scales ~O(n^2) on
    # host memory bandwidth.
    cli.add_argument("--agents", type=int, default=64)
    cli.add_argument("--peds_per_scene", type=int, default=16)
    cli.add_argument("--iters", type=int, default=1)
    cli.add_argument("--out", type=str,
                     default=str(Path(__file__).parent / "ref_torch_cpu.json"))
    args = cli.parse_args()

    _stub_test_tube()
    sys.path.insert(0, "/root/reference")
    import torch

    from mggan.model.config import get_parser
    from mggan.model.model_factory import construct_model
    from mggan.model.train import PiNetMultiGeneratorGAN

    config = get_parser().parse_args(
        [
            "--gpus", "",  # falsy -> CPU (abstract_train.py:29)
            "--gan_type", "mgan",
            "--weighting_target", "ml",
            "--num_gens", "4",
            "--h_dim", "32",
            "--decoder_h_dim", "32",
        ]
    )
    G, D = construct_model(config)
    writer = sys.modules["test_tube"].Experiment()
    trainer = PiNetMultiGeneratorGAN(G, D, config, writer)

    n = args.agents
    p = args.peds_per_scene
    assert n % p == 0
    torch.manual_seed(0)
    obs = torch.cumsum(torch.randn(20, n, 2) * 0.1, dim=0)
    in_xy, gt_xy = obs[:8], obs[8:]
    in_dxdy = in_xy[1:] - in_xy[:-1]
    gt_dxdy = torch.cat([gt_xy[:1] - in_xy[-1:], gt_xy[1:] - gt_xy[:-1]])
    sub_batches = [(i, i + p) for i in range(0, n, p)]
    loss_mask = torch.ones(n, dtype=torch.bool)
    img = torch.rand(n, 4, 33, 33) * 2 - 1

    phase_s = {"d_step": 0.0, "g_step": 0.0, "pm_step": 0.0}

    def one_iteration():
        metrics = defaultdict(list)
        for name, fn in (
            ("d_step", trainer.discriminator_step),
            ("g_step", trainer.generator_step),
            ("pm_step", trainer.net_chooser_step),
        ):
            t = time.perf_counter()
            fn(in_xy, in_dxdy, gt_xy, gt_dxdy, sub_batches, metrics,
               loss_mask, img)
            phase_s[name] += time.perf_counter() - t
        return metrics

    t0 = time.perf_counter()
    for _ in range(args.iters):
        one_iteration()
    dt = (time.perf_counter() - t0) / args.iters

    result = {
        "step_seconds": round(dt, 4),
        "agents": n,
        "agents_per_sec": round(n / dt, 2),
        "phase_seconds": {k: round(v / args.iters, 4) for k, v in phase_s.items()},
        "iters": args.iters,
        "torch_threads": torch.get_num_threads(),
        "config": {
            "gan_type": "mgan", "weighting_target": "ml", "num_gens": 4,
            "h_dim": 32, "decoder_h_dim": 32,
            "num_samples": config.num_samples,
            "num_expectation_samples": config.num_expectation_samples,
        },
        "hardware": "cpu",
        "caveat": (
            "reference targets CUDA; no GPU in this environment - torch CPU "
            "denominator, all cores. ~97% of the step is generator_step's "
            "backward zero-filling (K*N,32,33,33) scene-CNN activation "
            "gradients (aten::fill_), a cost CUDA hides; treat the ratio as "
            "a CPU measurement, not a GPU claim."
        ),
    }
    Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
