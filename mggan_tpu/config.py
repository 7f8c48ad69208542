"""Configuration surface.

Reproduces every flag of the reference CLI (``mggan/model/config.py:4-135``)
on top of a plain dataclass, so the documented training command keeps
working.  Grid sweeps (the reference's test_tube ``opt_list``) are a driver
script concern, not a parser concern.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Optional

DATASET_CHOICES = [
    "hotel",
    "eth",
    "zara1",
    "zara2",
    "univ",
    "social_stanford_synthetic",
    "stanford_synthetic",
    "stanford_synthetic_2",
    "stanford_synthetic_4",
    "stanford",
    "gofp",
    # TPU-build extra: in-memory synthetic dataset, used by tests/benchmarks.
    "synthetic_memory",
]

GAN_TYPES = ["probgan", "mgan", "infogan", "gan"]
GAN_OBJECTIVES = ["NS", "MM", "LS", "W"]
EXPERIMENTS = ["multi_generator", "discrete"]
INP_FORMATS = ["rel", "abs", "abs_rel"]
POOL_TYPES = ["sways", "sgan"]
WEIGHTING_TARGETS = ["l2", "disc_scores", "endpoint", "mgan", "ml", "none"]
L2_LOSS_TYPES = ["none", "min_z", "min_g_z", "min_g_min_z", "mse"]


@dataclass
class Config:
    """Mirror of the reference's parsed-args namespace (config.py:4-135)."""

    name: str = "test"
    log_dir: str = "./logs/"
    dataset: str = "stanford_synthetic"
    gpus: str = "0"  # kept for CLI parity; device placement is managed by JAX
    workers: int = 0
    batch_size: int = 2
    beta1: float = 0.5
    l2_loss_weight: float = 1.0
    clf_loss_weight: float = 1.0
    pi_net_loss_weight: float = 1.0
    epochs: int = 500
    clipping_threshold_d: float = 100
    clipping_threshold_g: float = 500
    num_gen_steps: int = 1
    inp_format: str = "rel"
    keep_gen_steps: int = 0
    top_k_test: int = 20
    val_every: int = 1
    save_every: int = 5
    debug: bool = False
    n_social_modules: int = 1
    g_lr: float = 1e-3
    d_lr: float = 1e-3
    sigma: float = 1.0
    gan_type: str = "mgan"
    experiment: str = "multi_generator"
    pool_type: str = "sways"
    global_disc: int = 1
    unconditional: bool = False
    augment: int = 1
    noise_dim: int = 8
    h_dim: int = 32
    decoder_h_dim: int = 32
    num_samples: int = 20
    num_expectation_samples: int = 1
    weighting_target: str = "ml"
    l2_loss_type: str = "min_g_z"
    num_gens: int = 1
    l2_decay_rate: float = 1.0
    num_unrolling_steps: int = 0
    checkpoint: Optional[str] = None
    # SGHMC extras (probgan; config.py:100-117)
    sghmc_alpha: float = 0.01
    g_noise_loss_lambda: float = 3e-2
    d_noise_loss_lambda: float = 3e-2
    d_hist_loss_lambda: float = 1.0
    gan_obj: str = "NS"

    # ---- derived / build-time fields (reference: model_factory.py:14-19) ----
    use_pinet: bool = field(default=False)
    num_gen_parameters: int = field(default=0)

    # ---- TPU-build extras (not in the reference surface) ----
    # Pad width of the ped axis; 0 = derive from the dataset's widest scene.
    max_peds: int = 0
    # Data-parallel shard count (scene axis over the ICI mesh). 1 = single chip.
    dp: int = 1
    # Generator-parallel shard count over the stacked-decoder axis.
    gp: int = 1
    # Multi-slice (DCN) shard count: scenes shard over (slice, data);
    # cross-slice gradient all-reduce rides DCN (parallel/mesh.py).
    slices: int = 1
    seed: int = 145325
    # Where dataset files live (reference hardcodes ./data/datasets/<name>).
    data_root: str = "./data/datasets"
    # Compile D/G/PM as 3 parallel-compiled programs (faster TPU startup).
    split_step: int = 0
    # Capture a jax.profiler trace of the first few train steps into this dir.
    profile_dir: str = ""
    # Keep the split's uint8 patches resident in device HBM and gather per
    # batch on device (data/patch_bank.py); 0 = host-side batch assembly.
    patch_bank: int = 1
    # Fused Pallas rollout kernels (ops/pallas/decoder.py: fwd, bwd, and
    # fused-selection variants); effective on TPU backends, single chip.
    pallas_decoder: int = 1
    # Augmented-patch resampling. "nearest" (default) reproduces the
    # reference's PIL-rotate resample semantics as one-hot tap weights in
    # the same separable MXU contraction — same cost as bilinear, and the
    # r5 A/B (BASELINE.md augment_nearest rows) measured it BETTER on
    # min-over-k ADE/FDE at every seed (bilinear's smoothing of the 33x33
    # patches blurs the scene signal). "bilinear" kept as the r1-r4
    # behavior (PARITY deviation 5, now resolved-by-default).
    patch_interp: str = "nearest"
    # weighting_target="mgan" PM objective. 1 (default) reproduces the
    # reference's literal computation (train.py:604-613): torch.softmax
    # over the (b,1,G) branch output's SINGLETON sample axis -> all-ones
    # "targets" and a shape-broadcast (b,b,G) loss that reduces to
    # b * mean_{j,g}(-log pm[j,g]) - decayed_entropy, a batch-size-scaled
    # uniform-push on the PM head (the D branch values cancel, so no D
    # call is made). 0 trains the documented Bayes-target intent instead
    # (CE of the PM probs vs the softmax over the GENERATOR axis of the D
    # gen-id branch on GT — PARITY deviation 7, r1-r4 behavior). The r5
    # A/B (BASELINE.md wt_mgan reading) measured the literal objective
    # better on min-over-k ADE/FDE at 4 of 5 overlapping seeds and at
    # statistical parity with the reference itself over 8 seeds, so the
    # reference-exact semantics are the default — deviation resolved.
    wt_mgan_compat: int = 1
    # Persistent XLA compilation-cache directory: repeat CLI runs (sweeps,
    # evaluate-after-train) deserialize compiled executables instead of
    # recompiling (a warm train-step compile is 41-56 s through the
    # remote-compile service). Empty = disabled.
    compilation_cache_dir: str = ""

    def __post_init__(self):
        assert self.patch_interp in ("bilinear", "nearest")
        assert self.inp_format in INP_FORMATS
        assert self.gan_type in GAN_TYPES
        assert self.gan_obj in GAN_OBJECTIVES
        assert self.experiment in EXPERIMENTS
        assert self.pool_type in POOL_TYPES
        assert self.weighting_target in WEIGHTING_TARGETS
        assert self.l2_loss_type in L2_LOSS_TYPES
        # model_factory.py:16
        self.use_pinet = self.weighting_target != "none" and not self.unconditional

    def replace(self, **kw) -> "Config":
        cfg = dataclasses.replace(self, **kw)
        cfg.__post_init__()
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# Architecture constants fixed by the reference factory (model_factory.py:18-19).
PRED_LEN = 12
OBS_LEN = 8
SCENE_DIM = 8 * 8


def get_parser() -> argparse.ArgumentParser:
    """Same flag surface as the reference ``get_parser`` (config.py:4-135)."""
    p = argparse.ArgumentParser()
    d = Config()
    p.add_argument("--name", type=str, default=d.name)
    p.add_argument("--log_dir", type=str, default=d.log_dir)
    p.add_argument("--dataset", type=str, default=d.dataset, choices=DATASET_CHOICES)
    p.add_argument("--gpus", type=str, default=d.gpus)
    p.add_argument("--workers", type=int, default=d.workers)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--beta1", type=float, default=d.beta1)
    p.add_argument("--l2_loss_weight", type=float, default=d.l2_loss_weight)
    p.add_argument("--clf_loss_weight", type=float, default=d.clf_loss_weight)
    p.add_argument("--pi_net_loss_weight", type=float, default=d.pi_net_loss_weight)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--clipping_threshold_d", type=float, default=d.clipping_threshold_d)
    p.add_argument("--clipping_threshold_g", type=float, default=d.clipping_threshold_g)
    p.add_argument("--num_gen_steps", type=int, default=d.num_gen_steps)
    p.add_argument("--inp_format", choices=INP_FORMATS, default=d.inp_format)
    p.add_argument("--keep_gen_steps", type=int, default=d.keep_gen_steps)
    p.add_argument("--top_k_test", type=int, default=d.top_k_test)
    p.add_argument("--val_every", type=int, default=d.val_every)
    p.add_argument("--save_every", type=int, default=d.save_every)
    p.add_argument("--num_unrolling_steps", type=int, default=d.num_unrolling_steps)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--n_social_modules", type=int, default=d.n_social_modules)
    p.add_argument("--g_lr", type=float, default=d.g_lr)
    p.add_argument("--d_lr", type=float, default=d.d_lr)
    p.add_argument("--sigma", type=float, default=d.sigma)
    p.add_argument("--gan_type", type=str, choices=GAN_TYPES, default=d.gan_type)
    p.add_argument("--experiment", type=str, choices=EXPERIMENTS, default=d.experiment)
    p.add_argument("--pool_type", type=str, default=d.pool_type)
    p.add_argument("--global_disc", type=int, default=d.global_disc)
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--augment", type=int, default=d.augment)
    p.add_argument("--noise_dim", type=int, default=d.noise_dim)
    p.add_argument("--h_dim", type=int, default=d.h_dim)
    p.add_argument("--decoder_h_dim", type=int, default=d.decoder_h_dim)
    p.add_argument("--num_samples", type=int, default=d.num_samples)
    p.add_argument(
        "--num_expectation_samples", type=int, default=d.num_expectation_samples
    )
    p.add_argument(
        "--weighting_target",
        type=str,
        choices=WEIGHTING_TARGETS,
        default=d.weighting_target,
    )
    p.add_argument("--l2_loss_type", type=str, choices=L2_LOSS_TYPES, default=d.l2_loss_type)
    p.add_argument("--num_gens", type=int, default=d.num_gens)
    p.add_argument("--l2_decay_rate", type=float, default=d.l2_decay_rate)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--sghmc_alpha", type=float, default=d.sghmc_alpha)
    p.add_argument("--g_noise_loss_lambda", type=float, default=d.g_noise_loss_lambda)
    p.add_argument("--d_noise_loss_lambda", type=float, default=d.d_noise_loss_lambda)
    p.add_argument("--d_hist_loss_lambda", type=float, default=d.d_hist_loss_lambda)
    p.add_argument("--gan_obj", type=str, choices=GAN_OBJECTIVES, default=d.gan_obj)
    # TPU-build extras
    p.add_argument("--max_peds", type=int, default=d.max_peds)
    p.add_argument("--dp", type=int, default=d.dp)
    p.add_argument("--gp", type=int, default=d.gp)
    p.add_argument("--slices", type=int, default=d.slices)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--data_root", type=str, default=d.data_root)
    p.add_argument("--split_step", type=int, default=d.split_step)
    p.add_argument("--profile_dir", type=str, default=d.profile_dir)
    p.add_argument("--patch_bank", type=int, default=d.patch_bank)
    p.add_argument("--pallas_decoder", type=int, default=d.pallas_decoder)
    p.add_argument("--patch_interp", type=str,
                   choices=["bilinear", "nearest"], default=d.patch_interp)
    p.add_argument("--wt_mgan_compat", type=int, default=d.wt_mgan_compat)
    p.add_argument("--compilation_cache_dir", type=str, default=d.compilation_cache_dir)
    # Launch-time pod topology (parallel/pod.py) — runtime flags, not model
    # config: Config.from_dict drops them so they never persist.
    from mggan_tpu.parallel.pod import add_pod_args

    add_pod_args(p)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    return Config.from_dict(vars(args))
