"""Convert a released PyTorch MG-GAN checkpoint into a version dir this
framework can evaluate directly.

The reference ships pretrained 2-8-generator BIWI/SDD models as torch
``.pth`` state dicts inside test_tube version dirs (README.md:69-71; format
saved by abstract_train.py:235-244: ``{"generator": ..., "discriminator":
..., "g_optim": ..., "d_optim": ...}`` with config in ``meta_tags.csv``).
This CLI maps the state dicts onto our pytrees (models/torch_import.py) and
writes an orbax version dir, so the moment a released checkpoint is
available it is one command away from ``cli.evaluate``:

    python -m mggan_tpu.cli.convert \
        --pth .../checkpoints/checkpoint_best.pth \
        --meta_tags .../meta_tags.csv \
        --out_dir logs_converted
    python -m mggan_tpu.cli.evaluate \
        --model_path logs_converted/<experiment>/<name> ...

Optimizer moments in the .pth are NOT converted (optax/AdamW state is
incompatible with torch Adam's by design); the converted dir is for
evaluation and fine-tuning-from-weights, which is what released
checkpoints are for.

The reverse direction also works — export a version dir trained HERE as a
reference-format torch checkpoint (models/torch_export.py) that the
reference's ``PiNetMultiGeneratorGAN.load_from_path`` consumes:

    python -m mggan_tpu.cli.convert --reverse \
        --version_dir logs/multi_generator/<name>/version_N \
        --out_dir ref_logs
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import jax

from mggan_tpu.config import Config


def _merge_state(init_tree, imported_tree):
    """Overlay imported model-state leaves (e.g. BN running stats) onto the
    freshly-initialised state, keeping init values for anything the torch
    checkpoint does not carry (e.g. probgan hist length counters)."""
    if imported_tree is None:
        return init_tree
    if isinstance(init_tree, dict):
        out = dict(init_tree)
        for k, v in imported_tree.items():
            out[k] = _merge_state(init_tree.get(k), v) if k in init_tree else v
        return out
    return imported_tree


def _check_shapes(init_params, imported_params, which):
    init_s = jax.tree.map(lambda x: tuple(x.shape), init_params)
    imp_s = jax.tree.map(lambda x: tuple(x.shape), imported_params)
    if init_s != imp_s:
        raise ValueError(
            f"{which} checkpoint shapes do not match the model built from "
            f"meta_tags.csv — wrong hyperparameters?\n"
            f"model: {init_s}\ncheckpoint: {imp_s}"
        )


def convert_torch_checkpoint(
    pth_path,
    out_dir,
    meta_tags=None,
    overrides=None,
    version=0,
    checkpoint_name="checkpoint_best",
):
    """Returns the created version directory (Path)."""
    from mggan_tpu.models.torch_import import load_torch_checkpoint
    from mggan_tpu.training.loop import Trainer
    from mggan_tpu.utils.logging import ExperimentWriter, load_meta_tags

    tags = dict(load_meta_tags(meta_tags)) if meta_tags else {}
    tags.update(overrides or {})
    config = Config.from_dict(tags)

    writer = ExperimentWriter(
        Path(out_dir), config.experiment, config.name, version=version,
        config=config, tensorboard=False,
    )
    trainer = Trainer(config, writer)
    (g_params, g_state), (d_params, d_state) = load_torch_checkpoint(
        pth_path, trainer.g_spec, trainer.d_spec
    )
    _check_shapes(trainer.state.g_params, g_params, "generator")
    _check_shapes(trainer.state.d_params, d_params, "discriminator")
    trainer.state = trainer.state.replace(
        g_params=g_params,
        g_state=_merge_state(trainer.state.g_state, g_state),
        d_params=d_params,
        d_state=_merge_state(trainer.state.d_state, d_state),
    )
    trainer.save(checkpoint_name)
    print(f"converted -> {writer.dir}")
    return writer.dir


def export_torch_checkpoint(version_dir, out_dir, checkpoint="best",
                            version=0, checkpoint_name="checkpoint_best"):
    """Reverse conversion: our version dir -> reference-format torch version
    dir (meta_tags.csv + checkpoints/<name>.pth). Returns the created dir."""
    from mggan_tpu.models.torch_export import export_version_dir
    from mggan_tpu.training.loop import Trainer

    trainer, config = Trainer.load_from_path(version_dir, checkpoint)
    vdir = export_version_dir(
        out_dir, config, trainer.g_spec, trainer.d_spec, trainer.state,
        version=version, checkpoint_name=checkpoint_name,
    )
    print(f"exported -> {vdir}")
    return vdir


def main(argv=None):
    p = ArgumentParser(description=__doc__)
    p.add_argument("--reverse", action="store_true",
                   help="export our version dir as a reference .pth dir")
    p.add_argument("--version_dir", default=None,
                   help="(--reverse) our trained version dir")
    p.add_argument("--checkpoint", default="best",
                   help="(--reverse) which checkpoint to export")
    p.add_argument("--pth", default=None, help="reference checkpoint_*.pth")
    p.add_argument(
        "--meta_tags", default=None,
        help="reference meta_tags.csv (defaults to ../meta_tags.csv "
             "relative to the .pth's checkpoints dir)",
    )
    p.add_argument("--out_dir", required=True)
    p.add_argument("--version", type=int, default=0)
    p.add_argument("--checkpoint_name", default="checkpoint_best")
    p.add_argument(
        "--set", nargs="*", default=[], metavar="KEY=VALUE",
        help="config overrides applied over meta_tags (e.g. --set "
             "dataset=eth num_gens=4)",
    )
    args = p.parse_args(argv)

    if args.reverse:
        assert args.version_dir, "--reverse requires --version_dir"
        export_torch_checkpoint(
            args.version_dir, args.out_dir, checkpoint=args.checkpoint,
            version=args.version, checkpoint_name=args.checkpoint_name,
        )
        return
    assert args.pth, "--pth is required (or use --reverse)"

    meta = args.meta_tags
    if meta is None:
        cand = Path(args.pth).parent.parent / "meta_tags.csv"
        meta = cand if cand.is_file() else None

    from mggan_tpu.utils.logging import _convert

    overrides = {}
    for item in args.set:
        k, _, v = item.partition("=")
        overrides[k] = _convert(v)

    convert_torch_checkpoint(
        args.pth, args.out_dir, meta_tags=meta, overrides=overrides,
        version=args.version, checkpoint_name=args.checkpoint_name,
    )


if __name__ == "__main__":
    main()
