"""Training CLI (reference mggan/model/train.py:665-691).

    python -m mggan_tpu.cli.train --name exp --num_gens 4 --dataset eth ...

Resume: --checkpoint <version_dir> restores the full TrainState (including
epoch — fixing the reference's epoch-restart-at-0 bug, SURVEY.md §3.5).
"""

from __future__ import annotations

from pathlib import Path

from mggan_tpu.config import config_from_args, get_parser
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def main(argv=None):
    args = get_parser().parse_args(argv)
    # Join the pod (if any) BEFORE any device/backend touch: process_count
    # drives the elastic data shards and global-batch assembly downstream.
    from mggan_tpu.parallel.pod import maybe_init_from_args

    maybe_init_from_args(args)
    config = config_from_args(args)

    if config.checkpoint:
        output_dir = Path(config.checkpoint)
        assert output_dir.is_dir(), output_dir
        model, config = Trainer.load_from_path(output_dir)
        model.config = config.replace(val_every=1)
    else:
        writer = ExperimentWriter(
            config.log_dir, config.experiment, config.name, config=config
        )
        print(str(writer.dir.resolve()))
        model = Trainer(config, writer)
        writer.save_config(config)  # num_gen_parameters filled by factory
    model.train()


if __name__ == "__main__":
    main()
