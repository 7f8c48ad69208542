"""Grid-search sweep driver.

The reference exposes tunable flags through test_tube's
``HyperOptArgumentParser(strategy="grid_search")`` / ``opt_list``
(config.py:5,82-133). Here sweeps are an explicit driver: pass a JSON
object of flag -> list-of-values and every combination is trained
sequentially (one version dir each).

    python -m mggan_tpu.cli.sweep --grid '{"num_gens": [2,3,4,5],
        "gan_obj": ["NS","LS"]}' --name sweep1 --dataset eth ...
"""

from __future__ import annotations

import itertools
import json

from mggan_tpu.config import config_from_args, get_parser
from mggan_tpu.training.loop import Trainer
from mggan_tpu.utils.logging import ExperimentWriter


def main(argv=None):
    parser = get_parser()
    parser.add_argument(
        "--grid", type=str, required=True,
        help='JSON dict of flag -> list of values, e.g. \'{"num_gens": [2,3]}\'',
    )
    args = parser.parse_args(argv)
    grid = json.loads(args.grid)
    base = config_from_args(args)

    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))
    print(f"sweep: {len(combos)} configurations over {keys}")
    for combo in combos:
        overrides = dict(zip(keys, combo))
        tag = "_".join(f"{k}={v}" for k, v in overrides.items())
        cfg = base.replace(**overrides)
        cfg.name = f"{base.name}_{tag}"
        print(f"=== {cfg.name}")
        writer = ExperimentWriter(
            cfg.log_dir, cfg.experiment, cfg.name, config=cfg
        )
        Trainer(cfg, writer).train()


if __name__ == "__main__":
    main()
