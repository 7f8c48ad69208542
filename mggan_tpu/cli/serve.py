"""Inference CLI: serve an exported artifact (or version dir) over HTTP, or
run offline batch prediction over a reference-format trajectory txt file.

The reference's only inference surface is scripts/evaluate.py (metrics over
its own datasets); this adds the deployment half: the model runs as a
self-contained AOT artifact with request padding + micro-batching
(serving/runtime.py), no model code or checkpoint needed at the endpoint.

HTTP serving:
    mggan-serve --artifact model.jaxexport --port 8000
    mggan-serve --model_dir logs/.../version_1 --strategy sampling --port 8000

Offline batch (txt in, npz out — observation-only 8-frame windows):
    mggan-serve --artifact model.jaxexport --input obs.txt --output preds.npz
    # obs.txt rows: frame ped_id x y (reference dataset format,
    # BaseTrajectories.py:130-155; --txt_dataset picks the column schema)

Scene context: a scene-conditioned model (every reference config — the
4x33x33 patch is a first-class input, BaseTrajectories.py:254-288) refuses
to predict without scene input. Supply it with --scene_img (the half-res
"small" scene image; patches are cropped at each ped's last observed
position exactly like the eval pipeline) + --px_per_meter, or opt into
degraded zero-patch predictions explicitly with --allow_missing_scene.
Over HTTP, clients register scenes via POST /v1/scenes and reference them
per request with "scene_ids" (or send ready-made "patches").
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np

from mggan_tpu.config import OBS_LEN


def load_obs_windows(path, dataset: str | None = None):
    """Parse a trajectory txt into observation-only scenes.

    Slides 8-frame full-presence windows (the serving-time analog of the
    20-frame training windows, data/parsing.py::window_scene) over the file.
    Returns (list of (p_i, 8, 2) float32, list of (window_start_frame,
    ped_ids) provenance tuples).
    """
    from mggan_tpu.data import parsing, registry

    if dataset is not None:
        info = registry.get_info(dataset)
    else:
        # Generic whitespace (frame, ID, x, y). NOTE: real BIWI raw files
        # store (frame, ID, y, x) (registry.py BIWI_COLUMNS,
        # experiments.py:185) — pass --txt_dataset eth/hotel/... for
        # registry schemas instead of relying on this fallback.
        import dataclasses

        info = dataclasses.replace(
            registry.get_info("eth"),
            data_columns=["frame", "ID", "x", "y"], delim=r"\s+",
        )
    data = parsing.load_txt(Path(path), info)
    # inclusive: serving wants the window ending at the newest frame (and a
    # file of exactly OBS_LEN frames = one window); the reference's ceil
    # window count only matters for training parity.
    windows = parsing.window_scene(data, skip=1, seq_len=OBS_LEN,
                                   inclusive=True)
    return [w[0] for w in windows], [w[1] for w in windows]


def get_arg_parser():
    p = ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--artifact", help="a .jaxexport file from mggan-export")
    src.add_argument("--model_dir", help="a version_* dir (live, non-AOT path)")
    p.add_argument("--strategy", default="sampling",
                   help="prediction strategy (only for --model_dir)")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--scenes", default="64",
                   help="compiled batch: max scenes per device call "
                        "(--model_dir); a comma list (e.g. 1,8,64) compiles "
                        "one program per scene-count bucket so small "
                        "requests dispatch small programs")
    p.add_argument("--peds", type=int, default=16)
    p.add_argument("--num", type=int, default=20, help="samples per scene")
    # HTTP mode
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="micro-batching window after the first request")
    # offline mode
    p.add_argument("--input", default=None,
                   help="trajectory txt (frame id x y) -> offline batch mode")
    p.add_argument("--txt_dataset", default=None,
                   help="registry name for the txt column schema/delimiter")
    p.add_argument("--output", default=None, help="output .npz path")
    p.add_argument("--seed", type=int, default=0)
    # scene context
    p.add_argument("--scene_img", default=None,
                   help="half-res scene image (the training pipeline's "
                        "'small' resolution); patches are cropped at each "
                        "ped's last observed position")
    p.add_argument("--px_per_meter", type=float, default=2.0,
                   help="pixels-per-meter of --scene_img (1/scaling_small; "
                        "BIWI small images: 2)")
    p.add_argument("--scene_name", default="scene0",
                   help="registry name for --scene_img")
    p.add_argument("--allow_missing_scene", action="store_true",
                   help="serve a scene-conditioned model WITHOUT scene "
                        "input (degraded zero-patch predictions; off by "
                        "default — missing scene input is an error)")
    return p


def build_model(args):
    from mggan_tpu.serving.runtime import ServingModel

    if args.artifact:
        model = ServingModel.from_artifact(
            args.artifact, allow_missing_scene=args.allow_missing_scene
        )
    else:
        buckets = sorted({int(s) for s in str(args.scenes).split(",")})
        model = ServingModel.from_version_dir(
            args.model_dir, strategy=args.strategy, scenes=buckets[-1],
            peds=args.peds, num=args.num, checkpoint=args.checkpoint,
            allow_missing_scene=args.allow_missing_scene,
            scene_buckets=buckets,
        )
    if args.scene_img:
        import cv2

        img = cv2.cvtColor(cv2.imread(str(args.scene_img)), cv2.COLOR_BGR2RGB)
        model.register_scene(args.scene_name, img, args.px_per_meter)
    return model


def main(argv=None):
    args = get_arg_parser().parse_args(argv)
    model = build_model(args)

    if args.input:  # offline batch mode
        assert args.output, "--input requires --output"
        scenes, meta = load_obs_windows(args.input, args.txt_dataset)
        if not scenes:
            raise SystemExit(f"no full-presence {OBS_LEN}-frame windows in {args.input}")
        preds = []
        for i in range(0, len(scenes), model.scenes):
            chunk = scenes[i : i + model.scenes]
            patches = (
                [model.crop_patches(args.scene_name, obs) for obs in chunk]
                if args.scene_img else None
            )
            preds.extend(model.predict_batch(chunk, patches, seed=args.seed + i))
        np.savez(
            args.output,
            **{f"window_{i:05d}": p for i, p in enumerate(preds)},
            **{f"ped_ids_{i:05d}": ids for i, ids in enumerate(meta)},
        )
        print(f"{len(preds)} windows ({sum(p.shape[1] for p in preds)} agents) "
              f"x {model.num} samples -> {args.output}")
        return

    from mggan_tpu.serving.server import serve_forever

    serve_forever(model, host=args.host, port=args.port,
                  max_wait_ms=args.max_wait_ms)


if __name__ == "__main__":
    main()
