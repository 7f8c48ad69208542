"""Serving export: serialize a trained Predictor to a StableHLO artifact.

The reference has no deployment story beyond loading torch checkpoints in
Python (scripts/evaluate.py:114-127). Here a trained version dir exports to
a self-contained ``jax.export`` artifact — parameters baked in as
constants, one ahead-of-time-lowered function per (batch shape, k,
strategy) — that any JAX runtime (or PJRT C++ host via the StableHLO
payload) can deserialize and call WITHOUT the model code:

    python -m mggan_tpu.cli.export --model_dir logs/.../version_1 \
        --out model.jaxexport --scenes 256 --peds 16 --num 20

    exported, meta = load_artifact("model.jaxexport")
    pred_abs = exported.call(xy, ped_mask, patches, seed)
    # meta: {"wants_scene": bool, "strategy": ..., "dataset": ...}

Inputs: xy (S,P,20,2) f32 (observed 8 steps used), ped_mask (S,P) bool,
patches (S,P,33,33,4) f32 (or zeros when the model has no scene CNN),
seed i32 scalar. Output: pred_abs (num, S, P, 12, 2).
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path

import numpy as np

# Strategies whose selection runs fully on device (eval/predict.py); the
# export must be one pure jittable function.
EXPORTABLE = (
    "sampling", "expected", "uniform_expected", "smart_expected",
    "smart_sampling", "uniform_sampling",
)


def build_serving_fn(predictor, strategy: str):
    """(xy, ped_mask, patches, seed) -> pred_abs, params closed over."""
    import jax

    assert strategy in EXPORTABLE, (
        f"strategy {strategy!r} is not exportable as one pure function "
        f"(choose from {EXPORTABLE})"
    )
    pred_func = predictor.get_predict_func(strategy)

    def serve(xy, ped_mask, patches, seed, *, num):
        batch = {"xy": xy, "ped_mask": ped_mask, "patches": patches}
        rng = jax.random.PRNGKey(seed)
        out = pred_func(batch, rng, num=num)
        return out[0]  # pred_abs (num, S, P, T, 2)

    return serve


def export_predictor(predictor, strategy: str, scenes: int, peds: int,
                     num: int, platforms=None):
    """AOT-lower the serving function for fixed shapes -> jax.export.Exported."""
    import functools

    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    serve = build_serving_fn(predictor, strategy)
    fn = jax.jit(functools.partial(serve, num=num))
    args = (
        jax.ShapeDtypeStruct((scenes, peds, 20, 2), jnp.float32),
        jax.ShapeDtypeStruct((scenes, peds), jnp.bool_),
        jax.ShapeDtypeStruct((scenes, peds, 33, 33, 4), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    return jexport.export(fn, **kw)(*args)


# Artifact container: a small JSON metadata header (wants_scene, strategy,
# dataset provenance) in front of one or more raw jax.export payloads —
# multiple payloads are the per-scene-count bucket programs of ONE model
# (serving pads a request only to the smallest bucket that fits, so small
# requests move small tensors; runtime.py::ServingModel). The header's
# "payload_lengths" lists each payload's byte length; absent = exactly one
# payload (round-3/4 single-program artifacts). Header-less files (round-3
# artifacts) still load, with empty metadata.
_MAGIC = b"MGEX1\n"


def save_artifact(exported, path, meta: dict | None = None):
    """``exported``: one jax.export.Exported or a list of them (buckets)."""
    import json

    exporteds = exported if isinstance(exported, (list, tuple)) else [exported]
    payloads = [e.serialize() for e in exporteds]
    meta = dict(meta or {})
    if len(payloads) > 1:
        meta["payload_lengths"] = [len(b) for b in payloads]
    header = json.dumps(meta).encode()
    Path(path).write_bytes(
        _MAGIC + len(header).to_bytes(4, "big") + header + b"".join(payloads)
    )


def load_artifact_all(path):
    """Returns (list of jax.export.Exported, metadata dict) — every bucket
    program in the artifact (single-program files give a 1-list)."""
    import json

    from jax import export as jexport

    data = Path(path).read_bytes()
    meta = {}
    if data.startswith(_MAGIC):
        n = int.from_bytes(data[len(_MAGIC) : len(_MAGIC) + 4], "big")
        start = len(_MAGIC) + 4
        meta = json.loads(data[start : start + n])
        data = data[start + n :]
    lengths = meta.get("payload_lengths", [len(data)])
    exporteds, off = [], 0
    for ln in lengths:
        exporteds.append(jexport.deserialize(data[off : off + ln]))
        off += ln
    return exporteds, meta


def load_artifact(path):
    """Returns (jax.export.Exported, metadata dict) — the LARGEST bucket
    program for multi-bucket artifacts (backwards-compatible surface)."""
    exporteds, meta = load_artifact_all(path)
    return max(exporteds, key=lambda e: e.in_avals[0].shape[0]), meta


def get_arg_parser():
    p = ArgumentParser()
    p.add_argument("--model_dir", required=True,
                   help="a version_* dir written by training")
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--out", required=True)
    p.add_argument("--strategy", default="sampling", choices=EXPORTABLE)
    p.add_argument("--scenes", default="256",
                   help="max scenes per device call; a comma list (e.g. "
                        "1,8,64) exports one program per scene-count "
                        "bucket — serving pads a request only to the "
                        "smallest bucket that fits")
    p.add_argument("--peds", type=int, default=16)
    p.add_argument("--num", type=int, default=20)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    return p


def main(argv=None):
    from mggan_tpu.training.loop import Trainer

    args = get_arg_parser().parse_args(argv)
    trainer, config = Trainer.load_from_path(Path(args.model_dir), args.checkpoint)
    platforms = args.platforms.split(",") if args.platforms else None
    predictor = trainer.predictor()
    buckets = sorted({int(s) for s in str(args.scenes).split(",")})
    exporteds = [
        export_predictor(
            predictor, args.strategy, s, args.peds, args.num,
            platforms=platforms,
        )
        for s in buckets
    ]
    meta = {
        "wants_scene": predictor.g_spec.scene_dim > 0,
        "strategy": args.strategy,
        "dataset": config.dataset,
        "model_dir": str(args.model_dir),
    }
    save_artifact(exporteds if len(exporteds) > 1 else exporteds[0],
                  args.out, meta)
    size = Path(args.out).stat().st_size
    print(f"exported {args.strategy} (S={buckets}, P={args.peds}, "
          f"k={args.num}) for {exporteds[0].platforms} -> {args.out} "
          f"({size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
