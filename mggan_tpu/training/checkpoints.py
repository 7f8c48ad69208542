"""Orbax checkpointing (reference: torch .pth save/load,
abstract_train.py:235-296).

Improvements over the reference (SURVEY.md §3.5): the full TrainState is
saved — including step/epoch, the decayed l2 weight, the PRNG key and both
optimizer states — so resume is exact (the reference restarts epoch at 0).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from mggan_tpu.training.state import TrainState


def save_checkpoint(ckpt_dir: Path, state: TrainState, name: str):
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, jax.device_get(state), force=True)


def restore_checkpoint(ckpt_dir: Path, abstract_state: TrainState, name: str) -> TrainState:
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as restorer:
        try:
            return restorer.restore(path, abstract_state)
        except Exception:
            # Legacy checkpoints predate ``best_val`` on TrainState; their
            # saved pytree has one field fewer, so the structure-matched
            # restore above fails. Retry against the reduced tree and
            # default best_val to +inf ("no validation recorded yet") —
            # the documented pre-best_val semantics. If the mismatch was
            # something else, this restore re-raises its own error.
            legacy_abstract = {
                f.name: getattr(abstract_state, f.name)
                for f in dataclasses.fields(abstract_state)
                if f.name != "best_val"
            }
            restored = restorer.restore(path, legacy_abstract)
            return TrainState(
                **restored, best_val=jnp.asarray(jnp.inf, jnp.float32)
            )


def resolve_checkpoint_name(ckpt_dir: Path, checkpoint="best") -> str:
    """'best' | 'latest' | epoch number -> directory name
    (abstract_train.py:250-263)."""
    ckpt_dir = Path(ckpt_dir)
    if checkpoint == "best":
        if (ckpt_dir / "checkpoint_best").exists():
            return "checkpoint_best"
        checkpoint = "latest"
    if checkpoint == "latest":
        epochs = []
        for c in ckpt_dir.iterdir():
            tail = c.name.split("_")[-1]
            try:
                epochs.append(int(tail))
            except ValueError:
                continue
        if not epochs:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
        return f"checkpoint_{max(epochs)}"
    return f"checkpoint_{int(checkpoint)}"
