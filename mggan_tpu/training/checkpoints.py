"""Orbax checkpointing (reference: torch .pth save/load,
abstract_train.py:235-296).

Improvements over the reference (SURVEY.md §3.5): the full TrainState is
saved — including step/epoch, the decayed l2 weight, the PRNG key and both
optimizer states — so resume is exact (the reference restarts epoch at 0).
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from mggan_tpu.training.state import TrainState


def save_checkpoint(ckpt_dir: Path, state: TrainState, name: str):
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, jax.device_get(state), force=True)


def restore_checkpoint(ckpt_dir: Path, abstract_state: TrainState, name: str) -> TrainState:
    path = (Path(ckpt_dir) / name).absolute()
    with ocp.StandardCheckpointer() as restorer:
        return restorer.restore(path, abstract_state)


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
