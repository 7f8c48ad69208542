"""Serving runtime: fixed-shape model wrapper, micro-batching queue, and a
stdlib HTTP inference server over ``jax.export`` artifacts (cli/export.py).

The reference has no deployment story (checkpoints are only consumable from
its own Python code, scripts/evaluate.py:114-127); this subsystem is a
TPU-first build item: AOT-compiled fixed shapes, request padding at the
edge, and cross-request micro-batching to keep the device batch full.
"""

from mggan_tpu.serving.runtime import MicroBatcher, ServingModel  # noqa: F401
