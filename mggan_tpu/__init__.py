"""mggan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-generator GAN framework
for multi-modal pedestrian trajectory prediction.

Re-implements the full capability surface of the MG-GAN reference
(ICCV 2021, arXiv:2108.09274; selflein/MG-GAN) with a TPU-first design:

- Ragged per-scene batches (the reference's ``seq_start_end`` Python loops)
  become fixed-shape padded ``(scenes, max_peds)`` tensors with masks and
  segment math.
- LSTM encoder/decoder run as ``lax.scan`` cells with fused gate matmuls;
  all N generator decoders are one stacked parameter pytree decoded under
  ``vmap``.
- Social attention is a dense masked per-scene kernel instead of per-ped
  Python loops.
- The GAN train step (D-step, G-step, PM-step, three AdamW chains,
  unrolled-GAN snapshotting) is a single jitted function; data parallelism
  shards the scene axis over an ICI mesh with all-reduced gradients.
- Evaluation (ADE/FDE/Mode for k=1..20, manifold Precision/Recall, seven
  sampling strategies) runs batched on device.
"""

__version__ = "0.1.0"
