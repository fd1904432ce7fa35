"""yolo_v3_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch rebuild of the capabilities of the ydixon/yolo_v3 PyTorch stack
(reference mounted at /root/reference), designed TPU-first:

* NHWC functional models as param/state pytrees (no mutable modules),
* the full letterbox -> backbone -> decode -> NMS path inside one ``jax.jit``,
* fixed-shape, mask-based postprocessing (no data-dependent shapes),
* data parallelism via ``jax.sharding.Mesh`` + ``jax.jit`` with sharding
  annotations (XLA inserts the ICI collectives),
* a deterministic, resumable host data engine mirroring the reference's
  RandomCyclicDataset/DataHelper contract (reference dataset.py:34-400).
"""

__version__ = "0.1.0"

from yolo_v3_tpu.utils.config import YoloConfig  # noqa: F401
