"""pointtinybenchmark_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with
the capabilities of ucas-vg/PointTinyBenchmark: tiny-object detection
(TinyPerson stack: Scale Match, tiling, tiny-COCO eval) and point-supervised
localization (CPR, P2PNet-style heads, point-distance AP).

Blueprint: /root/repo/SURVEY.md.
"""
from .version import __version__

__all__ = ["__version__"]
