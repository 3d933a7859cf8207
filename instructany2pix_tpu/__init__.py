"""instructany2pix_tpu — TPU-native instruction-driven any-to-image editing.

Public API mirrors the reference package root (reference
instructany2pix/__init__.py:1 re-exports InstructAny2PixPipeline).
"""

from .pipeline import InstructAny2PixPipeline

__all__ = ["InstructAny2PixPipeline"]
__version__ = "0.1.0"
