"""Ev2Hands-TPU: a TPU-native (JAX/XLA/Pallas) framework for 3D pose
estimation of two interacting hands from event-camera streams.

Re-designed from scratch with the capabilities of the PyTorch reference
(Chris10M/Ev2Hands, 3DV 2024): synthetic event-data generation, TEHNet
training/finetuning, Ev2Hands-S/R evaluation, and streaming real-data demo —
expressed as fixed-shape jitted XLA programs with explicit sharding for
multi-chip scale-out.
"""

from ev2hands_tpu.config import Config, DEFAULT_CONFIG

__version__ = "0.1.0"

__all__ = ["Config", "DEFAULT_CONFIG", "__version__"]
