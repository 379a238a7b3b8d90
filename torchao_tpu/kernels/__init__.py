"""Pallas TPU kernels (L0): the replacement for the reference's
CUDA/CUTLASS/Triton kernel zoo (SURVEY.md §2.7).

Modules export ``*_available(...)`` probes returning a callable when the
kernel supports the given operand shapes/layouts on the current backend,
else ``None`` (the dispatch then takes the XLA path).
"""
