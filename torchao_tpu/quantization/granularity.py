"""Quantization granularity types.

API-parity with the reference's ``torchao/quantization/granularity.py:11-101``
(PerTensor/PerAxis/PerGroup/PerRow/PerToken dataclasses), re-expressed for a
functional JAX API: each granularity knows how to produce the ``block_size``
tuple used by the primitive ops for a given tensor shape.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Granularity:
    """Base class for quantization granularity."""

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class PerTensor(Granularity):
    """One qparam for the whole tensor."""

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        return tuple(shape)


@dataclasses.dataclass(frozen=True)
class PerAxis(Granularity):
    """One qparam per slice along ``axis`` (e.g. per-channel)."""

    axis: int = 0

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        bs = list(shape)
        bs[self.axis] = 1
        return tuple(bs)


@dataclasses.dataclass(frozen=True)
class PerGroup(Granularity):
    """One qparam per contiguous group of ``group_size`` elements along the
    last axis (group-wise weight quantization)."""

    group_size: int = 128

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        bs = [1] * len(shape)
        bs[-1] = self.group_size
        return tuple(bs)


@dataclasses.dataclass(frozen=True)
class PerRow(Granularity):
    """One qparam per row (all axes but the last are 1 in block terms is NOT
    what PerRow means in the reference: it is per-leading-slice, block
    ``(1, ..., K)`` — each output row of a weight shares one scale)."""

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        bs = [1] * len(shape)
        bs[-1] = shape[-1]
        return tuple(bs)


@dataclasses.dataclass(frozen=True)
class PerToken(Granularity):
    """One qparam per token: block ``(1, ..., 1, K)`` over activations."""

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        bs = [1] * len(shape)
        bs[-1] = shape[-1]
        return tuple(bs)


@dataclasses.dataclass(frozen=True)
class PerBlock(Granularity):
    """One qparam per N-D tile, e.g. (128, 128) DeepSeek-style blockwise."""

    block_shape: Tuple[int, ...] = (128, 128)

    def block_size(self, shape: Sequence[int]) -> Tuple[int, ...]:
        assert len(self.block_shape) <= len(shape)
        bs = [1] * (len(shape) - len(self.block_shape)) + list(self.block_shape)
        return tuple(bs)
