"""Functional ring/delta/delay buffers.

Re-derivation of reference utils/buffers.py:27-165 as explicit pytree state
(the reference's are mutable objects; these thread through jitted steps —
used for recent-value observables, eef force/acceleration estimation).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RingBuffer:
    """Fixed-size ring of the last N values (reference buffers.py:27-94)."""

    buf: Any     # (N, dim)
    ptr: Any     # scalar int
    count: Any   # scalar int

    @classmethod
    def make(cls, length: int, dim: int, dtype=jnp.float32):
        return cls(
            buf=jnp.zeros((length, dim), dtype=dtype),
            ptr=jnp.asarray(0, dtype=jnp.int32),
            count=jnp.asarray(0, dtype=jnp.int32),
        )

    def push(self, value):
        n = self.buf.shape[0]
        buf = self.buf.at[self.ptr % n].set(value)
        return self.replace(buf=buf, ptr=(self.ptr + 1) % n, count=jnp.minimum(self.count + 1, n))

    @property
    def current(self):
        n = self.buf.shape[0]
        return self.buf[(self.ptr - 1) % n]

    @property
    def average(self):
        denom = jnp.maximum(self.count, 1).astype(self.buf.dtype)
        return jnp.sum(self.buf, axis=0) / denom


@struct.dataclass
class DeltaBuffer:
    """Tracks current and last value + delta (reference buffers.py:95-153)."""

    last: Any
    current: Any

    @classmethod
    def make(cls, dim: int, dtype=jnp.float32):
        z = jnp.zeros(dim, dtype=dtype)
        return cls(last=z, current=z)

    def push(self, value):
        return self.replace(last=self.current, current=value)

    @property
    def delta(self):
        return self.current - self.last


@struct.dataclass
class DelayBuffer:
    """Returns values delayed by K pushes (reference buffers.py:154-165)."""

    ring: RingBuffer

    @classmethod
    def make(cls, delay: int, dim: int, dtype=jnp.float32):
        return cls(ring=RingBuffer.make(delay + 1, dim, dtype))

    def push(self, value):
        return self.replace(ring=self.ring.push(value))

    @property
    def delayed(self):
        n = self.ring.buf.shape[0]
        return self.ring.buf[self.ring.ptr % n]
