"""Host-side staging buffers with reuse semantics.

Capability parity with the reference's `dsp/buffer` package
(`buffer.go:5-110`, `pool.go:7-46`): a `Buffer` wrapping a float array
with Grow/Resize/Zero reuse semantics and a size-stable `Pool` so
hot streaming loops allocate nothing per block.

TPU framing: on-device allocation is owned by XLA — the device-side
reuse contract is `utils.donated_jit` (buffer donation) and explicit
pytree state, so there is nothing to pool there. What remains is the
HOST side of the host<->device boundary (SURVEY.md §3.6): staging
arrays that feed blocks into dispatch or drain them from the native
SPSC ring (demo producer, file/stream IO). That is what this pool
serves; it is the allocation-free analog of the reference's
`sync.Pool`-backed buffer reuse in its streaming convolvers
(`overlap_add.go:237`, `overlap_save.go:326`).
"""

from __future__ import annotations

import threading

import numpy as np


class Buffer:
    """A float staging buffer with length/capacity split (`buffer.go:5`).

    `samples` is a zero-copy view of the live region; mutations through
    it are visible to later users, exactly like the Go slice bridge
    (`buffer.go:20-27`).
    """

    def __init__(self, length: int = 0, dtype=np.float32):
        length = max(int(length), 0)
        self._data = np.zeros(length, dtype)
        self._len = length

    @classmethod
    def from_array(cls, a: np.ndarray) -> "Buffer":
        """Wrap an existing 1-D array without copying (`buffer.go:20`)."""
        b = cls(0, a.dtype)
        b._data = np.ascontiguousarray(a).ravel()
        b._len = b._data.size
        return b

    @property
    def samples(self) -> np.ndarray:
        """View of the live region (length `len(self)`), no copy."""
        return self._data[:self._len]

    def __len__(self) -> int:
        return self._len

    @property
    def capacity(self) -> int:
        return self._data.size

    def grow(self, n: int) -> None:
        """Ensure capacity >= n, preserving existing data (`buffer.go:40`)."""
        if n > self._data.size:
            grown = np.zeros(n, self._data.dtype)
            grown[:self._len] = self._data[:self._len]
            self._data = grown

    def resize(self, n: int) -> None:
        """Set length to n, reusing capacity; newly exposed elements are
        zeroed (stale data from previous use, `buffer.go:52-73`)."""
        n = max(int(n), 0)
        self.grow(n)
        if n > self._len:
            self._data[self._len:n] = 0
        self._len = n

    def zero(self) -> None:
        self._data[:self._len] = 0

    def zero_range(self, start: int, end: int) -> None:
        """Zero [start, end), clamped to valid bounds (`buffer.go:82`)."""
        self._data[max(start, 0):min(end, self._len)] = 0

    def copy(self) -> "Buffer":
        b = Buffer(self._len, self._data.dtype)
        b._data[:self._len] = self._data[:self._len]
        return b


class Pool:
    """Thread-safe `Buffer` reuse (`pool.go:7-46`).

    `get(n)` returns a zeroed Buffer of length n (reusing the largest
    pooled backing array); `put` returns it for reuse. The caller must
    not touch a buffer after `put` — same contract as the reference.
    """

    def __init__(self, dtype=np.float32):
        self._dtype = np.dtype(dtype)
        self._free: list[Buffer] = []
        self._lock = threading.Lock()

    def get(self, length: int) -> Buffer:
        with self._lock:
            b = None
            if self._free:
                # largest capacity first, so mixed-size request patterns
                # stay allocation-free once warmed up
                i = max(range(len(self._free)),
                        key=lambda j: self._free[j].capacity)
                b = self._free.pop(i)
        if b is None:
            return Buffer(length, self._dtype)
        # resize from 0 so the whole live region is zeroed exactly once
        b.resize(0)
        b.resize(length)
        return b

    def put(self, b: Buffer | None) -> None:
        if b is None:
            return
        if b.samples.dtype != self._dtype:
            raise ValueError(
                f"pool: buffer dtype {b.samples.dtype} != pool dtype "
                f"{self._dtype}")
        with self._lock:
            self._free.append(b)
