"""ctypes wrapper + batch iterator over the native tilepipe reader.

The shared library builds from ``tilepipe.cpp`` on first use (g++; no
pybind11 / pip machinery needed). If no toolchain is available the loader
degrades to a numpy fallback with identical semantics —
:func:`tilepipe_available` tells you which path is active.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from collections.abc import Iterator, Sequence
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("tilepipe.cpp")
_LIB = Path(__file__).with_name("_tilepipe.so")

_lib = None
_build_error: str | None = None


def _load_library():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            # Compile to a per-PID temp path and os.replace into place:
            # compiling straight onto the final path races concurrent
            # processes (one can CDLL a half-written ELF, and rewriting a
            # .so another process has mapped risks SIGBUS). The atomic
            # rename swaps the directory entry only — any already-mapped
            # old inode stays valid for its holder (review finding).
            tmp = _LIB.with_name(f"_tilepipe.{os.getpid()}.so.tmp")
            try:
                subprocess.run(
                    [
                        "g++", "-O2", "-shared", "-fPIC", "-pthread", "-std=c++17",
                        str(_SRC), "-o", str(tmp),
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, _LIB)
            finally:
                tmp.unlink(missing_ok=True)
        lib = ctypes.CDLL(str(_LIB))
        lib.tp_open.restype = ctypes.c_void_p
        lib.tp_open.argtypes = [ctypes.c_size_t, ctypes.c_int, ctypes.c_int]
        lib.tp_enqueue.restype = ctypes.c_int
        lib.tp_enqueue.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
        ]
        lib.tp_wait.restype = ctypes.c_int
        lib.tp_wait.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tp_buffer.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.tp_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.tp_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _build_error = f"{type(e).__name__}: {e}"
    return _lib


def tilepipe_available() -> bool:
    """True when the native reader built/loaded successfully."""
    return _load_library() is not None


class TilePipe:
    """Low-level handle: N pre-allocated slots + reader-thread pool."""

    def __init__(self, slot_bytes: int, n_slots: int = 2, n_threads: int = 4):
        if slot_bytes <= 0 or n_slots < 1 or n_threads < 1:
            # tp_open also rejects these (returning null), but the Python
            # boundary owes the actionable message: zero threads would
            # otherwise deadlock the first wait() forever (review finding).
            raise ValueError(
                f"tilepipe needs slot_bytes > 0, n_slots >= 1, n_threads >= 1 "
                f"(got {slot_bytes}, {n_slots}, {n_threads})"
            )
        lib = _load_library()
        if lib is None:
            raise RuntimeError(f"tilepipe native library unavailable ({_build_error})")
        self._lib = lib
        self.slot_bytes = slot_bytes
        self.n_slots = n_slots
        self._handle = lib.tp_open(slot_bytes, n_slots, n_threads)
        if not self._handle:
            raise MemoryError("tilepipe: slot allocation failed")

    def enqueue(self, slot: int, files: Sequence[str], offsets: Sequence[int], lengths: Sequence[int]) -> None:
        """Start async reads of ``files`` into ``slot`` at byte ``offsets``.
        Entries may be anything ``os.fspath`` accepts (str / Path) — the
        numpy fallback accepts Paths, so the native path must too."""
        n = len(files)
        paths_blob = b"\0".join(os.fspath(p).encode() for p in files) + b"\0"
        off = (ctypes.c_uint64 * n)(*offsets)
        lng = (ctypes.c_uint64 * n)(*lengths)
        rc = self._lib.tp_enqueue(self._handle, slot, paths_blob, off, lng, n)
        if rc != 0:
            raise ValueError(f"tilepipe enqueue failed (slot={slot})")

    def wait(self, slot: int) -> None:
        """Block until the slot's reads finish; raises on any failed read."""
        errors = self._lib.tp_wait(self._handle, slot)
        if errors < 0:
            raise ValueError(f"tilepipe: invalid slot {slot} (n_slots={self.n_slots})")
        if errors:
            raise OSError(f"tilepipe: {errors} read(s) failed in slot {slot}")

    def buffer(self, slot: int) -> np.ndarray:
        """Zero-copy uint8 view of the slot buffer (valid until close)."""
        ptr = self._lib.tp_buffer(self._handle, slot)
        if not ptr:
            raise ValueError(f"tilepipe: invalid slot {slot} (n_slots={self.n_slots})")
        return np.ctypeslib.as_array(ptr, shape=(self.slot_bytes,))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.tp_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        self.close()


class RawTileLoader:
    """Double-buffered batch iterator over raw uint8 tile files.

    Each file holds one tile of ``tile_shape`` bytes (C-order uint8). While
    batch k is being consumed (e.g. computing on the TPU), the reader
    threads fill batch k+1 — the DataLoader-prefetch pattern without Python
    workers. Yields zero-copy ``(B, *tile_shape)`` views into the slot
    buffers: each view is valid only until its slot is refilled (two
    iterations later) and ALL views die when iteration ends (the buffers
    are freed) — copy any batch that must outlive that. The FINAL batch is
    yielded as a copy, so the natural ``[b for b in loader]`` pattern never
    holds a freed pointer it was not warned about (review finding).
    """

    def __init__(
        self,
        files: Sequence[str],
        tile_shape: tuple[int, ...],
        batch_size: int,
        n_threads: int = 4,
        drop_remainder: bool = False,
    ):
        self.files = list(files)
        self.tile_shape = tuple(tile_shape)
        self.tile_bytes = int(np.prod(tile_shape))
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self._use_native = tilepipe_available()
        self._n_threads = n_threads

    def __len__(self) -> int:
        fn = math.floor if self.drop_remainder else math.ceil
        return fn(len(self.files) / self.batch_size)

    def _batches(self):
        for i in range(len(self)):
            yield self.files[i * self.batch_size : (i + 1) * self.batch_size]

    def __iter__(self) -> Iterator[np.ndarray]:
        if not self._use_native:
            yield from self._numpy_fallback()
            return

        pipe = TilePipe(self.batch_size * self.tile_bytes, n_slots=2, n_threads=self._n_threads)
        try:
            batches = list(self._batches())
            for i, batch in enumerate(batches[:2]):
                self._enqueue(pipe, i % 2, batch)
            for i, batch in enumerate(batches):
                slot = i % 2
                pipe.wait(slot)
                view = pipe.buffer(slot)[: len(batch) * self.tile_bytes]
                out = view.reshape((len(batch),) + self.tile_shape)
                # The final batch's view would dangle the moment the loop
                # finishes (close() frees the slot memory) — it never gets
                # the "next iteration" the zero-copy contract is scoped to,
                # so hand it out as a copy (class docstring).
                yield out.copy() if i == len(batches) - 1 else out
                # Refill this slot with the batch two steps ahead.
                nxt = i + 2
                if nxt < len(batches):
                    self._enqueue(pipe, slot, batches[nxt])
        finally:
            pipe.close()

    def _enqueue(self, pipe: TilePipe, slot: int, batch: Sequence[str]) -> None:
        offsets = [j * self.tile_bytes for j in range(len(batch))]
        lengths = [self.tile_bytes] * len(batch)
        pipe.enqueue(slot, batch, offsets, lengths)

    def _numpy_fallback(self) -> Iterator[np.ndarray]:
        for batch in self._batches():
            out = np.empty((len(batch),) + self.tile_shape, np.uint8)
            for j, path in enumerate(batch):
                out[j] = np.fromfile(path, np.uint8, count=self.tile_bytes).reshape(self.tile_shape)
            yield out
