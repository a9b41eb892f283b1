"""ctypes bindings for the native C++ batch assembler (csrc/).

Drop-in accelerated backend for ``Ev2HandSReader``: the decoded event table
lives once in C++-visible memory and fixed-shape batches are assembled by a
pthread pool, replacing per-sample Python/numpy slicing (the role torch
DataLoader worker processes play in the reference, ``train.py:44-54``).

Falls back transparently when the shared library hasn't been built
(``make -C csrc``).
"""

from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
from typing import Dict, Iterator, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "libev2hands_loader.so",
)


def _load_library(build_if_missing: bool = True):
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ev2hands_loader_create.restype = ctypes.c_void_p
    lib.ev2hands_loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
    ]
    lib.ev2hands_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.ev2hands_loader_len.restype = ctypes.c_int64
    lib.ev2hands_loader_len.argtypes = [ctypes.c_void_p]
    lib.ev2hands_loader_fill.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.ev2hands_loader_fill_random.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


_LIB = None


def get_library():
    global _LIB
    if _LIB is None:
        _LIB = _load_library()
    return _LIB


def native_available() -> bool:
    return get_library() is not None


class NativeEv2HandSLoader:
    """Native-backed random-window batch source over an Ev2Hands-S dataset."""

    def __init__(self, root: str, n_events: int = 2048, n_threads: int = 0,
                 seed: int = 0):
        import h5py

        lib = get_library()
        if lib is None:
            raise RuntimeError(
                "native loader library not built; run `make -C csrc` or use "
                "events.streams.Ev2HandSReader"
            )
        self._lib = lib
        self.n_events = n_events
        with open(f"{root}_anno.pickle", "rb") as f:
            self.annotations = pickle.load(f)
        with h5py.File(f"{root}.h5", "r") as f:
            # Decode the table once; ~48 B/event. The loader borrows this.
            self._rows = np.ascontiguousarray(np.asarray(f["event"], np.int64))
        self._handle = lib.ev2hands_loader_create(
            self._rows.ctypes.data_as(ctypes.c_void_p),
            self._rows.shape[0],
            n_threads,
            seed,
        )

    def __len__(self) -> int:
        return int(self._lib.ev2hands_loader_len(self._handle))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.ev2hands_loader_destroy(self._handle)
            self._handle = None

    def fill_batch(
        self, batch_size: int, step: Optional[int] = None,
        starts: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """One raw batch: events [B, N, 4] f32, labels [B, N] i32, plus the
        packed MANO GT resolved from each window's annotation index."""
        from ev2hands_tpu.events.streams import pack_mano_gt, stack_samples

        B, N = batch_size, self.n_events
        events = np.empty((B, N, 4), np.float32)
        labels = np.empty((B, N), np.int32)
        annos = np.empty((B,), np.int64)
        if starts is not None:
            starts = np.ascontiguousarray(starts, np.int64)
            self._lib.ev2hands_loader_fill(
                self._handle, starts.ctypes.data_as(ctypes.c_void_p), B, N,
                events.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p),
                annos.ctypes.data_as(ctypes.c_void_p),
            )
        else:
            starts = np.empty((B,), np.int64)
            self._lib.ev2hands_loader_fill_random(
                self._handle, int(step or 0), B, N,
                starts.ctypes.data_as(ctypes.c_void_p),
                events.ctypes.data_as(ctypes.c_void_p),
                labels.ctypes.data_as(ctypes.c_void_p),
                annos.ctypes.data_as(ctypes.c_void_p),
            )

        gts = stack_samples([pack_mano_gt(self.annotations[int(a)]) for a in annos])
        return {"events": events, "labels": labels, **gts}

    def batches(self, batch_size: int, max_batches: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        step = 0
        while max_batches is None or step < max_batches:
            yield self.fill_batch(batch_size, step=step)
            step += 1
