"""Host-side real event-camera stream readers (Ev2Hands-R).

Re-design of the reference's ``EvalutaionStream`` / ``Ev2HandRDataset`` /
``ERPCParser`` (``dataset/evaluation_stream.py``, ``dataset/ev2hands_r.py``):
the host decodes the recording (pickle export or live AEDAT4), undistorts
event coordinates once, and serves *fixed-capacity padded windows* (events +
valid mask + GT joints); the ERPC rasterize/sample/normalize runs on device
(``events.erpc.erpc_real_batch_transform``).

Window semantics match the reference:
  * ``window_at(start)``: take events until elapsed time exceeds
    ``window_ms`` AND at least ``min_events`` collected
    (``evaluation_stream.py:124-146``);
  * sliding evaluation: fixed 2 ms windows advanced by 1 ms
    (``evaluation_stream.py:10-11,165-231``);
  * the window's GT frame is the majority event ``frame_index``
    (``ev2hands_r.py:136-137``);
  * timestamps are converted to milliseconds on load (the reference scales
    by 1e-3 per event at ``evaluation_stream.py:102``).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional

import numpy as np

from ev2hands_tpu.camera import undistort_points

WINDOW_MS = 2.0
OVERLAP_MS = 1.0
MIN_EVENTS = 2048


class RealStream:
    """One recording: events [N, 4|5] (x, y, t_ms, p[, frame_index]),
    GT joints [F, 2, 21, 3] meters, camera dict."""

    def __init__(self, file_path: str, width: int = 346, height: int = 260):
        if file_path.endswith("pickle"):
            with open(file_path, "rb") as f:
                data = pickle.load(f)
            events = np.asarray(data["events"], np.float64)
            self.joints = np.asarray(data["joints"], np.float64) / 1000.0  # mm -> m
            self.camera = data["camera"]
            xy = undistort_points(
                events[:, :2].astype(np.float32),
                self.camera["camera_matrix"], self.camera["dist"], width, height,
            )
            events[:, :2] = xy
        else:  # live AEDAT4 recording
            events = self._load_aedat(file_path)
            self.joints = np.zeros((1, 2, 21, 3))
            self.camera = {"projection_matrix": np.eye(4)[:3, :]}

        events = events.copy()
        events[:, 2] = events[:, 2] * 1e-3  # us -> ms
        self.events = events
        self.has_frame_index = events.shape[1] == 5

    @staticmethod
    def _load_aedat(file_path: str) -> np.ndarray:
        try:
            from dv import AedatFile
        except ImportError as e:  # pragma: no cover - optional dependency
            raise ImportError(
                "reading .aedat4 requires the 'dv' package (pip install dv)"
            ) from e
        with AedatFile(file_path) as f:
            packets = np.hstack([packet for packet in f["events"].numpy()])
        return np.stack(
            [packets["x"], packets["y"], packets["timestamp"], packets["polarity"]], 1
        ).astype(np.float64)

    def __len__(self) -> int:
        return len(self.events)

    def window_at(
        self,
        start: int,
        window_ms: float = WINDOW_MS,
        min_events: int = MIN_EVENTS,
        capacity: int = 4 * MIN_EVENTS,
    ) -> Optional[Dict[str, np.ndarray]]:
        """Fixed-capacity padded window starting at event index ``start``;
        None when the stream is exhausted."""
        ev = self.events
        if start >= len(ev) - 1:
            return None
        t0 = ev[start, 2]
        # events until elapsed > window_ms AND >= min_events
        end_time = np.searchsorted(ev[:, 2], t0 + window_ms, side="right")
        end = max(end_time, start + min_events)
        end = min(end, len(ev), start + capacity)
        if end - start < 2:
            return None

        chunk = ev[start:end]
        n = end - start
        out = np.zeros((capacity, 4), np.float32)
        out[:n, 0] = chunk[:, 0]
        out[:n, 1] = chunk[:, 1]
        out[:n, 2] = chunk[:, 2] - chunk[0, 2]  # t origin shift
        out[:n, 3] = chunk[:, 3]
        valid = np.zeros(capacity, bool)
        valid[:n] = True

        if self.has_frame_index:
            fi = chunk[:, 4].astype(np.int64)
            values, counts = np.unique(fi, return_counts=True)
            frame_index = int(values[np.argmax(counts)])
            # the reference's sequential evaluator keeps the FIRST unique
            # frame's joints as GT (`joints_3d[:1]` over the sorted unique
            # list, evaluation_stream.py:150,184) while reporting the
            # majority frame as `frame_index` (:222-223); expose both
            first_frame_index = int(values[0])
        else:
            frame_index = first_frame_index = -1

        return {
            "events": out,
            "event_valid": valid,
            "n_events": np.int32(n),
            "frame_index": np.int64(frame_index),
            "first_frame_index": np.int64(first_frame_index),
            "end": int(end),
        }

    def joints_3d(self, frame_index: int) -> np.ndarray:
        """[2, 21, 3] meters; raises IndexError past the mocap end."""
        if frame_index >= len(self.joints) or frame_index < 0:
            raise IndexError(frame_index)
        return np.asarray(self.joints[frame_index], np.float32)

    def joints_2d(self, frame_index: int) -> np.ndarray:
        """[2, 21, 2] pixels via the pinhole camera (``evaluation_stream.py:159-162``)."""
        j3d = self.joints_3d(frame_index) * 1000.0
        p = j3d @ np.asarray(self.camera["camera_matrix"], np.float32).T
        return (p[..., :2] / p[..., 2:3]).astype(np.float32)

    def sliding_windows(
        self, window_ms: float = WINDOW_MS, advance_ms: float = OVERLAP_MS,
        capacity: int = 4 * MIN_EVENTS,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Sequential evaluation iterator (the reference's ``ERPCParser``):
        ``window_ms`` windows advanced by ``advance_ms``."""
        ev = self.events
        start = 0
        while True:
            w = self.window_at(start, window_ms, MIN_EVENTS, capacity)
            if w is None:
                return
            try:
                # GT = first unique frame, matching the reference R-evaluator
                # (evaluation_stream.py:184); `frame_index` stays majority
                w["j3d"] = self.joints_3d(int(w["first_frame_index"]))
            except IndexError:
                return
            yield w
            t0 = ev[start, 2]
            nxt = int(np.searchsorted(ev[:, 2], t0 + advance_ms, side="right"))
            start = max(nxt, start + 1)


class Ev2HandRReader:
    """Random-window training reader over a directory of recordings
    (``Ev2HandRDataset``, ``dataset/ev2hands_r.py:56-184``): random window
    length 1-2 ms per sample, GT j3d/j2d from the majority frame."""

    def __init__(self, root: str, seed: int = 0, capacity: int = 4 * MIN_EVENTS):
        paths = [root] if not os.path.isdir(root) else [
            os.path.join(root, f) for f in sorted(os.listdir(root))
        ]
        self.streams: List[RealStream] = [RealStream(p) for p in paths]
        self.capacity = capacity
        self.rng = np.random.RandomState(seed)
        self._sizes = np.array([len(s) for s in self.streams])

    def sample(self) -> Dict[str, np.ndarray]:
        while True:
            sid = self.rng.randint(len(self.streams))
            stream = self.streams[sid]
            start = self.rng.randint(0, max(len(stream) - MIN_EVENTS, 1))
            window_ms = float(self.rng.randint(1, int(WINDOW_MS) + 1))
            w = stream.window_at(start, window_ms, MIN_EVENTS, self.capacity)
            if w is None:
                continue
            try:
                j3d = stream.joints_3d(int(w["frame_index"]))
                j2d = stream.joints_2d(int(w["frame_index"]))
            except IndexError:
                continue
            return {
                "events": w["events"],
                "event_valid": w["event_valid"],
                "left": {"j3d": j3d[0], "j2d": j2d[0], "valid": np.float32(1.0)},
                "right": {"j3d": j3d[1], "j2d": j2d[1], "valid": np.float32(1.0)},
                "handedness": np.ones(2, np.int32),
            }

    def batches(self, batch_size: int, max_batches: Optional[int] = None):
        from ev2hands_tpu.events.streams import stack_samples

        count = 0
        while max_batches is None or count < max_batches:
            yield stack_samples([self.sample() for _ in range(batch_size)])
            count += 1


def write_synthetic_ev2hands_r(
    path: str, n_events: int = 100_000, n_frames: int = 50,
    width: int = 346, height: int = 260, seed: int = 0,
) -> str:
    """Synthetic Ev2Hands-R pickle in the reference export format (events in
    microseconds, joints in mm, camera with distortion)."""
    rng = np.random.RandomState(seed)
    t_us = np.sort(rng.randint(0, n_frames * 40_000, n_events))  # ~25 fps mocap
    frame_index = np.clip(t_us // 40_000, 0, n_frames - 1)
    events = np.stack([
        rng.randint(0, width, n_events),
        rng.randint(0, height, n_events),
        t_us,
        rng.randint(0, 2, n_events),
        frame_index,
    ], 1).astype(np.float64)

    joints = rng.randn(n_frames, 2, 21, 3) * 30 + np.array([0, 0, 400.0])  # mm
    camera_matrix = np.array([[320.0, 0, width / 2], [0, 320.0, height / 2], [0, 0, 1]])
    data = {
        "events": events,
        "joints": joints,
        "camera": {
            "camera_matrix": camera_matrix,
            "dist": np.zeros(5),
            "projection_matrix": camera_matrix @ np.eye(4)[:3],
        },
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return path


def sliding_window_batches(
    stream: "RealStream",
    batch_size: int,
    max_windows: Optional[int] = None,
    with_gt: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Host-side batch assembly for the streaming inference paths.

    Collects ``stream.sliding_windows()`` into fixed-size batches for the
    static-shape jitted step; the final partial batch is padded by repeating
    its last window, with ``n_valid`` giving the real count (no window is
    dropped). Designed to run inside ``events.streams.Prefetcher`` so window
    assembly (pickle slicing, undistortion, padding) overlaps with device
    compute — the reference gets the same overlap from DataLoader workers
    (``evaluate_ev2hands_r.py:187``, ``demo.py:107-111``).

    Windows are yielded strictly in stream order; total yielded
    ``n_valid`` ≈ ``max_windows`` with the same stopping rule as the
    previous inline loops (stop once the running count reaches it, scoring
    whatever is buffered).
    """
    buf: List[Dict[str, np.ndarray]] = []
    produced = 0

    def batch() -> Dict[str, np.ndarray]:
        k = len(buf)
        padded = buf + [buf[-1]] * (batch_size - k)
        out = {
            "events": np.stack([w["events"] for w in padded]),
            "event_valid": np.stack([w["event_valid"] for w in padded]),
            "n_valid": k,
        }
        if with_gt:
            out["j3d"] = np.stack([w["j3d"] for w in padded])
        return out

    for w in stream.sliding_windows():
        buf.append(w)
        if len(buf) == batch_size:
            yield batch()
            produced += batch_size
            buf = []
        if max_windows and produced + len(buf) >= max_windows:
            break
    if buf:
        yield batch()
