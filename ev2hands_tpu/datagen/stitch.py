"""Stitcher: merge generated pickle parts into the training dataset files.

Re-design of ``HandSimulator/stich_mp.py``: natural-sorted parts are appended
into one ``{mode}.h5`` ``event`` dataset with rows
[x, y, t, p, annotation_index, event_label] plus a flat ``{mode}_anno.pickle``
list of per-frame camera-space MANO params — the exact layout
``events.streams.Ev2HandSReader`` (and the reference's own dataset class)
consumes.
"""

from __future__ import annotations

import os
import pickle
import re
from typing import List

import numpy as np


def _natural_key(s: str):
    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", s)]


def stitch(part_paths: List[str], out_root: str, chunk_rows: int = 1 << 16) -> str:
    """Merge parts into ``{out_root}.h5`` + ``{out_root}_anno.pickle``."""
    import h5py

    part_paths = sorted(part_paths, key=_natural_key)
    os.makedirs(os.path.dirname(out_root) or ".", exist_ok=True)

    annotations = []
    with h5py.File(f"{out_root}.h5", "w") as f:
        dset = f.create_dataset(
            "event", shape=(0, 6), maxshape=(None, 6), dtype=np.int64,
            chunks=(chunk_rows, 6),
        )
        for path in part_paths:
            with open(path, "rb") as pf:
                frames = pickle.load(pf)
            for frame in frames:
                anno_index = len(annotations)
                annotations.append(frame["camera_hand_info"])
                events = np.asarray(frame["events"], np.float64)
                if events.size == 0:
                    continue
                labels = np.asarray(frame["event_labels"], np.int64)
                rows = np.empty((len(events), 6), np.int64)
                rows[:, 0] = events[:, 0]          # x
                rows[:, 1] = events[:, 1]          # y
                rows[:, 2] = events[:, 2]          # t (ns)
                rows[:, 3] = (events[:, 3] > 0)    # p: 1 positive, 0 negative
                rows[:, 4] = anno_index
                rows[:, 5] = labels
                n0 = dset.shape[0]
                dset.resize(n0 + len(rows), axis=0)
                dset[n0:] = rows

    with open(f"{out_root}_anno.pickle", "wb") as f:
        pickle.dump(annotations, f)
    return out_root
