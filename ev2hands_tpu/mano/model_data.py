"""MANO model-data loading.

Loads the official ``MANO_LEFT.pkl`` / ``MANO_RIGHT.pkl`` assets (chumpy-free:
a stub unpickler extracts raw arrays) into a plain ``ManoModelData`` container,
and provides a deterministic synthetic stand-in for unit tests on machines
without the licensed assets.

Reference behavior being reproduced (not copied):
  * ``src/Ev2Hands/model/utils.py:21`` — manopth ``ManoLayer`` with
    ``use_pca=True, ncomps=6, flat_hand_mean=False``.
  * ``src/Ev2Hands/model/utils.py:38-40`` — the left-hand ``shapedirs``
    first-column sign fix applied when left/right shapedirs are suspiciously
    close (a known bug in the released left MANO asset).
"""

from __future__ import annotations

import dataclasses
import io
import os
import pickle
from typing import Any, Dict

import numpy as np

# MANO kinematic tree: joint k's parent is KINTREE_PARENTS[k].
# Joint order in the raw model: 0 wrist, 1-3 index, 4-6 middle, 7-9 pinky,
# 10-12 ring, 13-15 thumb.
KINTREE_PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14])

# Fingertip vertex ids appended as joints 16..20 (thumb, index, middle, ring,
# pinky tips) — manopth uses vertex 444 for the right middle tip and 445 for
# the left.
TIP_VERTEX_IDS_RIGHT = np.array([745, 317, 444, 556, 673])
TIP_VERTEX_IDS_LEFT = np.array([745, 317, 445, 556, 673])

# Reordering of the 16 MANO joints + 5 tips into the standard 21-joint layout
# (wrist, thumb1..4, index1..4, middle1..4, ring1..4, pinky1..4).
JOINT_REORDER = np.array(
    [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]
)

N_VERTICES = 778
N_FACES = 1538
N_JOINTS_RAW = 16
N_POSE_FULL = 45       # 15 joints * 3 axis-angle dims
N_POSE_BLENDSHAPES = 135  # 15 joints * 9 rotation-matrix entries


@dataclasses.dataclass
class ManoModelData:
    """Raw MANO model arrays for one hand (all float32/int32 numpy)."""

    side: str                       # 'left' | 'right'
    v_template: np.ndarray          # [778, 3]
    shapedirs: np.ndarray           # [778, 3, 10]
    posedirs: np.ndarray            # [778, 3, 135] (15 joints x 9 rotmat entries)
    J_regressor: np.ndarray         # [16, 778]
    lbs_weights: np.ndarray         # [778, 16]
    hands_components: np.ndarray    # [45, 45] PCA basis rows
    hands_mean: np.ndarray          # [45]
    faces: np.ndarray               # [1538, 3] int32

    def __post_init__(self):
        assert self.side in ("left", "right")
        self.v_template = np.asarray(self.v_template, np.float32)
        self.shapedirs = np.asarray(self.shapedirs, np.float32)
        self.posedirs = np.asarray(self.posedirs, np.float32)
        self.J_regressor = np.asarray(self.J_regressor, np.float32)
        self.lbs_weights = np.asarray(self.lbs_weights, np.float32)
        self.hands_components = np.asarray(self.hands_components, np.float32)
        self.hands_mean = np.asarray(self.hands_mean, np.float32)
        self.faces = np.asarray(self.faces, np.int32)

    @property
    def tip_vertex_ids(self) -> np.ndarray:
        return TIP_VERTEX_IDS_LEFT if self.side == "left" else TIP_VERTEX_IDS_RIGHT


class _ChumpyStub:
    """Placeholder reconstructed in place of chumpy objects inside MANO pkls."""

    def __init__(self, *args, **kwargs):
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        self.__dict__.update(state)


class _ManoUnpickler(pickle.Unpickler):
    def find_class(self, module: str, name: str):
        if module.startswith("chumpy") or module.startswith("scipy.sparse"):
            if module.startswith("scipy.sparse"):
                try:
                    return super().find_class(module, name)
                except Exception:
                    return _ChumpyStub
            return _ChumpyStub
        return super().find_class(module, name)


def _to_array(v: Any) -> np.ndarray:
    """Extract a dense numpy array from raw numpy / chumpy-stub / scipy sparse."""
    if isinstance(v, np.ndarray):
        return v
    if hasattr(v, "toarray"):  # scipy sparse
        return np.asarray(v.toarray())
    if isinstance(v, _ChumpyStub):
        d = v.__dict__
        for key in ("x", "a", "v", "r"):
            if key in d:
                return _to_array(d[key])
        raise ValueError(f"cannot extract array from chumpy stub with keys {list(d)}")
    return np.asarray(v)


def load_mano_pkl(path: str, side: str) -> ManoModelData:
    """Parse an official MANO pkl without the chumpy dependency."""
    with open(path, "rb") as f:
        data: Dict[str, Any] = _ManoUnpickler(io.BytesIO(f.read()), encoding="latin1").load()

    shapedirs = _to_array(data["shapedirs"])[:, :, :10]
    return ManoModelData(
        side=side,
        v_template=_to_array(data["v_template"]),
        shapedirs=shapedirs,
        posedirs=_to_array(data["posedirs"]).reshape(N_VERTICES, 3, N_POSE_BLENDSHAPES),
        J_regressor=_to_array(data["J_regressor"]),
        lbs_weights=_to_array(data["weights"]),
        hands_components=_to_array(data["hands_components"]),
        hands_mean=_to_array(data["hands_mean"]),
        faces=_to_array(data["f"]).astype(np.int64),
    )


def apply_shapedirs_fix(left: ManoModelData, right: ManoModelData) -> bool:
    """Left-hand shapedirs x-column sign fix (``model/utils.py:38-40``).

    The released left-hand MANO asset shares the right hand's shapedirs first
    column instead of mirroring it; when detected, negate it in place.
    Returns True if the fix was applied.
    """
    if np.abs(left.shapedirs[:, 0, :] - right.shapedirs[:, 0, :]).sum() < 1:
        left.shapedirs[:, 0, :] = -left.shapedirs[:, 0, :]
        return True
    return False


def load_mano_models(mano_dir: str) -> Dict[str, ManoModelData]:
    """Load both hands from ``{mano_dir}/mano/MANO_{LEFT,RIGHT}.pkl`` (the
    layout the reference expects under ``MANO_PATH``) with fallbacks for flat
    directories."""
    candidates = [os.path.join(mano_dir, "mano"), mano_dir]
    base = next((c for c in candidates if os.path.isfile(os.path.join(c, "MANO_RIGHT.pkl"))), None)
    if base is None:
        raise FileNotFoundError(
            f"MANO_RIGHT.pkl not found under {candidates}; download the MANO "
            "assets or use synthetic_mano_models() for tests"
        )
    left = load_mano_pkl(os.path.join(base, "MANO_LEFT.pkl"), "left")
    right = load_mano_pkl(os.path.join(base, "MANO_RIGHT.pkl"), "right")
    apply_shapedirs_fix(left, right)
    return {"left": left, "right": right}


def synthetic_mano_models(seed: int = 0) -> Dict[str, ManoModelData]:
    """Deterministic synthetic MANO-shaped model data for tests.

    Geometry is a smooth random hand-sized blob with a valid kinematic chain:
    joint rest positions trace five 3-segment finger chains from a wrist, and
    LBS weights are distance-based so posing produces plausible deformations.
    Magnitudes mimic the real model (vertices in meters, ~0.2 m extent).
    """
    rng = np.random.RandomState(seed)

    # Rest joints: wrist at origin; 5 fingers fanning out along +y.
    joints = np.zeros((N_JOINTS_RAW, 3), np.float64)
    finger_roots = [1, 4, 7, 10, 13]
    for fi, root in enumerate(finger_roots):
        direction = np.array([0.02 * (fi - 2), 0.09, 0.002 * fi])
        for s in range(3):
            joints[root + s] = direction * (1.0 + 0.35 * s)

    # Vertices: cloud around the joints.
    owner = rng.randint(0, N_JOINTS_RAW, size=N_VERTICES)
    v_template = joints[owner] + rng.randn(N_VERTICES, 3) * 0.012

    # J_regressor: recovers the joints from v_template via per-joint softmax
    # over inverse distances (rows sum to 1, concentrated near each joint).
    d2 = ((joints[:, None, :] - v_template[None, :, :]) ** 2).sum(-1)
    logits = -d2 / 1e-4
    logits -= logits.max(axis=1, keepdims=True)
    J_regressor = np.exp(logits)
    J_regressor /= J_regressor.sum(axis=1, keepdims=True)
    # Re-solve joints so J_regressor @ v_template == joints exactly.
    joints_eff = J_regressor @ v_template

    # LBS weights: softmax over inverse squared distance to joints.
    w_logits = -d2.T / 2e-3
    w_logits -= w_logits.max(axis=1, keepdims=True)
    lbs_weights = np.exp(w_logits)
    lbs_weights /= lbs_weights.sum(axis=1, keepdims=True)

    shapedirs = rng.randn(N_VERTICES, 3, 10) * 0.004
    posedirs = rng.randn(N_VERTICES, 3, N_POSE_BLENDSHAPES) * 0.0015

    # PCA basis: random orthonormal 45x45 scaled to mimic real components.
    q, _ = np.linalg.qr(rng.randn(N_POSE_FULL, N_POSE_FULL))
    hands_components = q * 2.0
    hands_mean = rng.randn(N_POSE_FULL) * 0.1

    # Faces: triangles over random vertex triples (topology only used for
    # rendering/collision tests; keep index validity).
    faces = rng.randint(0, N_VERTICES, size=(N_FACES, 3)).astype(np.int64)

    def make(side: str) -> ManoModelData:
        sgn = -1.0 if side == "left" else 1.0
        vt = v_template.copy()
        vt[:, 0] *= sgn
        return ManoModelData(
            side=side,
            v_template=vt,
            shapedirs=shapedirs,
            posedirs=posedirs,
            J_regressor=J_regressor,
            lbs_weights=lbs_weights,
            hands_components=hands_components,
            hands_mean=hands_mean,
            faces=faces,
        )

    del joints_eff
    return {"left": make("left"), "right": make("right")}
