"""Camera / projection math (JAX + numpy host helpers).

Re-design of the reference's ``src/camera.py``: the OpenGL clip-space
projection used by the 2-D reprojection loss, the OpenCV-style pinhole
projections used by the real-data path, and the InterHand calibration-file
parser. Device functions are pure jnp and fixed-shape.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def opengl_projection_transform(
    projection_matrix: jax.Array,  # [4, 4]
    width: int,
    height: int,
    points: jax.Array,             # [..., 3]
) -> jax.Array:
    """Project camera-space points through an OpenGL projection matrix to
    pixel coordinates (reference: ``camera.py:10-38``): homogeneous divide,
    then ``(1 - ndc) * 0.5 * (W, H)``. Returns [..., 2]."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    h = jnp.concatenate([points, ones], axis=-1)
    h = jnp.einsum("ij,...j->...i", projection_matrix, h)
    h = h / h[..., -1:]
    h = (1.0 - h) * 0.5
    return jnp.stack([h[..., 0] * width, h[..., 1] * height], axis=-1)


def opencv_camera_view_to_screen_space(
    camera_matrix: jax.Array,  # [3, 3]
    points: jax.Array,         # [..., 3] camera-space
) -> jax.Array:
    """Pinhole projection (reference: ``camera.py:56-70``). Returns [..., 2]."""
    p = jnp.einsum("ij,...j->...i", camera_matrix, points)
    p = p / p[..., -1:]
    return p[..., :2]


def opencv_global_to_camera_view(
    extrinsic: jax.Array,  # [3, 4]
    points: jax.Array,     # [..., 3] world
) -> jax.Array:
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    h = jnp.concatenate([points, ones], axis=-1)
    return jnp.einsum("ij,...j->...i", extrinsic, h)


def p3d_to_p2d(
    j3d: jax.Array,     # [..., N, 3]
    scale: jax.Array,   # [..., 2]
    translation: jax.Array,  # [..., 2]
) -> jax.Array:
    """Scaled orthographic projection after a fixed 180-degree x-axis flip
    (the reference wrapper's ``P3dtoP2d``, ``model/model.py:36-49``)."""
    flipped = jnp.stack([j3d[..., 0], -j3d[..., 1]], axis=-1)  # rot180 about x
    return translation[..., None, :] + scale[..., None, :] * flipped


# ---------------------------------------------------------------------------
# Host-side: undistortion + calibration parsing (real-data ingest)
# ---------------------------------------------------------------------------

def undistort_points(
    xy: np.ndarray, camera_matrix: np.ndarray, dist: np.ndarray,
    width: int, height: int,
) -> np.ndarray:
    """cv2 undistort-and-reproject with clipping (``camera.py:157-168``)."""
    import cv2

    und = cv2.undistortPoints(
        xy.reshape(-1, 1, 2).astype(np.float32), camera_matrix, dist
    ).reshape(-1, 2)
    und = np.c_[und, np.ones_like(und[:, 0])] @ camera_matrix.T
    und = und[:, :2]
    und[:, 0] = np.clip(und[:, 0], 0, width - 1)
    und[:, 1] = np.clip(und[:, 1], 0, height - 1)
    return und


def _extract_params(lines: List[str], idx: int, resolution) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Parse one camera block of an InterHand-style calibration file
    (``camera.py:88-133``)."""
    distortion = np.fromstring(lines[idx + 11][15:], dtype=np.float64, sep="\t")
    extrinsic = np.array(
        [np.fromstring(lines[idx + j][1:], dtype=np.float64, sep="\t") for j in (16, 17, 18)]
    )
    intrinsic = np.array(
        [np.fromstring(lines[idx + j][1:], dtype=np.float64, sep="\t") for j in (20, 21, 22)]
    )
    w, _h = resolution
    fx, fy = np.diag(intrinsic)[:2] * w
    cx, cy = intrinsic[:2, 2].ravel() * w
    pixel_aspect = np.fromstring(lines[idx + 8][15:26], dtype=np.float64, sep="\t")[0]
    mtx = np.array([[fx, 0, cx], [0, fy * pixel_aspect, cy], [0, 0, 1]])
    return mtx, distortion, extrinsic


def create_cv2_camera(
    file_path: Union[str, Path], image_shape, camera_index: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Load (camera_matrix, dist, extrinsic, projection) for one camera from a
    calibration file (``camera.py:136-154``)."""
    lines = Path(file_path).read_text().splitlines(keepends=True)
    starts = [i for i, line in enumerate(lines) if re.search(r"camera.+(\d{1,})\s.*\.avi", line)]
    start = starts[camera_index]
    camera_matrix, dist, extrinsic = _extract_params(lines, start, image_shape)
    projection = camera_matrix @ extrinsic
    return camera_matrix, dist, extrinsic, projection
