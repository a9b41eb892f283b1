"""Evaluation metrics: 3-D PCK curves, AUC, MPJPE — vectorized JAX/numpy.

Re-design of the reference's per-frame loops (``evaluate.py:185-241``,
``evaluate_ev2hands_r.py:43-54``): the same curves computed batched in one
fused program instead of a Python loop per frame.

Conventions (matching the reference):
  * joints arrive as [..., 2, 21, 3] (left, right) in millimeters;
  * PCK counts strict ``dist < threshold`` over ``num_steps + 1`` thresholds
    linearly spaced on [0, dist_max_mm];
  * AUC is the trapezoidal area of the PCK curve over its index range,
    normalized by the number of points (``get_auc``, ``evaluate.py:237-241``);
  * "relative" subtracts each hand's root joint; "right-root-relative"
    subtracts the right hand's root from both hands.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pck_from_dists(dists: jax.Array, num_steps: int, dist_max_mm: float) -> jax.Array:
    """dists [..., J] -> pck [..., num_steps+1] averaged over joints."""
    thresholds = jnp.linspace(0.0, dist_max_mm, num_steps + 1)
    hit = (dists[..., None] < thresholds).astype(jnp.float32)
    return jnp.mean(hit, axis=-2)


def _joint_dists(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """[..., 2, 21, 3] pairs -> [..., 42] distances (both hands stacked)."""
    d = jnp.linalg.norm(pred - gt, axis=-1)  # [..., 2, 21]
    return d.reshape(*d.shape[:-2], -1)


def absolute_pck3d(pred, gt, num_steps=50, dist_max_mm=50.0):
    """``absolute_pck3d_frame`` (``evaluate.py:185-197``), batched."""
    return _pck_from_dists(_joint_dists(pred, gt), num_steps, dist_max_mm)


def relative_pck3d(pred, gt, num_steps=50, dist_max_mm=50.0):
    """Root-relative per hand (``evaluate.py:200-216``)."""
    p = pred - pred[..., :, :1, :]
    g = gt - gt[..., :, :1, :]
    return _pck_from_dists(_joint_dists(p, g), num_steps, dist_max_mm)


def right_root_relative_pck3d(pred, gt, num_steps=50, dist_max_mm=50.0):
    """Both hands relative to the right hand's root (``evaluate.py:219-234``)."""
    p = pred - pred[..., 1:, :1, :]
    g = gt - gt[..., 1:, :1, :]
    return _pck_from_dists(_joint_dists(p, g), num_steps, dist_max_mm)


def mpjpe(pred, gt) -> jax.Array:
    """Root-relative mean per-joint position error in the input unit
    (``mepj_frame``, ``evaluate_ev2hands_r.py:43-54``)."""
    p = pred - pred[..., :, :1, :]
    g = gt - gt[..., :, :1, :]
    return jnp.mean(jnp.linalg.norm(p - g, axis=-1), axis=(-2, -1))


def mpvpe(pred_verts, gt_verts) -> jax.Array:
    """Mean per-vertex position error over both hands, [..., 2, V, 3]."""
    return jnp.mean(jnp.linalg.norm(pred_verts - gt_verts, axis=-1), axis=(-2, -1))


def get_auc(pck: np.ndarray) -> float:
    """Normalized trapezoidal AUC, rounded to 2 decimals like the reference
    (``evaluate.py:237-241``: sklearn.metrics.auc == trapezoid rule)."""
    pck = np.asarray(pck)
    n = pck.shape[-1]
    auc = np.trapezoid(pck, np.arange(n)) / n
    return round(float(auc), 2)


class PckAccumulator:
    """Streams batches of (pred, gt) joint pairs and accumulates the three
    PCK curves + frame count (the reference accumulates per frame in
    ``evaluate_net``, ``evaluate.py:249-293``)."""

    def __init__(self, num_steps: int = 50, dist_max_mm: float = 50.0):
        self.num_steps = num_steps
        self.dist_max_mm = dist_max_mm
        self.absolute = np.zeros(num_steps + 1)
        self.relative = np.zeros(num_steps + 1)
        self.right_root_relative = np.zeros(num_steps + 1)
        self.frames = 0
        self._fn = jax.jit(self._batch, static_argnums=())

    def _batch(self, pred, gt):
        kw = dict(num_steps=self.num_steps, dist_max_mm=self.dist_max_mm)
        return (
            jnp.sum(absolute_pck3d(pred, gt, **kw), axis=0),
            jnp.sum(relative_pck3d(pred, gt, **kw), axis=0),
            jnp.sum(right_root_relative_pck3d(pred, gt, **kw), axis=0),
        )

    def update(self, pred_mm, gt_mm):
        a, r, rr = self._fn(pred_mm, gt_mm)
        self.absolute += np.asarray(a)
        self.relative += np.asarray(r)
        self.right_root_relative += np.asarray(rr)
        self.frames += pred_mm.shape[0]

    def result(self) -> Tuple[Dict, float]:
        f = max(self.frames, 1)
        curves = {
            "absolute": self.absolute / f,
            "relative": self.relative / f,
            "right_root_relative": self.right_root_relative / f,
        }
        aucs = {k: get_auc(v) for k, v in curves.items()}
        metrics = {"pck3d": curves, "auc": aucs}
        return metrics, aucs["relative"]  # eval score = relative AUC
