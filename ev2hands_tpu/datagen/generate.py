"""Synthetic Ev2Hands-S data generation driver.

Re-design of ``HandSimulator/main.py`` / ``main_erpc.py``: for each MANO
sequence, a jitted device program renders both hands (software rasterizer),
converts the shaded frame to Bayer log intensity, and integrates ESIM events
— frames never leave the device; only the compact per-frame event
representation does. The host expands events, labels them from the
segmentation map (``main.py:87``), and writes pickle parts that
``datagen.stitch`` merges into the reference's H5 + anno-pickle layout.

Job sharding across workers matches the reference's SLURM pattern
(``count % n_workers == worker_id``, ``main.py:159``) — set ``n_workers`` /
``worker_id`` for embarrassingly parallel generation.
"""

from __future__ import annotations

import os
import pickle
import time
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.config import Config, DEFAULT_CONFIG, HAND_COLOR
from ev2hands_tpu.datagen.rasterizer import render_two_hands
from ev2hands_tpu.mano.layer import ManoParams, mano_forward
from ev2hands_tpu.ops.esim import (
    CompactEvents,
    bayer_mask,
    esim_init,
    esim_step,
    expand_compact_events,
    log_intensity,
)


def make_frame_simulator(hands: Dict[str, ManoParams], faces: np.ndarray, cfg: Config):
    """Jitted per-frame program: MANO params -> render -> log intensity ->
    ESIM events (compact) + segmentation map."""
    W, H = cfg.sensor.width, cfg.sensor.height
    projection = jnp.asarray(
        cfg.camera.projection_matrix(W, H), jnp.float32
    )
    mask = jnp.asarray(bayer_mask(H, W))
    color = jnp.asarray(HAND_COLOR, jnp.float32)

    @jax.jit
    def frame_fn(esim_state, params, t_ns):
        outs = {}
        for side in ("left", "right"):
            p = params[side]
            outs[side] = mano_forward(
                hands[side], p["global_orient"], p["hand_pose"], p["betas"], p["transl"]
            ).vertices
        raster = render_two_hands(
            outs["left"], outs["right"], faces, projection, W, H
        )
        # shaded hand color over a mid-gray background (the reference
        # composites random backgrounds, ``HandSimulator/utils.py:320-350``)
        bg = 159.0 / 255.0
        shaded = raster.intensity[..., None] * color[None, None, :]
        rgb = jnp.where(raster.class_id[..., None] > 0, shaded, bg) * 255.0
        log_frame = log_intensity(rgb, mask)
        esim_state, events = esim_step(
            esim_state, log_frame, t_ns,
            cfg.esim.positive_threshold, cfg.esim.negative_threshold,
            cfg.esim.max_events_per_pixel,
        )
        return esim_state, events, raster.class_id

    return frame_fn


def pca_from_aa(pose_aa: np.ndarray, model, n_comps: int) -> np.ndarray:
    """45-dim axis-angle -> n_comps PCA coefficients via the inverse basis."""
    from ev2hands_tpu.datagen.interhand import AxisAngleToPca

    return AxisAngleToPca(model)(pose_aa)[..., :n_comps]


def simulate_sequence(
    frames: List[List[Dict]],
    hands_data: Dict,
    cfg: Config = DEFAULT_CONFIG,
    n_pose_comps: Optional[int] = None,
) -> Iterator[Dict]:
    """Run one interpolated sequence through the simulator.

    ``frames``: list (per output frame) of hand dicts with keys
    ``hand_type, pose (48 = 3 global + 45 aa), shape, trans``.
    Yields per-frame dicts: events [N, 4] (x, y, t_ns, p), labels [N],
    camera_hand_info (the anno-pickle entry).
    """
    from ev2hands_tpu.mano.layer import create_mano_params

    n_comps = n_pose_comps or cfg.mano.n_pose_comps
    params = {s: create_mano_params(hands_data[s], n_comps) for s in ("left", "right")}
    faces = np.asarray(hands_data["left"].faces, np.int32)
    frame_fn = make_frame_simulator(params, faces, cfg)

    W, H = cfg.sensor.width, cfg.sensor.height
    state = esim_init(H, W)
    dt_ns = 1e9 / cfg.esim.simulator_fps

    zeros = {
        "global_orient": jnp.zeros(3), "hand_pose": jnp.zeros(n_comps),
        "betas": jnp.zeros(10), "transl": jnp.full(3, 10.0),  # far away
    }

    for fi, hand_list in enumerate(frames):
        frame_params = {"left": dict(zeros), "right": dict(zeros)}
        info = {}
        for hand in hand_list:
            side = hand["hand_type"]
            pose = np.asarray(hand["pose"], np.float32).reshape(-1)
            go, finger_aa = pose[:3], pose[3:48]
            pca = pca_from_aa(finger_aa[None], hands_data[side], n_comps)[0]
            frame_params[side] = {
                "global_orient": jnp.asarray(go),
                "hand_pose": jnp.asarray(pca),
                "betas": jnp.asarray(hand["shape"][:10]),
                "transl": jnp.asarray(hand["trans"]),
            }
            info[side] = {
                "global_orient": go,
                "hand_pose": pca_from_aa(finger_aa[None], hands_data[side], 45)[0],
                "shape": np.asarray(hand["shape"][:10], np.float32),
                "trans": np.asarray(hand["trans"], np.float32),
            }

        state, compact, class_id = frame_fn(state, frame_params, jnp.float32(fi * dt_ns))
        events = expand_compact_events(
            CompactEvents(*[jnp.asarray(x) for x in compact])
        )
        seg = np.asarray(class_id)
        labels = seg[events[:, 1].astype(int), events[:, 0].astype(int)] if len(events) else np.zeros(0)
        yield {
            "events": events.astype(np.float64),
            "event_labels": labels.astype(np.int64),
            "camera_hand_info": info,
        }


def generate(
    sequences: Iterator,
    hands_data: Dict,
    out_dir: str,
    mode: str = "train",
    cfg: Config = DEFAULT_CONFIG,
    n_workers: int = 1,
    worker_id: int = 0,
    frames_per_part: int = 1000,
    verbose: bool = True,
) -> List[str]:
    """Generate pickle parts for a set of sequences with job sharding."""
    os.makedirs(out_dir, exist_ok=True)
    parts: List[str] = []
    part_frames: List[Dict] = []
    part_idx = 0
    st = time.time()
    n_frames = 0

    def flush():
        nonlocal part_idx, part_frames
        if not part_frames:
            return
        path = os.path.join(
            out_dir, f"{mode}_w{worker_id:02d}_part{part_idx:06d}.pickle"
        )
        with open(path, "wb") as f:
            pickle.dump(part_frames, f)
        parts.append(path)
        part_idx += 1
        part_frames = []

    for count, frames in enumerate(sequences):
        if count % n_workers != worker_id:
            continue
        for frame in simulate_sequence(frames, hands_data, cfg):
            part_frames.append(frame)
            n_frames += 1
            if len(part_frames) >= frames_per_part:
                flush()
                if verbose:
                    fps = n_frames / (time.time() - st)
                    print(f"[gen w{worker_id}] {n_frames} frames, {fps:.1f} fps")
    flush()
    return parts
