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


# Forearm pixels carry this material id in the rasterizer. The reference's
# segmentation pass leaves forearm meshes with trimesh's default (gray)
# vertex colors (`texture_mesh=False`, twohands.py:84 + manotosmplx.py:270),
# whose channel argmax is 0 — so forearm events are LABELED BACKGROUND while
# still occluding hands and producing events. We reproduce that by mapping
# this id to 0 in the emitted labels.
FOREARM_MATERIAL = 3


def scene_topology(faces: np.ndarray, cfg: Config):
    """Static triangle topology for the realistic two-hand scene:
    [left hand, left forearm, right hand, right forearm].  Forearm faces come
    from :func:`forearm_mesh` (fixed segments/rings), whose vertex layout
    matches :func:`forearm_vertices_jax`."""
    from ev2hands_tpu.datagen.meshes import forearm_mesh

    faces = np.asarray(faces, np.int32)
    V = 778
    fa_v, fa_f = forearm_mesh(np.zeros(3), np.array([1.0, 0, 0]))
    nfa = len(fa_v)

    all_f, all_m = [], []
    offset = 0
    for mat in (1, 2):  # left, right
        all_f.append(faces + offset)
        all_m.append(np.full(len(faces), mat, np.int32))
        offset += V
        if cfg.datagen.add_forearms:
            all_f.append(fa_f + offset)
            all_m.append(np.full(len(fa_f), FOREARM_MATERIAL, np.int32))
            offset += nfa
    return (
        np.concatenate(all_f),
        np.concatenate(all_m),
        offset,   # total vertex count
        nfa,
    )


def make_frame_simulator(
    hands: Dict[str, ManoParams],
    faces: np.ndarray,
    cfg: Config,
    vertex_colors: Optional[np.ndarray] = None,
):
    """Jitted per-frame program: MANO params -> render -> log intensity ->
    ESIM events (compact) + segmentation map.

    With ``cfg.datagen.realistic_scene`` (the default): Gouraud-shaded
    per-vertex colors, forearm meshes tracking the wrists, per-frame
    randomized point lights, and a per-sequence random background — the
    TPU-native equivalents of the reference's textured/lit/composited frames
    (``HandSimulator/utils.py:255-384``, ``twohands.py:56-90``).
    ``vertex_colors`` [V_total, 3] is sampled once per sequence (aug copies
    differ); ``frame_fn`` takes ``(esim_state, params, t_ns, key,
    background)``."""
    from ev2hands_tpu.datagen.meshes import forearm_vertices_jax
    from ev2hands_tpu.datagen.rasterizer import (
        rasterize_scene,
        sample_train_lights,
    )

    W, H = cfg.sensor.width, cfg.sensor.height
    projection = jnp.asarray(
        cfg.camera.projection_matrix(W, H), jnp.float32
    )
    mask = jnp.asarray(bayer_mask(H, W))
    color = jnp.asarray(HAND_COLOR, jnp.float32)
    realistic = cfg.datagen.realistic_scene

    if realistic:
        all_faces_np, materials_np, n_total, _ = scene_topology(faces, cfg)
        all_faces = jnp.asarray(all_faces_np)
        materials = jnp.asarray(materials_np)
        if vertex_colors is None:
            vertex_colors = np.tile(
                np.asarray(HAND_COLOR, np.float32), (n_total, 1)
            )
        assert vertex_colors.shape == (n_total, 3), vertex_colors.shape
        vcolors = jnp.asarray(vertex_colors, jnp.float32)
        ambient = cfg.datagen.ambient

        @jax.jit
        def frame_fn(esim_state, params, t_ns, key, background):
            verts = []
            for side in ("left", "right"):
                p = params[side]
                out = mano_forward(
                    hands[side], p["global_orient"], p["hand_pose"],
                    p["betas"], p["transl"],
                )
                verts.append(out.vertices)
                if cfg.datagen.add_forearms:
                    j = out.joints
                    # down-the-arm direction: wrist minus middle-finger MCP
                    # (simplified from the reference's fixed-elbow targets,
                    # manotosmplx.py:279-289)
                    verts.append(forearm_vertices_jax(j[0], j[0] - j[9]))
            raster = rasterize_scene(
                jnp.concatenate(verts, 0), all_faces, materials, vcolors,
                *sample_train_lights(key), projection, W, H, ambient,
            )
            rgb = jnp.where(
                raster.class_id[..., None] > 0, raster.rgb, background
            ) * 255.0
            log_frame = log_intensity(rgb, mask)
            esim_state, events = esim_step(
                esim_state, log_frame, t_ns,
                cfg.esim.positive_threshold, cfg.esim.negative_threshold,
                cfg.esim.max_events_per_pixel,
                cfg.esim.refractory_period_ns,
            )
            return esim_state, events, raster.class_id

        return frame_fn

    @jax.jit
    def frame_fn(esim_state, params, t_ns, key=None, background=None):
        del key, background  # plain mode: flat shade, constant gray bg
        outs = {}
        for side in ("left", "right"):
            p = params[side]
            outs[side] = mano_forward(
                hands[side], p["global_orient"], p["hand_pose"], p["betas"], p["transl"]
            ).vertices
        raster = render_two_hands(
            outs["left"], outs["right"], faces, projection, W, H
        )
        bg = 159.0 / 255.0
        shaded = raster.intensity[..., None] * color[None, None, :]
        rgb = jnp.where(raster.class_id[..., None] > 0, shaded, bg) * 255.0
        log_frame = log_intensity(rgb, mask)
        esim_state, events = esim_step(
            esim_state, log_frame, t_ns,
            cfg.esim.positive_threshold, cfg.esim.negative_threshold,
            cfg.esim.max_events_per_pixel,
            cfg.esim.refractory_period_ns,
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
    seed: int = 0,
) -> Iterator[Dict]:
    """Run one interpolated sequence through the simulator.

    ``frames``: list (per output frame) of hand dicts with keys
    ``hand_type, pose (48 = 3 global + 45 aa), shape, trans``.
    Yields per-frame dicts: events [N, 4] (x, y, t_ns, p), labels [N],
    camera_hand_info (the anno-pickle entry).

    Per-sequence appearance randomization (``seed`` varies across aug
    copies): skin vertex colors and the composited background are fixed for
    the sequence; point lights re-randomize per frame — matching the
    reference renderer's granularity (``utils.py:317,349``)."""
    from ev2hands_tpu.datagen.meshes import random_skin_vertex_colors
    from ev2hands_tpu.datagen.rasterizer import random_background
    from ev2hands_tpu.mano.layer import create_mano_params

    n_comps = n_pose_comps or cfg.mano.n_pose_comps
    params = {s: create_mano_params(hands_data[s], n_comps) for s in ("left", "right")}
    faces = np.asarray(hands_data["left"].faces, np.int32)

    W, H = cfg.sensor.width, cfg.sensor.height
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    if cfg.datagen.realistic_scene:
        _, _, n_total, _ = scene_topology(faces, cfg)
        vertex_colors = random_skin_vertex_colors(n_total, rng)
        key, k_bg = jax.random.split(key)
        background = random_background(k_bg, H, W, cfg.datagen.background_cells)
    else:
        vertex_colors, background = None, None
    frame_fn = make_frame_simulator(params, faces, cfg, vertex_colors)

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

        state, compact, class_id = frame_fn(
            state, frame_params, jnp.float32(fi * dt_ns),
            jax.random.fold_in(key, fi), background,
        )
        events = expand_compact_events(
            CompactEvents(*[jnp.asarray(x) for x in compact])
        )
        seg = np.asarray(class_id)
        labels = seg[events[:, 1].astype(int), events[:, 0].astype(int)] if len(events) else np.zeros(0)
        # forearm pixels are labeled background, like the reference's
        # segmentation pass (see FOREARM_MATERIAL)
        labels = np.where(labels == FOREARM_MATERIAL, 0, labels)
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
        # per-sequence seed: aug copies of the same capture get different
        # appearance draws (colors / background / lights)
        for frame in simulate_sequence(frames, hands_data, cfg, seed=count):
            part_frames.append(frame)
            n_frames += 1
            if len(part_frames) >= frames_per_part:
                flush()
                if verbose:
                    fps = n_frames / (time.time() - st)
                    print(f"[gen w{worker_id}] {n_frames} frames, {fps:.1f} fps")
    flush()
    return parts
