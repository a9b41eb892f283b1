"""Streaming demo: real event recording -> sliding-window inference ->
visualization video.

Re-design of ``src/Ev2Hands/demo.py``: batched jitted inference with
double-buffered host prefetch, per-event segmentation painted back to pixel
coordinates, a mesh pane (device-projected vertex point-splat, on-device
z-buffered flat-shaded rasterization via the data generator's XLA renderer,
or pyrender offscreen GL — ``--mesh_render``), side-by-side mp4 at 25 fps.
All per-frame device math lives in ONE jitted step; the host loop is numpy
paints + mp4 encode, overlapped with inference by the prefetcher.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ev2hands_tpu.config import DEFAULT_CONFIG
from ev2hands_tpu.events.erpc import erpc_real_batch_transform
from ev2hands_tpu.events.real_streams import RealStream
from ev2hands_tpu.model import TEHNet, apply_mano
from ev2hands_tpu.train import build_hands, create_train_state


def make_demo_step(net: TEHNet, hands, cfg, faces=None, mesh_render="splat"):
    """Jitted step returning everything the visualizer needs: segmentation
    argmax per event, the (denormalized) event pixel coords, vertices, and
    the *projected* vertex pixel coords (``px_left``/``px_right``).

    Projection runs on-device inside the one jitted program: calling the
    un-jitted ``opengl_projection_transform`` per frame from the host loop
    dispatched dozens of small ops per frame over the ~25 ms/dispatch device
    tunnel and dominated the demo's end-to-end time (measured 0.4 windows/s;
    the reference keeps its render math inside torch on-GPU, ``demo.py``).

    ``mesh_render="device"`` additionally z-buffer-rasterizes both predicted
    MANO meshes on-device (flat-shaded, ``datagen/rasterizer.rasterize_mesh``
    — the same XLA renderer the data generator uses) and returns per-window
    ``mesh_cls`` [B, H, W] / ``mesh_shade`` [B, H, W]; requires ``faces``."""
    sensor = cfg.sensor
    W, H = sensor.width, sensor.height
    from ev2hands_tpu.camera import opengl_projection_transform

    projection = jnp.asarray(
        cfg.camera.projection_matrix(W, H), jnp.float32)
    if mesh_render == "device":
        from ev2hands_tpu.datagen.rasterizer import rasterize_mesh

        fl = np.asarray(faces["left"], np.int32)
        fr = np.asarray(faces["right"], np.int32)
        # opengl_projection_transform maps x -> (1 - ndc_x) * 0.5 * W while
        # the rasterizer maps x -> (ndc_x + 1) * 0.5 * W; negate the
        # projection's first row so both panes share the reference's
        # orientation (camera.py:10-38).
        raster_proj = projection * jnp.asarray(
            [[-1.0], [1.0], [1.0], [1.0]], jnp.float32)

    def fn(state, events, valid, key):
        erpc = erpc_real_batch_transform(
            events, valid, key,
            width=sensor.width, height=sensor.height, n_out=cfg.model.n_points,
        )
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        seg = jnp.argmax(outputs["class_logits"], axis=-1)  # [B, N]
        xy = (erpc.events[..., :2] + 1.0) * 0.5 * jnp.asarray(
            [sensor.width, sensor.height], jnp.float32
        )
        pol = erpc.events[..., 3:5]
        vl = outputs["left"]["vertices"]                    # [B, V, 3] meters
        vr = outputs["right"]["vertices"]
        out = {
            "seg": seg,
            "xy": xy,
            "polarity": pol,
            "px_left": opengl_projection_transform(projection, W, H, vl * 1e3),
            "px_right": opengl_projection_transform(projection, W, H, vr * 1e3),
        }
        if mesh_render == "device":
            n_v = vl.shape[1]
            all_faces = jnp.concatenate(
                [jnp.asarray(fl), jnp.asarray(fr) + n_v], axis=0)
            materials = jnp.concatenate([
                jnp.ones((len(fl),), jnp.int32),
                jnp.full((len(fr),), 2, jnp.int32),
            ])

            def render_one(verts):
                r = rasterize_mesh(
                    verts, all_faces, materials, raster_proj,
                    width=W, height=H)
                return r.class_id, r.intensity

            # lax.map (not vmap): bounds the rasterizer's [T, W] row
            # working set to one window at a time instead of B at once
            cls, shade = jax.lax.map(
                render_one,
                jnp.concatenate([vl, vr], axis=1) * 1e3)
            out["mesh_cls"] = cls
            out["mesh_shade"] = shade
        else:
            out["verts_left"] = vl
            out["verts_right"] = vr
        return out

    return jax.jit(fn)


def render_event_frame(xy, polarity, width, height) -> np.ndarray:
    """Red/green positive/negative event visualization (``erpc.py:235-240``)."""
    img = np.zeros((height, width, 3), np.uint8)
    x = np.clip(xy[:, 0].astype(int), 0, width - 1)
    y = np.clip(xy[:, 1].astype(int), 0, height - 1)
    total = polarity.sum(-1).clip(min=1)
    img[y, x, 2] = (polarity[:, 0] / total * 255).astype(np.uint8)  # pos -> R (BGR)
    img[y, x, 1] = (polarity[:, 1] / total * 255).astype(np.uint8)  # neg -> G
    return img


def render_segmentation(xy, seg, width, height) -> np.ndarray:
    """Left=green, right=blue, noise=white (``settings.py:40``, ``demo.py``)."""
    img = np.zeros((height, width, 3), np.uint8)
    x = np.clip(xy[:, 0].astype(int), 0, width - 1)
    y = np.clip(xy[:, 1].astype(int), 0, height - 1)
    colors = np.array(
        [[0, 0, 0],
         [0, 255, 0],     # left (BGR green)
         [255, 0, 0],     # right (BGR blue)
         [255, 255, 255]], np.uint8
    )
    img[y, x] = colors[np.clip(seg, 0, 3)]
    return img


def paint_mesh_splat(px_left, px_right, width, height) -> np.ndarray:
    """Point-splat the device-projected vertex pixel coords (pure numpy —
    the projection itself ran inside the jitted step)."""
    img = np.zeros((height, width, 3), np.uint8)
    for pts, color in ((px_left, (0, 255, 0)), (px_right, (255, 0, 0))):
        x = np.clip(pts[:, 0].astype(int), 0, width - 1)
        y = np.clip(pts[:, 1].astype(int), 0, height - 1)
        img[y, x] = color
    return img


def colorize_mesh_raster(cls, shade) -> np.ndarray:
    """Colorize the device-rasterized mesh pane: left=green, right=blue
    (BGR, matching the segmentation colors, ``settings.py:40``), modulated
    by the flat-shaded intensity."""
    colors = np.array([[0, 0, 0], [0, 255, 0], [255, 0, 0]], np.float32)
    img = colors[np.clip(cls, 0, 2)] * shade[..., None]
    return np.clip(img, 0, 255).astype(np.uint8)


def _render_mesh_pyrender(vl, vr, fl, fr, width, height):  # pragma: no cover
    import pyrender
    import trimesh

    scene = pyrender.Scene()
    for v, f in ((vl, fl), (vr, fr)):
        mesh = pyrender.Mesh.from_trimesh(trimesh.Trimesh(v, f))
        scene.add(mesh)
    cam = pyrender.PerspectiveCamera(yfov=np.deg2rad(30), aspectRatio=width / height)
    scene.add(cam, pose=np.eye(4))
    r = pyrender.OffscreenRenderer(width, height)
    color, _ = r.render(scene)
    r.delete()
    return color[..., ::-1].copy()


def run_demo(
    input_path: str,
    checkpoint_path: str,
    out_path: str = "outputs/demo.mp4",
    batch_size: int = 8,
    max_windows: Optional[int] = None,
    synthetic_mano: bool = False,
    fps: int = 25,
    mesh_render: str = "splat",
    report_path: str = "",
):
    cfg = DEFAULT_CONFIG
    hands_obj = build_hands(cfg, synthetic=synthetic_mano)
    hands = {s: h.params for s, h in hands_obj.items()}
    faces = {s: np.asarray(h.faces) for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3))
    if checkpoint_path:
        from ev2hands_tpu.evaluate import load_checkpoint_into_state

        state = load_checkpoint_into_state(checkpoint_path, state)

    step = make_demo_step(net, hands, cfg, faces=faces, mesh_render=mesh_render)
    stream = RealStream(input_path, cfg.sensor.width, cfg.sensor.height)

    import cv2

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    W, H = cfg.sensor.width, cfg.sensor.height
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (3 * W, H)
    )

    key = jax.random.PRNGKey(0)
    n_frames = 0
    timings = []
    batch_walls = []  # (wall seconds, windows) per batch, everything included

    # window assembly runs in a background thread and overlaps with device
    # inference + video encoding (the reference's DataLoader-worker overlap,
    # demo.py:107-111); the tail batch arrives padded with n_valid set
    from ev2hands_tpu.events.real_streams import sliding_window_batches
    from ev2hands_tpu.events.streams import Prefetcher

    batches = Prefetcher(
        sliding_window_batches(stream, batch_size, max_windows, with_gt=False)
    )
    for b in batches:
        t_batch = time.perf_counter()
        k = b["n_valid"]
        ev = jnp.asarray(b["events"])
        va = jnp.asarray(b["event_valid"])
        t0 = time.perf_counter()
        out = step(state, ev, va, jax.random.fold_in(key, n_frames))
        out = jax.device_get(out)
        timings.append((time.perf_counter() - t0) / k)
        for i in range(k):
            events_img = render_event_frame(out["xy"][i], out["polarity"][i], W, H)
            seg_img = render_segmentation(out["xy"][i], out["seg"][i], W, H)
            if mesh_render == "device":
                mesh_img = colorize_mesh_raster(
                    out["mesh_cls"][i], out["mesh_shade"][i])
            elif mesh_render == "pyrender":  # pragma: no cover - optional GL
                mesh_img = _render_mesh_pyrender(
                    out["verts_left"][i], out["verts_right"][i],
                    faces["left"], faces["right"], W, H)
            else:
                mesh_img = paint_mesh_splat(
                    out["px_left"][i], out["px_right"][i], W, H)
            writer.write(np.concatenate([events_img, seg_img, mesh_img], axis=1))
            n_frames += 1
        batch_walls.append((time.perf_counter() - t_batch, k))
    writer.release()
    report = {"batch_size": batch_size, "mesh_render": mesh_render,
              "frames": n_frames}
    if timings[1:]:
        report["inference_windows_per_s"] = round(
            1.0 / float(np.mean(timings[1:])), 1)
        print(f"inference: {report['inference_windows_per_s']} windows/s "
              f"({np.mean(timings[1:]) * 1e3:.2f} ms/window amortized)")
    if batch_walls[1:]:
        # end-to-end steady state = host windowing + inference + rendering +
        # mp4 encode with prefetch overlap; the first batch carries the jit
        # compile and is excluded
        sec = sum(t for t, _ in batch_walls[1:])
        win = sum(kk for _, kk in batch_walls[1:])
        report["steady_state_windows_per_s"] = round(win / max(sec, 1e-9), 1)
        report["steady_state_windows"] = win
        report["steady_state_seconds"] = round(sec, 2)
        print(f"end-to-end: {report['steady_state_windows_per_s']} windows/s "
              f"({win} windows in {sec:.2f}s, steady-state streaming)")
    print(f"wrote {n_frames} frames to {out_path}")
    if report_path:
        import json

        with open(report_path, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
    return out_path, n_frames


def main():
    ap = argparse.ArgumentParser(description="Streaming two-hand demo")
    ap.add_argument("--input", required=True, help=".pickle or .aedat4 recording")
    ap.add_argument("--checkpoint_path", default="")
    ap.add_argument("--out", default="outputs/demo.mp4")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_windows", type=int, default=None)
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--mesh_render", default="splat",
                    choices=("splat", "device", "pyrender"),
                    help="mesh pane: vertex point-splat (device-projected), "
                         "on-device z-buffered flat-shaded rasterization, or "
                         "pyrender offscreen GL if installed")
    ap.add_argument("--report", default="",
                    help="write steady-state throughput JSON here")
    args = ap.parse_args()
    run_demo(args.input, args.checkpoint_path, args.out, args.batch_size,
             args.max_windows, args.synthetic_mano,
             mesh_render=args.mesh_render, report_path=args.report)


if __name__ == "__main__":
    main()
