"""Streaming demo: real event recording -> sliding-window inference ->
visualization video.

Re-design of ``src/Ev2Hands/demo.py``: batched jitted inference with
double-buffered host prefetch, per-event segmentation painted back to pixel
coordinates, optional mesh render (pyrender if installed, otherwise a
built-in point-splat projection of the predicted MANO vertices through the
demo camera), side-by-side mp4 at 25 fps.
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


def make_demo_step(net: TEHNet, hands, cfg):
    """Jitted step returning everything the visualizer needs: segmentation
    argmax per event, the (denormalized) event pixel coords, and vertices."""
    sensor = cfg.sensor

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
        return {
            "seg": seg,
            "xy": xy,
            "polarity": pol,
            "verts_left": outputs["left"]["vertices"],
            "verts_right": outputs["right"]["vertices"],
        }

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


def render_mesh_frame(verts_left, verts_right, faces_left, faces_right,
                      projection, width, height) -> np.ndarray:
    """Mesh visualization: pyrender offscreen if available, else point-splat
    of projected vertices (keeps the demo dependency-free)."""
    try:  # pragma: no cover - optional native GL path
        import pyrender  # noqa: F401

        return _render_mesh_pyrender(
            verts_left, verts_right, faces_left, faces_right, width, height
        )
    except Exception:
        pass
    img = np.zeros((height, width, 3), np.uint8)
    from ev2hands_tpu.camera import opengl_projection_transform

    for verts, color in ((verts_left, (0, 255, 0)), (verts_right, (255, 0, 0))):
        pts = np.asarray(
            opengl_projection_transform(
                jnp.asarray(projection, jnp.float32), width, height,
                jnp.asarray(verts * 1000.0, jnp.float32),
            )
        )
        x = np.clip(pts[:, 0].astype(int), 0, width - 1)
        y = np.clip(pts[:, 1].astype(int), 0, height - 1)
        img[y, x] = color
    return img


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

    step = make_demo_step(net, hands, cfg)
    stream = RealStream(input_path, cfg.sensor.width, cfg.sensor.height)
    projection = cfg.camera.projection_matrix(cfg.sensor.width, cfg.sensor.height)

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
            mesh_img = render_mesh_frame(
                out["verts_left"][i], out["verts_right"][i],
                faces["left"], faces["right"], projection, W, H,
            )
            writer.write(np.concatenate([events_img, seg_img, mesh_img], axis=1))
            n_frames += 1
        batch_walls.append((time.perf_counter() - t_batch, k))
    writer.release()
    if timings[1:]:
        print(f"inference: {1.0 / np.mean(timings[1:]):.1f} windows/s "
              f"({np.mean(timings[1:]) * 1e3:.2f} ms/window amortized)")
    if batch_walls[1:]:
        # end-to-end steady state = host windowing + inference + rendering +
        # mp4 encode with prefetch overlap; the first batch carries the jit
        # compile and is excluded
        sec = sum(t for t, _ in batch_walls[1:])
        win = sum(kk for _, kk in batch_walls[1:])
        print(f"end-to-end: {win / max(sec, 1e-9):.1f} windows/s "
              f"({win} windows in {sec:.2f}s, steady-state streaming)")
    print(f"wrote {n_frames} frames to {out_path}")
    return out_path, n_frames


def main():
    ap = argparse.ArgumentParser(description="Streaming two-hand demo")
    ap.add_argument("--input", required=True, help=".pickle or .aedat4 recording")
    ap.add_argument("--checkpoint_path", default="")
    ap.add_argument("--out", default="outputs/demo.mp4")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--max_windows", type=int, default=None)
    ap.add_argument("--synthetic_mano", action="store_true")
    args = ap.parse_args()
    run_demo(args.input, args.checkpoint_path, args.out, args.batch_size,
             args.max_windows, args.synthetic_mano)


if __name__ == "__main__":
    main()
