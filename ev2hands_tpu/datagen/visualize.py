"""Dataset QA visualizer: replay a generated Ev2Hands-S dataset next to its
re-posed GT MANO meshes.

Re-design of ``HandSimulator/visualize_data.py`` for headless use: instead of
an OpenCV window it writes a side-by-side (event frame | GT segmentation |
re-posed GT mesh render) mp4, using the same software rasterizer as the data
generator — so a generated dataset can be eyeballed anywhere.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.datagen.rasterizer import render_two_hands
from ev2hands_tpu.events.streams import Ev2HandSReader
from ev2hands_tpu.mano.layer import mano_forward


def replay(
    root: str,
    hands: Dict,
    out_path: str = "outputs/dataset_qa.mp4",
    cfg: Config = DEFAULT_CONFIG,
    n_windows: int = 50,
    window: int = 2048,
    fps: int = 10,
) -> str:
    """hands: {'left','right'} ManoHand objects (see ``train.build_hands``)."""
    import cv2

    reader = Ev2HandSReader(root, n_events=window)
    W, H = cfg.sensor.width, cfg.sensor.height
    projection = jnp.asarray(cfg.camera.projection_matrix(W, H), jnp.float32)
    faces = np.asarray(hands["left"].faces, np.int32)

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (3 * W, H))

    colors = np.array(
        [[0, 0, 0], [0, 255, 0], [255, 0, 0], [255, 255, 255]], np.uint8
    )
    stride = max((len(reader) - window) // max(n_windows, 1), 1)
    params = {s: h.params for s, h in hands.items()}

    @jax.jit
    def gt_render(mano):
        verts = {}
        for side in ("left", "right"):
            m = mano[side]
            verts[side] = mano_forward(
                params[side], m["global_orient"],
                m["hand_pose"][: params[side].pose_basis.shape[0]],
                m["shape"], m["trans"],
            ).vertices
        return render_two_hands(verts["left"], verts["right"], faces, projection, W, H)

    for i in range(n_windows):
        w = reader.window(i * stride)
        ev = w["events"]
        x = np.clip(ev[:, 0].astype(int), 0, W - 1)
        y = np.clip(ev[:, 1].astype(int), 0, H - 1)

        event_img = np.zeros((H, W, 3), np.uint8)
        event_img[y, x, 2] = np.where(ev[:, 3] > 0, 255, 0)
        event_img[y, x, 1] = np.where(ev[:, 3] <= 0, 255, 0)

        seg_img = np.zeros((H, W, 3), np.uint8)
        seg_img[y, x] = colors[np.clip(w["labels"], 0, 3)]

        mano = {s: {k: jnp.asarray(w[s][k]) for k in ("global_orient", "hand_pose", "shape", "trans")}
                for s in ("left", "right")}
        raster = jax.device_get(gt_render(mano))
        mesh_img = (colors[np.clip(raster.class_id, 0, 3)].astype(np.float32)
                    * raster.intensity[..., None]).astype(np.uint8)

        writer.write(np.concatenate([event_img, seg_img, mesh_img], axis=1))
    writer.release()
    return out_path


def main():
    ap = argparse.ArgumentParser(description="Replay a generated dataset for QA")
    ap.add_argument("--root", required=True, help="dataset root (without .h5)")
    ap.add_argument("--out", default="outputs/dataset_qa.mp4")
    ap.add_argument("--n_windows", type=int, default=50)
    ap.add_argument("--synthetic_mano", action="store_true")
    args = ap.parse_args()

    from ev2hands_tpu.train import build_hands

    hands = build_hands(DEFAULT_CONFIG, synthetic=args.synthetic_mano)
    path = replay(args.root, hands, args.out, n_windows=args.n_windows)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
