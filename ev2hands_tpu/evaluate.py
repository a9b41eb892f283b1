"""Ev2Hands-S test evaluation entry point.

Re-design of ``src/Ev2Hands/evaluate.py:317-363``: loads a checkpoint (the
reference's ``.pth`` or a native orbax one), streams the test split, runs the
batched jitted eval step, and writes PCK curves (npy + plots) and an MPJPE/
MPVPE report — the BASELINE.md parity deliverable.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.events.streams import Ev2HandSReader
from ev2hands_tpu.metrics import mpjpe, mpvpe
from ev2hands_tpu.model import TEHNet, apply_mano
from ev2hands_tpu.train import build_hands, create_train_state


def load_checkpoint_into_state(path: str, state, net=None):
    """Load either a torch .pth (reference format) or a native orbax dir."""
    if path.endswith(".pth"):
        from ev2hands_tpu.checkpoint import load_pth_checkpoint

        variables = load_pth_checkpoint(
            path, {"params": state.params, "batch_stats": state.batch_stats}
        )
        return state._replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    from ev2hands_tpu.checkpoint import NativeCheckpointer

    ckptr = NativeCheckpointer(path)
    step = ckptr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {path}")
    restored = ckptr.restore(step, {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "step": 0, "max_eval_score": 0.0,
    })
    return state._replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )


def make_full_eval_step(net: TEHNet, hands, cfg: Config):
    """Eval step also returning vertices for MPVPE."""
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.losses import recompute_gt_joints

    sensor = cfg.sensor

    def eval_fn(state, batch, key):
        erpc = erpc_batch_transform(
            batch["events"], batch["labels"], key,
            width=sensor.width, height=sensor.height,
            n_out=cfg.model.n_points, augment=False,
        )
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        targets = recompute_gt_joints(
            hands, {"left": batch["left"], "right": batch["right"]}
        )
        pred_j = jnp.stack([outputs["left"]["j3d"], outputs["right"]["j3d"]], 1)
        gt_j = jnp.stack([targets["left"]["j3d"], targets["right"]["j3d"]], 1)
        pred_v = jnp.stack([outputs["left"]["vertices"], outputs["right"]["vertices"]], 1)
        gt_v = jnp.stack([targets["left"]["vertices"], targets["right"]["vertices"]], 1)
        return pred_j * 1000, gt_j * 1000, pred_v * 1000, gt_v * 1000

    return jax.jit(eval_fn)


def evaluate_dataset(
    state, net: TEHNet, hands, reader: Ev2HandSReader, cfg: Config,
    max_frames: int = 8192, full_split: bool = False, stride: int = 1,
) -> Dict:
    """Full report: PCK/AUC + MPJPE + MPVPE (mm).

    ``full_split=True`` iterates every window start deterministically
    (``sequential_batches``, matching the reference's per-event window
    indexing, ``dataset/erpc.py:169``) instead of the strided smoke pass;
    the final partial batch is padded + masked, not dropped."""
    from ev2hands_tpu.metrics import PckAccumulator

    step = make_full_eval_step(net, hands, cfg)
    acc = PckAccumulator(num_steps=50, dist_max_mm=50.0)
    mpjpe_sum = mpvpe_sum = 0.0
    key = jax.random.PRNGKey(0)
    bs = cfg.train.eval_batch_size

    if full_split:
        batches = reader.sequential_batches(bs, stride=stride)
    else:
        batches = (
            (b, bs) for b in reader.batches(
                bs, shuffle=False, max_batches=max(1, max_frames // bs)
            )
        )
    for i, (batch, n_real) in enumerate(batches):
        pj, gj, pv, gv = step(state, batch, jax.random.fold_in(key, i))
        pj, gj, pv, gv = pj[:n_real], gj[:n_real], pv[:n_real], gv[:n_real]
        acc.update(pj, gj)
        mpjpe_sum += float(jnp.sum(mpjpe(pj, gj)))
        mpvpe_sum += float(jnp.sum(mpvpe(pv, gv)))
        if not full_split and acc.frames >= max_frames:
            break
    metrics, score = acc.result()
    n = max(acc.frames, 1)
    return {
        "pck3d": {k: v.tolist() for k, v in metrics["pck3d"].items()},
        "auc": metrics["auc"],
        "eval_score": score,
        "mpjpe_mm": mpjpe_sum / n,
        "mpvpe_mm": mpvpe_sum / n,
        "frames": acc.frames,
    }


def save_artifacts(report: Dict, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "metrics.npy"), report, allow_pickle=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(report, f, indent=2)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for name, curve in report["pck3d"].items():
            plt.figure()
            plt.plot(np.arange(len(curve)), curve)
            plt.xlabel("error threshold (mm)")
            plt.ylabel("3D PCK")
            plt.title(f"{name} (AUC {report['auc'][name]})")
            plt.grid(True)
            plt.savefig(os.path.join(out_dir, f"pck3d_{name}.png"), dpi=120)
            plt.close()
    except Exception:
        pass  # plots are best-effort


def main():
    ap = argparse.ArgumentParser(description="Evaluate on Ev2Hands-S test")
    ap.add_argument("--data_root", default=DEFAULT_CONFIG.train.data_root)
    ap.add_argument("--split", default="test")
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--max_frames", type=int, default=8192)
    ap.add_argument("--full_split", action="store_true",
                    help="evaluate EVERY window start (reference coverage)")
    ap.add_argument("--stride", type=int, default=1,
                    help="window-start stride with --full_split")
    ap.add_argument("--out_dir", default="outputs")
    ap.add_argument("--synthetic_mano", action="store_true")
    args = ap.parse_args()

    cfg = DEFAULT_CONFIG
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "eval_batch_size": args.batch_size}))
    hands_obj = build_hands(cfg, synthetic=args.synthetic_mano)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(
        net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3)
    )
    state = load_checkpoint_into_state(args.checkpoint_path, state)

    reader = Ev2HandSReader(f"{args.data_root}/{args.split}", cfg.model.n_points)
    report = evaluate_dataset(state, net, hands, reader, cfg, args.max_frames,
                              full_split=args.full_split, stride=args.stride)
    save_artifacts(report, args.out_dir)
    print(json.dumps({k: report[k] for k in ("auc", "eval_score", "mpjpe_mm", "mpvpe_mm", "frames")}))


if __name__ == "__main__":
    main()
