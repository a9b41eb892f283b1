"""Accuracy-parity report vs the PyTorch reference (BASELINE.md deliverable).

Produces the "MPJPE/MPVPE within 1%" table by running BOTH frameworks on
identical inputs:

  1. loads a released ``best_model_state_dict.pth`` into this framework
     (verified leaf-by-leaf mapping, ``ev2hands_tpu/checkpoint.py``);
  2. streams the Ev2Hands-S split with FULL sequential coverage — every
     window start, like the reference's per-event indexing
     (``/root/reference/src/Ev2Hands/dataset/erpc.py:169``,
     ``evaluate.py:337``) — via ``Ev2HandSReader.sequential_batches``;
  3. computes the device-side ERPC transform ONCE per batch and feeds the
     same post-transform event clouds to both models, so the comparison
     isolates the network+MANO math;
  4. runs the reference TEHNet (imported from ``--reference_dir``, executed,
     never copied) on the same clouds; its regressed MANO parameters go
     through this repo's parity-tested JAX MANO layer (the reference's
     ``manopth`` is not needed);
  5. reports per-framework MPJPE/MPVPE/PCK-AUC against the shared GT and the
     relative gap.

What is and is not verifiable in a sandbox without assets:
  * WITHOUT the released ``.pth`` / MANO pkls / Ev2Hands-S data, run with
    ``--synthetic-demo``: synthetic weights + synthetic MANO + a synthetic
    H5 split exercise the full report end-to-end (that mode is what
    ``tests/test_extras.py::test_parity_report_synthetic`` covers).
  * WITH assets: ``python scripts/parity_report.py --pth <pth>
    --mano_dir <dir-with-MANO_{LEFT,RIGHT}.pkl> --data_root <ev2hands_s>``
    produces the real table.

Usage examples:
  python scripts/parity_report.py --synthetic-demo
  python scripts/parity_report.py --pth savedmodels/best_model_state_dict.pth \
      --mano_dir data/models --data_root data/ev2hands_s --split test
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types
from typing import Dict, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_DEFAULT = "/root/reference/src/Ev2Hands"


def load_reference_tehnet(reference_dir: str):
    """Import the reference model modules standalone (no settings/pyrender)."""
    os.environ["ERPC"] = "1"
    os.environ.pop("MHLNES", None)
    pkg = types.ModuleType("refmodel")
    pkg.__path__ = [os.path.join(reference_dir, "model")]
    sys.modules["refmodel"] = pkg

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodel.{name}", os.path.join(reference_dir, "model", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodel.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("pointnet2_utils")
    return load("TEHNet")


class _StubMano:
    """The reference regressor only calls the MANO layer for vertices/joints;
    we take its regressed *parameters* and run them through our parity-tested
    JAX MANO instead, so ``manopth`` is not required."""

    def __init__(self):
        import torch

        self.shapedirs = torch.zeros(778, 3, 10)
        self.faces = np.zeros((1538, 3), np.int64)

    def __call__(self, global_orient=None, hand_pose=None, betas=None, transl=None):
        import torch

        o = types.SimpleNamespace()
        o.vertices = torch.zeros(global_orient.shape[0], 778, 3)
        o.joints = torch.zeros(global_orient.shape[0], 21, 3)
        return o


def run_report(
    pth: Optional[str],
    mano_dir: str,
    data_root: str,
    split: str = "test",
    batch_size: int = 32,
    stride: int = 1,
    max_batches: Optional[int] = None,
    synthetic: bool = False,
    reference_dir: str = REFERENCE_DEFAULT,
    fps_deterministic: bool = True,
    n_points: int = 2048,
) -> Dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ev2hands_tpu.config import DEFAULT_CONFIG
    from ev2hands_tpu.events.erpc import erpc_batch_transform
    from ev2hands_tpu.events.streams import Ev2HandSReader
    from ev2hands_tpu.evaluate import load_checkpoint_into_state
    from ev2hands_tpu.losses import recompute_gt_joints
    from ev2hands_tpu.metrics import PckAccumulator, mpjpe, mpvpe
    from ev2hands_tpu.model import TEHNet, apply_mano
    from ev2hands_tpu.train import build_hands, create_train_state

    cfg = DEFAULT_CONFIG
    cfg = cfg.replace(
        model=cfg.model.__class__(
            n_points=n_points, fps_deterministic=fps_deterministic
        ),
        mano=cfg.mano.__class__(model_path=mano_dir),
    )
    hands_obj = build_hands(cfg, synthetic=synthetic)
    hands = {s: h.params for s, h in hands_obj.items()}
    net = TEHNet(cfg=cfg.model)
    state = create_train_state(net, cfg, jax.random.PRNGKey(0), optax.adam(1e-3))
    if pth:
        state = load_checkpoint_into_state(pth, state)

    # reference side (optional — needs torch + the mounted reference repo)
    ref_net = None
    if reference_dir and os.path.isdir(reference_dir):
        import torch

        tehnet_mod = load_reference_tehnet(reference_dir)
        ref_net = tehnet_mod.TEHNet(n_pose_params=cfg.mano.n_pose_comps)
        if pth:
            from ev2hands_tpu.checkpoint import load_torch_state_dict

            sd = load_torch_state_dict(pth)
            ref_net.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
                 if not k.endswith("num_batches_tracked")},
                strict=False,
            )
        else:
            # share OUR initialized weights with the reference net so the
            # synthetic-demo mode still compares identical models
            from ev2hands_tpu.checkpoint import flax_to_torch

            sd = flax_to_torch({
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            })
            ref_net.load_state_dict(
                {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
                strict=False,
            )
        ref_net.eval()

    transform = jax.jit(
        lambda ev, lab, key: erpc_batch_transform(
            ev, lab, key, width=cfg.sensor.width, height=cfg.sensor.height,
            n_out=cfg.model.n_points, augment=False,
        )
    )

    def forward_ours(erpc_events):
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc_events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        pj = jnp.stack([outputs["left"]["j3d"], outputs["right"]["j3d"]], 1)
        pv = jnp.stack(
            [outputs["left"]["vertices"], outputs["right"]["vertices"]], 1
        )
        return pj * 1000, pv * 1000

    forward_ours = jax.jit(forward_ours)

    def forward_reference(erpc_events_np):
        """Reference torch forward; regressed params -> our JAX MANO."""
        import torch

        orig_randint = torch.randint

        def zero_randint(*args, **kwargs):
            # pin the reference's random FPS start to index 0 to match our
            # deterministic mode (pointnet2_utils.py:75)
            return torch.zeros_like(orig_randint(*args, **kwargs))

        torch.randint = zero_randint
        try:
            with torch.no_grad():
                out = ref_net(
                    torch.from_numpy(erpc_events_np.transpose(0, 2, 1).copy()),
                    {"left": _StubMano(), "right": _StubMano()},
                )
        finally:
            torch.randint = orig_randint
        sides = {}
        for side in ("left", "right"):
            sides[side] = {
                "global_orient": jnp.asarray(out[side]["global_orient"].numpy()),
                "hand_pose": jnp.asarray(out[side]["hand_pose"].numpy()),
                "betas": jnp.asarray(out[side]["betas"].numpy()),
                "transl": jnp.asarray(out[side]["transl"].numpy()),
            }
        pj, pv = [], []
        for side in ("left", "right"):
            p = sides[side]
            o = hands_obj[side](
                p["global_orient"], p["hand_pose"], p["betas"], p["transl"]
            )
            pj.append(o.joints)
            pv.append(o.vertices)
        return jnp.stack(pj, 1) * 1000, jnp.stack(pv, 1) * 1000

    reader = Ev2HandSReader(f"{data_root}/{split}", cfg.model.n_points)
    total_windows = reader.n_windows(stride)

    acc_ours = PckAccumulator(50, 50.0)
    acc_ref = PckAccumulator(50, 50.0)
    sums = {"ours_mpjpe": 0.0, "ours_mpvpe": 0.0,
            "ref_mpjpe": 0.0, "ref_mpvpe": 0.0}
    frames = 0
    key = jax.random.PRNGKey(0)

    for i, (batch, n_real) in enumerate(
        reader.sequential_batches(batch_size, stride=stride,
                                  max_batches=max_batches)
    ):
        k = jax.random.fold_in(key, i)
        erpc = transform(
            jnp.asarray(batch["events"]), jnp.asarray(batch["labels"]), k
        )
        targets = recompute_gt_joints(
            hands, {"left": batch["left"], "right": batch["right"]}
        )
        gj = jnp.stack([targets["left"]["j3d"], targets["right"]["j3d"]], 1) * 1000
        gv = jnp.stack(
            [targets["left"]["vertices"], targets["right"]["vertices"]], 1
        ) * 1000

        pj, pv = forward_ours(erpc.events)
        pj, pv, gjr, gvr = pj[:n_real], pv[:n_real], gj[:n_real], gv[:n_real]
        acc_ours.update(pj, gjr)
        sums["ours_mpjpe"] += float(jnp.sum(mpjpe(pj, gjr)))
        sums["ours_mpvpe"] += float(jnp.sum(mpvpe(pv, gvr)))

        if ref_net is not None:
            rj, rv = forward_reference(np.asarray(erpc.events))
            rj, rv = rj[:n_real], rv[:n_real]
            acc_ref.update(rj, gjr)
            sums["ref_mpjpe"] += float(jnp.sum(mpjpe(rj, gjr)))
            sums["ref_mpvpe"] += float(jnp.sum(mpvpe(rv, gvr)))

        frames += n_real
        if (i + 1) % 10 == 0:
            print(f"[parity] {frames}/{total_windows} windows", file=sys.stderr)

    n = max(frames, 1)
    ours_metrics, ours_score = acc_ours.result()
    report = {
        "frames": frames,
        "total_windows_in_split": total_windows,
        "stride": stride,
        "ours": {
            "mpjpe_mm": sums["ours_mpjpe"] / n,
            "mpvpe_mm": sums["ours_mpvpe"] / n,
            "auc": ours_metrics["auc"],
            "eval_score": ours_score,
        },
    }
    if ref_net is not None:
        ref_metrics, ref_score = acc_ref.result()
        report["reference"] = {
            "mpjpe_mm": sums["ref_mpjpe"] / n,
            "mpvpe_mm": sums["ref_mpvpe"] / n,
            "auc": ref_metrics["auc"],
            "eval_score": ref_score,
        }
        def gap(a, b):
            return abs(a - b) / max(abs(b), 1e-9) * 100.0

        report["gap_pct"] = {
            "mpjpe": gap(report["ours"]["mpjpe_mm"], report["reference"]["mpjpe_mm"]),
            "mpvpe": gap(report["ours"]["mpvpe_mm"], report["reference"]["mpvpe_mm"]),
        }
        report["within_1pct"] = (
            report["gap_pct"]["mpjpe"] <= 1.0 and report["gap_pct"]["mpvpe"] <= 1.0
        )
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--pth", default=None,
                    help="released best_model_state_dict.pth")
    ap.add_argument("--mano_dir", default="data/models",
                    help="directory with MANO_LEFT.pkl / MANO_RIGHT.pkl")
    ap.add_argument("--data_root", default="data/ev2hands_s")
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--stride", type=int, default=1,
                    help="window-start stride; 1 = every start (full split)")
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--reference_dir", default=REFERENCE_DEFAULT,
                    help="reference repo src/Ev2Hands dir ('' to skip)")
    ap.add_argument("--out", default="outputs/parity_report.json")
    ap.add_argument("--synthetic-demo", action="store_true",
                    help="no assets: synthetic MANO/weights/data end-to-end")
    args = ap.parse_args()

    if args.synthetic_demo:
        import tempfile

        from ev2hands_tpu.events.streams import write_synthetic_ev2hands_s

        tmp = tempfile.mkdtemp(prefix="parity_demo_")
        write_synthetic_ev2hands_s(f"{tmp}/test", n_events=40_000, n_frames=8)
        report = run_report(
            pth=None, mano_dir="", data_root=tmp, split="test",
            batch_size=4, stride=4096, max_batches=3, synthetic=True,
            reference_dir=args.reference_dir, n_points=512,
        )
    else:
        report = run_report(
            args.pth, args.mano_dir, args.data_root, args.split,
            args.batch_size, args.stride, args.max_batches,
            synthetic=False, reference_dir=args.reference_dir,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
