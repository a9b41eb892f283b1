"""Training: one jitted XLA program per step (fwd + MANO + losses + bwd +
Adam), data-parallel over a device mesh.

Re-design of the reference trainer (``src/Ev2Hands/train.py:22-151``):
  * the DataLoader workers' numpy transform moves on-device — the step
    consumes *raw* event windows and runs ERPC rasterize/augment/resample
    inside the compiled program;
  * ``nn.DataParallel`` becomes a ``Mesh`` + sharded batch + replicated
    params; XLA inserts the gradient all-reduce over ICI;
  * checkpoint-on-best with orbax replaces ``torch.save``
    (``train.py:115-126``); the released ``.pth`` can warm-start via
    ``checkpoint.load_pth_checkpoint``.
"""

from __future__ import annotations

import argparse
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.events.erpc import erpc_batch_transform
from ev2hands_tpu.events.streams import Ev2HandSReader, Prefetcher
from ev2hands_tpu.losses import CollisionContext, mano_losses, total_loss
from ev2hands_tpu.mano import create_mano_hands, synthetic_mano_models
from ev2hands_tpu.mano.layer import ManoParams
from ev2hands_tpu.metrics import PckAccumulator
from ev2hands_tpu.model import TEHNet, apply_mano
from ev2hands_tpu.ops.collision import build_adjacency_mask, build_two_hand_faces
from ev2hands_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ev2hands_tpu.utils.logging import RunLogger


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def build_hands(cfg: Config, synthetic: bool = False) -> Dict[str, Any]:
    """{'left','right'} ManoHand objects from real or synthetic model data."""
    if synthetic:
        models = synthetic_mano_models(0)
    else:
        from ev2hands_tpu.mano import load_mano_models

        models = load_mano_models(cfg.mano.model_path)
    return create_mano_hands(models, n_pose_comps=cfg.mano.n_pose_comps)


def build_collision_context(hands) -> CollisionContext:
    faces = build_two_hand_faces(
        np.asarray(hands["left"].faces), np.asarray(hands["right"].faces)
    )
    return CollisionContext(
        faces=jnp.asarray(faces), adjacency=jnp.asarray(build_adjacency_mask(faces))
    )


def create_train_state(
    net: TEHNet, cfg: Config, rng: jax.Array, optimizer: optax.GradientTransformation
) -> TrainState:
    x = jnp.zeros((1, cfg.model.n_points, cfg.model.in_channels))
    # jit the init: unjitted flax init dispatches thousands of tiny ops, which
    # is pathological over a high-latency device link
    variables = jax.jit(lambda k, inp: net.init({"params": k}, inp, train=False))(rng, x)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    net: TEHNet,
    hands: Dict[str, ManoParams],
    ctx: CollisionContext,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    augment: bool = True,
):
    """Returns the jitted train step: (state, batch, key) -> (state, losses).

    ``batch`` carries raw windows: events [B, N, 4], labels [B, N], plus the
    per-hand MANO GT arrays and handedness. The whole body — device-side ERPC
    transform, forward, MANO, losses, backward, Adam — is one XLA program.
    """
    sensor = cfg.sensor

    def step_fn(state: TrainState, batch: Dict, key: jax.Array):
        k_erpc, k_drop, k_fps = jax.random.split(jax.random.fold_in(key, state.step), 3)

        erpc = erpc_batch_transform(
            batch["events"], batch["labels"], k_erpc,
            width=sensor.width, height=sensor.height,
            n_out=cfg.model.n_points, augment=augment,
        )
        targets = {
            "left": batch["left"],
            "right": batch["right"],
            "handedness": batch["handedness"],
            "class_logits": erpc.labels,
        }

        def loss_fn(params):
            outputs, updates = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                erpc.events,
                train=True,
                rngs={"dropout": k_drop, "fps": k_fps},
                mutable=["batch_stats"],
            )
            outputs = apply_mano(hands, outputs)
            losses = mano_losses(
                outputs, targets, hands, ctx, cfg.loss,
                n_pose_comps=cfg.mano.n_pose_comps,
            )
            return total_loss(losses), (losses, updates["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        losses = dict(losses, loss=loss)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            losses,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(net: TEHNet, hands: Dict[str, ManoParams], cfg: Config):
    """Jitted eval step: raw batch -> (pred_j3d_mm, gt_j3d_mm) [B, 2, 21, 3]."""
    sensor = cfg.sensor

    def eval_fn(state: TrainState, batch: Dict, key: jax.Array):
        erpc = erpc_batch_transform(
            batch["events"], batch["labels"], key,
            width=sensor.width, height=sensor.height,
            n_out=cfg.model.n_points, augment=False,
        )
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc.events,
            train=False,
        )
        outputs = apply_mano(hands, outputs)

        from ev2hands_tpu.losses import recompute_gt_joints

        targets = recompute_gt_joints(hands, {"left": batch["left"], "right": batch["right"]})
        pred = jnp.stack([outputs["left"]["j3d"], outputs["right"]["j3d"]], axis=1)
        gt = jnp.stack([targets["left"]["j3d"], targets["right"]["j3d"]], axis=1)
        return pred * 1000.0, gt * 1000.0

    return jax.jit(eval_fn)


def evaluate(
    eval_step, state: TrainState, reader: Ev2HandSReader, cfg: Config,
    max_frames: Optional[int] = None, key: Optional[jax.Array] = None,
    mesh=None,
) -> Tuple[Dict, float]:
    """PCK/AUC evaluation over a reader (``evaluate_net``, ``evaluate.py:244-314``).

    Pass the training ``mesh`` so the periodic mid-train eval shards its
    batches over the same data axis the train step uses — with replicated
    params an unsharded batch would run the whole eval on one device while
    the rest idle."""
    acc = PckAccumulator(num_steps=50, dist_max_mm=50.0)
    key = key if key is not None else jax.random.PRNGKey(0)
    max_frames = max_frames or cfg.train.max_eval_iters
    bs = cfg.train.eval_batch_size
    for i, batch in enumerate(reader.batches(bs, shuffle=False,
                                             max_batches=max(1, max_frames // bs))):
        if mesh is not None and batch["events"].shape[0] % mesh.size == 0:
            batch = shard_batch(batch, mesh)
        pred, gt = eval_step(state, batch, jax.random.fold_in(key, i))
        acc.update(pred, gt)
        if acc.frames >= max_frames:
            break
    return acc.result()


def train(cfg: Config = DEFAULT_CONFIG, synthetic_mano: bool = False,
          max_iter: Optional[int] = None,
          resume_dir: Optional[str] = None) -> TrainState:
    """Full pretraining loop (``train.py:22-151``). ``resume_dir`` restores
    the latest native checkpoint of a previous run (params, batch stats,
    step counter, best score) and continues — the reference's restart
    behavior (``utils/__init__.py:67-103``) made explicit."""
    from ev2hands_tpu.checkpoint import NativeCheckpointer, load_pth_checkpoint

    logger = RunLogger("train")
    hands = build_hands(cfg, synthetic=synthetic_mano)
    hand_params = {s: h.params for s, h in hands.items()}
    ctx = build_collision_context(hands)

    net = TEHNet(cfg=cfg.model)
    # torch ``optim.Adam(weight_decay=wd)`` (reference ``train.py:56``, wd=0
    # by default) couples the L2 term INTO the gradients before the moment
    # updates — that is add_decayed_weights + adam, NOT AdamW's decoupled
    # decay, which scales the penalty by 1/(sqrt(v)+eps) differently.
    optimizer = optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.adam(cfg.train.learning_rate),
    ) if cfg.train.weight_decay else optax.adam(cfg.train.learning_rate)

    state = create_train_state(net, cfg, jax.random.PRNGKey(cfg.train.seed), optimizer)
    logger.log_run_config(cfg, net)
    start_it = 0
    resumed_score = -np.inf

    if cfg.train.checkpoint_path:
        variables = load_pth_checkpoint(
            cfg.train.checkpoint_path,
            {"params": state.params, "batch_stats": state.batch_stats},
        )
        state = state._replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
        logger.info(f"warm-started from {cfg.train.checkpoint_path}")

    if resume_dir:
        prev = NativeCheckpointer(resume_dir)
        last = prev.latest_step()
        if last is not None:
            # opt_state template comes from the freshly-initialized optimizer
            # tree so Adam's moments resume exactly (the reference persists
            # `optimize_state` too, train.py:117-123).
            restored = prev.restore(last, {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": 0,
                "max_eval_score": 0.0,
            })
            state = state._replace(
                params=restored["params"], batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(int(restored["step"]), jnp.int32),
            )
            start_it = int(restored["step"])
            resumed_score = float(restored["max_eval_score"])
            logger.info(f"resumed from {resume_dir} at step {start_it} "
                        f"(best score {resumed_score})")

    mesh = create_mesh(cfg.train.data_parallel) if cfg.train.data_parallel > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)

    train_step = make_train_step(net, hand_params, ctx, cfg, optimizer)
    eval_step = make_eval_step(net, hand_params, cfg)

    train_root = f"{cfg.train.data_root}/train"
    val_reader = Ev2HandSReader(f"{cfg.train.data_root}/val", cfg.model.n_points)

    # prefer the native C++ batch assembler when built (csrc/); it holds the
    # decoded event table once and fills batches with a pthread pool
    train_batches = None
    try:
        from ev2hands_tpu.events.native_loader import (
            NativeEv2HandSLoader,
            native_available,
        )

        if native_available():
            native = NativeEv2HandSLoader(
                train_root, cfg.model.n_points, seed=cfg.train.seed
            )
            train_batches = native.batches(cfg.train.batch_size)
            logger.info("using native C++ batch loader")
    except Exception as e:  # pragma: no cover - fallback path
        logger.info(f"native loader unavailable ({e}); using Python reader")
    if train_batches is None:
        train_reader = Ev2HandSReader(train_root, cfg.model.n_points)
        train_batches = train_reader.batches(cfg.train.batch_size, shuffle=True)

    ckptr = NativeCheckpointer(logger.run_dir + "/ckpt")
    key = jax.random.PRNGKey(cfg.train.seed + 1)
    max_iter = max_iter or cfg.train.max_iter
    max_eval_score = resumed_score
    loss_log: Dict[str, float] = {}
    st = glob_st = time.time()

    batches = Prefetcher(train_batches)
    for it, batch in enumerate(batches, start=start_it):
        if it >= max_iter:
            break
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, losses = train_step(state, batch, key)

        for k, v in losses.items():
            loss_log[k] = loss_log.get(k, 0.0) + float(v)

        if (it + 1) % cfg.train.msg_iter == 0:
            ed = time.time()
            eta = int((max_iter - it) * (ed - glob_st) / max(it, 1))
            msg = ", ".join(
                [f"it: {it + 1}/{max_iter}"]
                + [f"{k}: {v / cfg.train.msg_iter:.3f}" for k, v in loss_log.items()]
                + [f"time: {ed - st:.2f}s", f"eta: {eta}s"]
            )
            logger.info(msg)
            loss_log = {}
            st = ed

        if (it + 1) % cfg.train.save_iter == 0:
            metrics, score = evaluate(eval_step, state, val_reader, cfg, mesh=mesh)
            logger.info(f"eval@{it + 1}: score={score} auc={metrics['auc']}")
            logger.scalar("relative_auc", score, it + 1)
            if score > max_eval_score:
                max_eval_score = score
                ckptr.save(it + 1, {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                    "opt_state": jax.device_get(state.opt_state),
                    "step": np.int64(it + 1),
                    "max_eval_score": float(max_eval_score),
                })
                logger.info(f"saved best checkpoint at {it + 1}")

    ckptr.wait()  # join the in-flight async save before returning
    return state


def main():
    ap = argparse.ArgumentParser(description="Pretrain TEHNet on Ev2Hands-S")
    ap.add_argument("--data_root", default=DEFAULT_CONFIG.train.data_root)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--checkpoint_path", default="")
    ap.add_argument("--max_iter", type=int, default=None)
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--resume_dir", default=None,
                    help="previous run's ckpt dir to resume from")
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: conv chains in bfloat16,"
                         " params/BN stats/losses stay f32"
                         " (ModelConfig.bf16_train)")
    ap.add_argument("--shared_head_fps", action="store_true",
                    help="one random FPS draw for both MANO regressor heads"
                         " (ModelConfig.shared_head_fps; the reference draws"
                         " independently per head)")
    # multi-host bring-up (DCN): pass all three to join a jax.distributed
    # cluster (e.g. from scripts/slurm_train.sh); single-process otherwise
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    args = ap.parse_args()

    if args.num_processes:
        from ev2hands_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)

    cfg = DEFAULT_CONFIG
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__,
           "data_root": args.data_root,
           "batch_size": args.batch_size,
           "checkpoint_path": args.checkpoint_path,
           "data_parallel": args.data_parallel}))
    model_over = {}
    if args.bf16:
        model_over["bf16_train"] = True
    if args.shared_head_fps:
        model_over["shared_head_fps"] = True
    if model_over:
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, **model_over}))
    train(cfg, synthetic_mano=args.synthetic_mano, max_iter=args.max_iter,
          resume_dir=args.resume_dir)


if __name__ == "__main__":
    main()
