"""Finetuning on real Ev2Hands-R recordings.

Re-design of ``src/Ev2Hands/finetune.py``: warm-start from a pretrained
checkpoint, train with the real-data loss (no MANO GT; root-relative j3d +
2-D reprojection + inter-hand consistency, ``losses.py:208-240``) for 15k
iterations at batch 8. The step consumes masked variable-length raw windows;
the ERPC transform runs on device.
"""

from __future__ import annotations

import argparse
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ev2hands_tpu.config import Config, DEFAULT_CONFIG
from ev2hands_tpu.events.erpc import erpc_real_batch_transform
from ev2hands_tpu.events.real_streams import Ev2HandRReader
from ev2hands_tpu.losses import real_losses, total_loss
from ev2hands_tpu.model import TEHNet, apply_mano
from ev2hands_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from ev2hands_tpu.train import (
    TrainState,
    build_collision_context,
    build_hands,
    create_train_state,
)
from ev2hands_tpu.utils.logging import RunLogger


def make_finetune_step(net, hands, ctx, cfg: Config, optimizer, projection_matrix):
    sensor = cfg.sensor
    proj = jnp.asarray(projection_matrix, jnp.float32)

    def step_fn(state: TrainState, batch: Dict, key: jax.Array):
        k_erpc, k_drop, k_fps = jax.random.split(
            jax.random.fold_in(key, state.step), 3
        )
        erpc = erpc_real_batch_transform(
            batch["events"], batch["event_valid"], k_erpc,
            width=sensor.width, height=sensor.height, n_out=cfg.model.n_points,
        )
        targets = {
            "left": batch["left"], "right": batch["right"],
            "handedness": batch["handedness"],
        }

        def loss_fn(params):
            outputs, updates = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                erpc.events, train=True,
                rngs={"dropout": k_drop, "fps": k_fps},
                mutable=["batch_stats"],
            )
            outputs = apply_mano(hands, outputs)
            losses = real_losses(
                outputs, targets, ctx, proj, sensor.width, sensor.height, cfg.loss
            )
            return total_loss(losses), (losses, updates["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            dict(losses, loss=loss),
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_finetune_eval_step(net, hands, cfg: Config):
    """Jitted validation forward for real windows: -> pred j3d in mm."""
    sensor = cfg.sensor

    def fn(state: TrainState, events, event_valid, key):
        erpc = erpc_real_batch_transform(
            events, event_valid, key,
            width=sensor.width, height=sensor.height, n_out=cfg.model.n_points,
        )
        outputs = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            erpc.events, train=False,
        )
        outputs = apply_mano(hands, outputs)
        pred = jnp.stack([outputs["left"]["j3d"], outputs["right"]["j3d"]], axis=1)
        return pred * 1000.0

    return jax.jit(fn)


def evaluate_finetune(
    eval_step, state: TrainState, reader, cfg: Config, max_frames: int = 8192,
    mesh=None,
):
    """PCK/AUC on an Ev2HandRReader — the real-data branch of the reference's
    ``evaluate_net`` (``evaluate.py:262-276``): GT joints come straight from
    the batch (meters -> mm), PCK 0-50 mm over 51 steps, score = relative
    AUC."""
    import numpy as np

    from ev2hands_tpu.metrics import PckAccumulator

    acc = PckAccumulator(num_steps=50, dist_max_mm=50.0)
    key = jax.random.PRNGKey(0)
    bs = cfg.train.eval_batch_size
    for i, batch in enumerate(
        reader.batches(bs, max_batches=max(1, max_frames // bs))
    ):
        events = jnp.asarray(batch["events"])
        valid = jnp.asarray(batch["event_valid"])
        if mesh is not None and events.shape[0] % mesh.size == 0:
            # shard the eval batch over the training mesh (all devices work)
            from ev2hands_tpu.parallel.mesh import shard_batch

            events, valid = shard_batch((events, valid), mesh)
        pred = eval_step(state, events, valid, jax.random.fold_in(key, i))
        gt = np.stack(
            [np.asarray(batch["left"]["j3d"]), np.asarray(batch["right"]["j3d"])],
            axis=1,
        ) * 1000.0
        acc.update(pred, jnp.asarray(gt))
        if acc.frames >= max_frames:
            break
    return acc.result()


def finetune(
    cfg: Config = DEFAULT_CONFIG,
    data_root: str = "",
    checkpoint_path: str = "",
    max_iter: int = 15_000,
    save_iter: int = 5_000,
    synthetic_mano: bool = False,
    val_data_root: str = "",
    max_eval_iters: int = 8192,
    resume_dir: str = "",
) -> TrainState:
    """``resume_dir`` restores a previous finetune run's latest native
    checkpoint — params, batch stats, optimizer state, step counter, and
    best score — and continues, like the reference's ``load_network`` restart
    (``/root/reference/src/Ev2Hands/finetune.py:64-66``).
    ``checkpoint_path`` by contrast only warm-starts the weights."""
    from ev2hands_tpu.checkpoint import NativeCheckpointer

    logger = RunLogger("finetune")
    hands_obj = build_hands(cfg, synthetic=synthetic_mano)
    hands = {s: h.params for s, h in hands_obj.items()}
    ctx = build_collision_context(hands_obj)
    net = TEHNet(cfg=cfg.model)
    # same coupled-L2 semantics as train.py: the reference finetuner is
    # ``optim.Adam(..., weight_decay=wd)`` with wd=0 by default
    # (``/root/reference/src/Ev2Hands/finetune.py:27,59-60``)
    optimizer = optax.chain(
        optax.add_decayed_weights(cfg.train.weight_decay),
        optax.adam(cfg.train.learning_rate),
    ) if cfg.train.weight_decay else optax.adam(cfg.train.learning_rate)
    state = create_train_state(net, cfg, jax.random.PRNGKey(cfg.train.seed), optimizer)
    logger.log_run_config(cfg, net)

    if checkpoint_path:
        from ev2hands_tpu.evaluate import load_checkpoint_into_state

        state = load_checkpoint_into_state(checkpoint_path, state)
        logger.info(f"warm-started from {checkpoint_path}")

    start_it = 0
    resumed_score = -float("inf")
    if resume_dir:
        prev = NativeCheckpointer(resume_dir)
        last = prev.latest_step()
        if last is not None:
            restored = prev.restore(last, {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
                "opt_state": jax.device_get(state.opt_state),
                "step": 0,
                "max_eval_score": 0.0,
            })
            state = TrainState(
                params=restored["params"], batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(int(restored["step"]), jnp.int32),
            )
            start_it = int(restored["step"])
            resumed_score = float(restored["max_eval_score"])
            logger.info(f"resumed finetune from {resume_dir} at step {start_it} "
                        f"(best score {resumed_score})")

    mesh = create_mesh(cfg.train.data_parallel) if cfg.train.data_parallel > 1 else None
    if mesh is not None:
        state = replicate(state, mesh)

    projection = cfg.camera.projection_matrix(cfg.sensor.width, cfg.sensor.height)
    step = make_finetune_step(net, hands, ctx, cfg, optimizer, projection)
    eval_step = make_finetune_eval_step(net, hands, cfg)

    reader = Ev2HandRReader(data_root, seed=cfg.train.seed)
    # reference validates on held-out REAL_TEST_DATA_PATH (finetune.py:43)
    if not val_data_root:
        logger.info(
            "WARNING: no --val_data_root given — save-on-best will select on "
            "the TRAINING recordings, which is self-selecting and NOT the "
            "reference's held-out validation semantics "
            "(reference finetune.py:43). Pass a held-out recordings dir."
        )
    val_reader = Ev2HandRReader(val_data_root or data_root,
                                seed=cfg.train.seed + 100)
    ckptr = NativeCheckpointer(logger.run_dir + "/ckpt")
    key = jax.random.PRNGKey(cfg.train.seed + 2)
    max_eval_score = resumed_score
    loss_log: Dict[str, float] = {}
    st = time.time()

    for it, batch in enumerate(reader.batches(cfg.train.batch_size),
                               start=start_it):
        if it >= max_iter:
            break
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        state, losses = step(state, batch, key)
        for k, v in losses.items():
            loss_log[k] = loss_log.get(k, 0.0) + float(v)

        if (it + 1) % cfg.train.msg_iter == 0:
            msg = ", ".join(
                [f"it: {it + 1}/{max_iter}"]
                + [f"{k}: {v / cfg.train.msg_iter:.3f}" for k, v in loss_log.items()]
                + [f"time: {time.time() - st:.1f}s"]
            )
            logger.info(msg)
            loss_log, st = {}, time.time()

        if (it + 1) % save_iter == 0:
            # eval/save-on-best, mirroring reference finetune.py:104-121
            metrics, score = evaluate_finetune(
                eval_step, state, val_reader, cfg, max_eval_iters, mesh=mesh
            )
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
    ap = argparse.ArgumentParser(description="Finetune TEHNet on Ev2Hands-R")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--val_data_root", default="",
                    help="validation recordings dir (defaults to data_root)")
    ap.add_argument("--checkpoint_path", default="")
    ap.add_argument("--resume_dir", default="",
                    help="previous finetune run's ckpt dir to resume from "
                         "(restores opt state + step, unlike checkpoint_path)")
    ap.add_argument("--max_iter", type=int, default=15_000)
    ap.add_argument("--save_iter", type=int, default=5_000)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--data_parallel", type=int, default=1)
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: conv chains in bfloat16,"
                         " params/BN stats/losses stay f32"
                         " (ModelConfig.bf16_train)")
    args = ap.parse_args()

    cfg = DEFAULT_CONFIG
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "batch_size": args.batch_size,
           "data_parallel": args.data_parallel}))
    if args.bf16:
        cfg = cfg.replace(model=cfg.model.__class__(
            **{**cfg.model.__dict__, "bf16_train": True}))
    finetune(cfg, args.data_root, args.checkpoint_path,
             args.max_iter, args.save_iter, args.synthetic_mano,
             val_data_root=args.val_data_root, resume_dir=args.resume_dir)


if __name__ == "__main__":
    main()
