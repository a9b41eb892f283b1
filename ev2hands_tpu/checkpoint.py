"""Checkpoint ingestion and native checkpointing.

Two jobs:

1. **PyTorch ``.pth`` ingestion** — map the reference's released
   ``best_model_state_dict.pth`` (a torch ``state_dict`` of ``TEHNet``,
   possibly wrapped in a ``{'start_it', 'state_dict', ...}`` dict as written
   by ``train.py:117-123`` and possibly ``module.``-prefixed by
   ``nn.DataParallel``, cf. ``model/model.py:14-23``) onto this framework's
   flax variable tree. Every torch tensor must land somewhere and every flax
   leaf must be covered — the mapping is verified, not best-effort.

2. **Native checkpoints** — orbax-based save/restore of
   ``{params, batch_stats, opt_state, step, max_eval_score}`` for our own
   training loop (replaces ``torch.save`` at ``train.py:115-126`` and the
   tolerant restore in ``utils/__init__.py:67-103``).

Torch -> flax layout rules (channels-last re-design):
  Conv2d 1x1  [out, in, 1, 1] -> Dense kernel [in, out]
  Conv1d k=1  [out, in, 1]    -> Dense kernel [in, out]
  Conv1d k=3  [out, in, 3]    -> nn.Conv kernel [3, in, out]
  Linear      [out, in]       -> Dense kernel [in, out]
  BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch .pth -> flax
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a ``.pth`` into plain numpy arrays (handles the trainer's wrapper
    dict and DataParallel ``module.`` prefixes)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _put(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = jnp.asarray(value)


_SA_MSG_CONV = re.compile(r"^conv_blocks\.(\d+)\.(\d+)\.(weight|bias)$")
_SA_MSG_BN = re.compile(r"^bn_blocks\.(\d+)\.(\d+)\.(weight|bias|running_mean|running_var|num_batches_tracked)$")
_SA_CONV = re.compile(r"^mlp_convs\.(\d+)\.(weight|bias)$")
_SA_BN = re.compile(r"^mlp_bns\.(\d+)\.(weight|bias|running_mean|running_var|num_batches_tracked)$")


def _convert_leaf(kind: str, field: str, w: np.ndarray) -> Tuple[str, str, np.ndarray]:
    """Returns (collection, leaf_name, array) for one torch tensor.

    kind: 'conv2d1' | 'conv1d1' | 'conv1d3' | 'linear' | 'bn'
    """
    if kind == "bn":
        return {
            "weight": ("params", "scale", w),
            "bias": ("params", "bias", w),
            "running_mean": ("batch_stats", "mean", w),
            "running_var": ("batch_stats", "var", w),
        }[field]
    if field == "bias":
        return ("params", "bias", w)
    if kind == "conv2d1":
        return ("params", "kernel", w[:, :, 0, 0].T)
    if kind == "conv1d1":
        return ("params", "kernel", w[:, :, 0].T)
    if kind == "conv1d3":
        return ("params", "kernel", w.transpose(2, 1, 0))
    if kind == "linear":
        return ("params", "kernel", w.T)
    raise ValueError(f"unknown kind {kind}")


def _map_block(rest: str) -> Optional[Tuple[str, Tuple[str, ...], str]]:
    """Map a torch sub-key (inside a SA/FP block) to
    (kind, flax-relative-path, field)."""
    m = _SA_MSG_CONV.match(rest)
    if m:
        i, j, f = m.groups()
        return "conv2d1", (f"conv_{i}_{j}",), f
    m = _SA_MSG_BN.match(rest)
    if m:
        i, j, f = m.groups()
        if f == "num_batches_tracked":
            return None
        return "bn", (f"bn_{i}_{j}",), f
    m = _SA_CONV.match(rest)
    if m:
        j, f = m.groups()
        return "conv2d1", (f"conv_{j}",), f  # shape disambiguates 1d/2d below
    m = _SA_BN.match(rest)
    if m:
        j, f = m.groups()
        if f == "num_batches_tracked":
            return None
        return "bn", (f"bn_{j}",), f
    return None


# torch Sequential slot -> (flax name, kind) for the fixed heads
_CLASSIFIER_SLOTS = {
    "0": ("classifier_conv_0", "conv1d1"),
    "2": ("classifier_bn", "bn"),
    "4": ("classifier_conv_1", "conv1d1"),
}
_QUERY_SLOTS = {
    "0": ("conv_0", "conv1d3"),
    "2": ("bn_0", "bn"),
    "4": ("conv_1", "conv1d3"),
    "5": ("bn_1", "bn"),
}
_REGRESSOR_MLP_SLOTS = {
    "0": ("fc_0", "linear"),
    "2": ("bn", "bn"),
    "4": ("fc_1", "linear"),
}


def torch_to_flax(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a TEHNet torch state_dict to ``{'params': ..., 'batch_stats': ...}``.

    Raises on any unmapped torch key (except num_batches_tracked).
    """
    params: Dict = {}
    batch_stats: Dict = {}
    unmapped = []

    for key, w in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        top = parts[0]
        dest: Optional[Tuple[Tuple[str, ...], str, str]] = None  # (path, kind, field)

        if top in ("sa1", "sa2", "sa3", "fp1", "fp2", "fp3"):
            rest = ".".join(parts[1:])
            mapped = _map_block(rest)
            if mapped:
                kind, relpath, field = mapped
                if kind == "conv2d1" and w.ndim == 3:
                    kind = "conv1d1"  # FP blocks use Conv1d
                dest = ((top,) + relpath, kind, field)
        elif top == "classifier":
            slot, field = parts[1], parts[2]
            name, kind = _CLASSIFIER_SLOTS[slot]
            dest = ((name,), kind, field)
        elif top in ("left_query_conv", "right_query_conv"):
            slot, field = parts[1], parts[2]
            name, kind = _QUERY_SLOTS[slot]
            dest = ((top, name), kind, field)
        elif top in ("left_mano_regressor", "right_mano_regressor"):
            sub = parts[1]
            if sub in ("sa1", "sa2"):
                rest = ".".join(parts[2:])
                mapped = _map_block(rest)
                if mapped:
                    kind, relpath, field = mapped
                    dest = ((top, sub) + relpath, kind, field)
            elif sub == "mano_regressor":
                slot, field = parts[2], parts[3]
                name, kind = _REGRESSOR_MLP_SLOTS[slot]
                dest = ((top, name), kind, field)

        if dest is None:
            unmapped.append(key)
            continue

        path, kind, field = dest
        collection, leaf, arr = _convert_leaf(kind, field, w)
        _put(params if collection == "params" else batch_stats, path + (leaf,), arr)

    if unmapped:
        raise ValueError(f"unmapped torch keys: {unmapped}")
    return {"params": params, "batch_stats": batch_stats}


def verify_against_template(converted: Dict, template: Dict) -> None:
    """Check the converted tree covers exactly the template's leaves with
    matching shapes (template = ``net.init(...)`` variables)."""
    for coll in ("params", "batch_stats"):
        conv_flat = dict(jax.tree_util.tree_flatten_with_path(converted[coll])[0])
        tmpl_flat = dict(jax.tree_util.tree_flatten_with_path(template[coll])[0])
        missing = set(tmpl_flat) - set(conv_flat)
        extra = set(conv_flat) - set(tmpl_flat)
        if missing or extra:
            raise ValueError(
                f"{coll}: missing={sorted(map(str, missing))[:8]} "
                f"extra={sorted(map(str, extra))[:8]}"
            )
        for k, v in tmpl_flat.items():
            if conv_flat[k].shape != v.shape:
                raise ValueError(f"{coll} {k}: shape {conv_flat[k].shape} != {v.shape}")


def load_pth_checkpoint(path: str, template: Dict) -> Dict[str, Any]:
    """Full ingestion: read, convert, verify against the model's own init."""
    state = load_torch_state_dict(path)
    converted = torch_to_flax(state)
    verify_against_template(converted, template)
    return converted


# ---------------------------------------------------------------------------
# flax -> torch (export, for users moving back to the reference)
# ---------------------------------------------------------------------------

def flax_to_torch(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: produce a torch-layout state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                out[".".join(prefix + (k,))] = np.asarray(v)

    flat: Dict[str, np.ndarray] = {}
    walk(variables["params"], ())
    walk(variables["batch_stats"], ())
    flat, out = out, {}

    inv_cls = {v[0]: (k, v[1]) for k, v in _CLASSIFIER_SLOTS.items()}
    inv_query = {v[0]: (k, v[1]) for k, v in _QUERY_SLOTS.items()}
    inv_reg = {v[0]: (k, v[1]) for k, v in _REGRESSOR_MLP_SLOTS.items()}

    for key, w in flat.items():
        parts = key.split(".")
        leaf = parts[-1]

        def emit(torch_key: str, kind: str):
            if leaf in ("scale", "bias") and kind == "bn":
                field = "weight" if leaf == "scale" else "bias"
                out[f"{torch_key}.{field}"] = w
            elif leaf == "mean":
                out[f"{torch_key}.running_mean"] = w
            elif leaf == "var":
                out[f"{torch_key}.running_var"] = w
            elif leaf == "bias":
                out[f"{torch_key}.bias"] = w
            elif leaf == "kernel":
                if kind == "conv2d1":
                    out[f"{torch_key}.weight"] = w.T[:, :, None, None]
                elif kind == "conv1d1":
                    out[f"{torch_key}.weight"] = w.T[:, :, None]
                elif kind == "conv1d3":
                    out[f"{torch_key}.weight"] = w.transpose(2, 1, 0)
                elif kind == "linear":
                    out[f"{torch_key}.weight"] = w.T
            else:
                raise ValueError(f"unknown leaf {key}")

        top = parts[0]
        if top in ("sa1", "sa2", "sa3", "fp1", "fp2", "fp3") or (
            top in ("left_mano_regressor", "right_mano_regressor")
            and parts[1] in ("sa1", "sa2")
        ):
            name = parts[-2]
            prefix = ".".join(parts[:-2])
            is_fp = parts[-3].startswith("fp")  # FP blocks use Conv1d in torch
            m2 = re.match(r"(conv|bn)_(\d+)_(\d+)$", name)
            m1 = re.match(r"(conv|bn)_(\d+)$", name)
            if m2:
                kind0, i, j = m2.groups()
                tname = ("conv_blocks" if kind0 == "conv" else "bn_blocks") + f".{i}.{j}"
                emit(f"{prefix}.{tname}", "conv2d1" if kind0 == "conv" else "bn")
            elif m1:
                kind0, j = m1.groups()
                tname = ("mlp_convs" if kind0 == "conv" else "mlp_bns") + f".{j}"
                emit(f"{prefix}.{tname}", ("conv1d1" if is_fp else "conv2d1") if kind0 == "conv" else "bn")
            else:
                raise ValueError(f"unexpected block leaf {key}")
        elif top.startswith("classifier"):
            slot, kind = inv_cls[top]
            emit(f"classifier.{slot}", kind)
        elif top in ("left_query_conv", "right_query_conv"):
            slot, kind = inv_query[parts[1]]
            emit(f"{top}.{slot}", kind)
        elif top in ("left_mano_regressor", "right_mano_regressor"):
            slot, kind = inv_reg[parts[1]]
            emit(f"{top}.mano_regressor.{slot}", kind)
        else:
            raise ValueError(f"unexpected top-level {key}")

    return out


# ---------------------------------------------------------------------------
# native orbax checkpointing
# ---------------------------------------------------------------------------

class NativeCheckpointer:
    """Orbax-backed train-state checkpointing (save-on-best, resumable).

    Saves are **asynchronous** by default: ``save`` returns once the state is
    staged to host memory and serialization/disk-write continue on a
    background thread, so the train loop's next steps overlap the write (the
    reference's ``torch.save`` — ``train.py:217`` — blocks the loop for the
    full serialize+write). At most one save is in flight: a new ``save``
    first joins the previous one, and ``wait()`` (called by the train/finetune
    loops before exit and before any restore) joins the last. ``async_save=
    False`` restores fully synchronous semantics."""

    def __init__(self, directory: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._async = async_save
        if async_save:
            self._ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        else:
            self._ckptr = ocp.StandardCheckpointer()

    @staticmethod
    def _coerce(tree):
        """StandardSave/StandardRestore reject bare python/numpy scalars
        (int, np.int64, ...); lift them to 0-d arrays, which round-trip and
        still satisfy ``int(...)``/``float(...)`` at the call sites."""
        import jax

        return jax.tree.map(
            lambda x: np.asarray(x)
            if isinstance(x, (int, float, np.number)) else x,
            tree,
        )

    def save(self, step: int, state: Dict[str, Any], block: bool = False):
        import orbax.checkpoint as ocp

        path = os.path.join(self._dir, f"step_{step:09d}")
        if self._async:
            # one outstanding save max — join the previous before staging
            self._ckptr.wait_until_finished()
            self._ckptr.save(
                path, args=ocp.args.StandardSave(self._coerce(state)), force=True
            )
            if block:
                self._ckptr.wait_until_finished()
        else:
            self._ckptr.save(path, state, force=True)
            self._ckptr.wait_until_finished()

    def wait(self):
        """Join any in-flight async save (no-op when synchronous/idle)."""
        self._ckptr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self.wait()  # in-flight async saves leave *.orbax-checkpoint-tmp dirs
        steps = [
            int(m.group(1))
            for d in os.listdir(self._dir)
            if (m := re.fullmatch(r"step_(\d+)", d))
            and os.path.isdir(os.path.join(self._dir, d))
        ]
        return max(steps) if steps else None

    def restore(self, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
        import orbax.checkpoint as ocp

        self.wait()  # a restore-latest must see the last save committed
        path = os.path.join(self._dir, f"step_{step:09d}")
        if self._async:
            return self._ckptr.restore(
                path, args=ocp.args.StandardRestore(self._coerce(template))
            )
        return self._ckptr.restore(path, template)
