"""Run logging: timestamped run directories, python logging to file +
console, optional TensorBoard scalars.

Replaces the reference's ``Logger`` singleton (``utils/logger.py:11-58``,
which names run dirs by md5-of-model-repr and appends to the newest existing
log) with explicit timestamped run dirs.
"""

from __future__ import annotations

import datetime
import logging
import os
import sys


class RunLogger:
    def __init__(self, name: str, base_dir: str = "runs"):
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        self.run_dir = os.path.join(base_dir, f"{name}_{stamp}")
        os.makedirs(self.run_dir, exist_ok=True)

        self._logger = logging.getLogger(f"ev2hands.{name}.{stamp}")
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        fmt = logging.Formatter("[%(asctime)s] %(message)s")
        fh = logging.FileHandler(os.path.join(self.run_dir, "log.txt"))
        fh.setFormatter(fmt)
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self._logger.addHandler(fh)
        self._logger.addHandler(sh)

        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(self.run_dir, "tb"))
        except Exception:
            pass  # tensorboard optional

    def info(self, msg: str):
        self._logger.info(msg)

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def log_run_config(self, cfg, net=None):
        """Record the full config tree (and optionally the model definition)
        in the run dir — the reference logs the model source on fresh runs
        (``utils/logger.py:27-31,52-53``) so a run is reproducible from its
        directory alone."""
        import dataclasses
        import json

        def as_dict(obj):
            if dataclasses.is_dataclass(obj):
                return {f.name: as_dict(getattr(obj, f.name))
                        for f in dataclasses.fields(obj)}
            return obj

        with open(os.path.join(self.run_dir, "config.json"), "w") as f:
            json.dump(as_dict(cfg), f, indent=2, default=str)
        if net is not None:
            with open(os.path.join(self.run_dir, "model.txt"), "w") as f:
                f.write(repr(net))
        self.info(f"run config recorded in {self.run_dir}/config.json")
