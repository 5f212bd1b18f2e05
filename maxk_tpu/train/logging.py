"""Logging/observability — re-design of `utils/general_utils.py:13-57` +
the tensorboardX scalar logging in `maxk_gnn_integrated.py:160-163`.

`get_logger` reproduces the file+stream logger; `ScalarWriter` writes
JSONL scalars (always) and mirrors to tensorboardX when available —
experiment dirs follow the reference layout
`{path}/{dataset}_seed{seed}/{model}_{nonlinear}`.
"""

from __future__ import annotations

import json
import logging
import os
import time


def get_logger(path: str = "", name: str = "maxk_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def experiment_dir(cfg) -> str:
    d = os.path.join(
        cfg.path, f"{cfg.dataset}_seed{cfg.seed}", f"{cfg.model}_{cfg.nonlinear}"
    )
    os.makedirs(d, exist_ok=True)
    return d


class ScalarWriter:
    """JSONL scalar writer with optional tensorboardX mirror."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(
            json.dumps(
                {"tag": tag, "value": float(value), "step": int(step), "ts": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_text(self, tag: str, text: str, step: int = 0) -> None:
        if self._tb is not None:
            self._tb.add_text(tag, text, step)

    def flush(self) -> None:
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()
