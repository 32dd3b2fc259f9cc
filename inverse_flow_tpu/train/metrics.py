"""Metrics logging: stdout + local JSONL, wandb optional.

Reference parity: the wandb init/log/summary surface of
``inf/train/experiment.py:84-106,151-158``. wandb is opt-in and soft-failed
(the reference's try/except import, ``experiment.py:6-9``); a local JSONL
stream is always written so runs are observable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

try:
    import wandb as _wandb
except Exception:  # pragma: no cover - wandb genuinely optional
    _wandb = None


class MetricsLogger:
    def __init__(self, path: Optional[str], use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None, verbose: bool = True):
        self.path = path
        self.verbose = verbose
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self.wandb_run = None
        if use_wandb and _wandb is not None:
            try:
                self.wandb_run = _wandb.init(**(wandb_kwargs or {}))
            except Exception as e:
                print(f"wandb disabled ({e})")

    def log(self, name, value, step=None, _wandb=True):
        if self.verbose:
            print(f"{name}: {value}")
        if self._fh:
            rec = {"t": time.time(), "name": name, "value": _jsonable(value)}
            if step is not None:
                rec["step"] = step
            self._fh.write(json.dumps(rec) + "\n")
        if _wandb and self.wandb_run is not None:
            # forward the caller's step so differently-cadenced metrics
            # (train loss vs eval bpd) share one x-axis in wandb
            if step is not None:
                self.wandb_run.log({name: value}, step=step)
            else:
                self.wandb_run.log({name: value})

    def summary(self, name, value):
        # summary entries go to wandb's summary table only — logging them
        # to history too would double-record each value
        self.log(f"summary/{name}", value, _wandb=False)
        if self.wandb_run is not None:
            self.wandb_run.summary[name] = value

    def close(self):
        if self._fh:
            self._fh.close()


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)
