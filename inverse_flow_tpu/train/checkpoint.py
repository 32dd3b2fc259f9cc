"""Checkpoint save/load of the full train state.

Reference parity: single-file ``torch.save`` tar of model/optimizer/
scheduler state + summary + config (``inf/train/experiment.py:475-502``),
written on new best validation log-px, restored with a config diff warning.
Here the whole train state is one pytree, serialized with pickle of
device_get'd numpy arrays (no torch dependency, works for any optax state).
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path, state, summary, config_dict):
    payload = {
        "state": jax.device_get(state),
        "summary": dict(summary),
        "config": dict(config_dict),
    }
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path, config_dict=None, log=print):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if config_dict is not None:
        old = payload.get("config", {})
        diff = {k for k in set(old) | set(config_dict)
                if old.get(k) != config_dict.get(k)}
        if diff:
            log(f"Warning: differences in loaded config: {sorted(diff)}")
    return payload["state"], payload["summary"]
