"""Checkpoint save/load of the full train state.

Reference parity: single-file ``torch.save`` tar of model/optimizer/
scheduler state + summary + config (``inf/train/experiment.py:475-502``),
written on new best validation log-px, restored with a config diff warning.

Two backends over the same train-state pytree:
  * pickle of device_get'd numpy arrays (default — single file, no deps);
  * Orbax (``path`` ending in ``.orbax`` or ``backend='orbax'``) — the
    TPU-native checkpointer (SURVEY §5): async-capable, sharding-aware,
    restores to device directly. Falls back to pickle if orbax is absent.
"""

from __future__ import annotations

import json
import os
import pickle

import jax
import numpy as np


def _is_orbax(path, backend):
    return backend == "orbax" or (backend is None
                                  and str(path).endswith(".orbax"))


def save_checkpoint(path, state, summary, config_dict, backend=None):
    if _is_orbax(path, backend):
        try:
            return _save_orbax(path, state, summary, config_dict)
        except ImportError:
            pass
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


def load_checkpoint(path, config_dict=None, log=print, backend=None,
                    state_like=None):
    if _is_orbax(path, backend):
        try:
            return _load_orbax(path, config_dict, log, state_like)
        except ImportError:
            pass
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if config_dict is not None:
        old = payload.get("config", {})
        diff = {k for k in set(old) | set(config_dict)
                if old.get(k) != config_dict.get(k)}
        if diff:
            log(f"Warning: differences in loaded config: {sorted(diff)}")
    return payload["state"], payload["summary"]


# ---------------------------------------------------------------------------
# Orbax backend
# ---------------------------------------------------------------------------

def _save_orbax(path, state, summary, config_dict):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(path, "extra.json"), "w") as f:
        json.dump({"summary": _jsonable(dict(summary)),
                   "config": _jsonable(dict(config_dict))}, f)


def _load_orbax(path, config_dict, log, state_like):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if state_like is not None:
        state = ckptr.restore(path, item=jax.device_get(state_like))
    else:
        state = ckptr.restore(path)
    with open(os.path.join(path, "extra.json")) as f:
        extra = json.load(f)
    if config_dict is not None:
        old = extra.get("config", {})
        new = _jsonable(dict(config_dict))
        diff = {k for k in set(old) | set(new) if old.get(k) != new.get(k)}
        if diff:
            log(f"Warning: differences in loaded config: {sorted(diff)}")
    return state, extra["summary"]


def _json_value(v):
    if isinstance(v, (str, bool, int, float)) or v is None:
        return v
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, np.bool_)):
        return float(v)
    if isinstance(v, (list, tuple)):
        # element-wise: a list of numpy scalars is not json-serializable
        return [_json_value(x) for x in v]
    if isinstance(v, dict):
        return {str(k): _json_value(x) for k, x in v.items()}
    if isinstance(v, np.ndarray) or hasattr(v, "__array__"):
        a = np.asarray(v)
        if a.ndim == 0:
            return (float(a) if np.issubdtype(a.dtype, np.number)
                    else str(a))
        return _json_value(a.tolist())
    # np.ndim(v)==0 holds for ANY non-array object (Path, dataclass...),
    # so anything non-numeric must fall through to str, not float()
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


def _jsonable(d):
    return {k: _json_value(v) for k, v in d.items()}
