"""On-chip numerics check for the SOLVE_PRECISION policy.

``SOLVE_PRECISION='high'`` (bf16x3) replaced 'highest' (bf16x6) for a
slope-measured 1.239x end-to-end step win. bf16x3 is ~f32-accurate in
theory; this script VERIFIES that on the live backend at production
shapes, against a float64 dense oracle computed on host:

  * forward-solve error  |y_tpu - y_f64|        per precision tier
  * round-trip error     |T^{-1}(T x) - x|      (solve after conv)
  * VJP dx error vs the f64 dense transposed solve

Run (TPU):  python scripts/check_solve_precision.py
Writes one JSON line per (shape, precision) to
results/solve_precision_check.jsonl.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SHAPES = [
    # (c, h, w, kh, kw)  — the three ImageNet32 Glow levels + flagship-ish
    (12, 32, 32, 3, 3),
    (24, 16, 16, 3, 3),
    (48, 8, 8, 3, 3),
    (4, 14, 14, 3, 3),
]

# Weight scales: 0.1 is a deliberate conditioning stress (errors there
# are condition-dominated and near-identical across precision tiers);
# 0.01 is the production regime (reference weight_clamp=0.01 configs).
SCALES = [0.1, 0.01]


def dense_oracle_f64(w_eff, c, h, w):
    """Host float64 dense operator T and its inverse applied to x."""
    import jax

    from inverse_flow_tpu.ops.inv_conv import dense_operator
    t = np.asarray(jax.device_get(dense_operator(w_eff, c, h, w)),
                   np.float64)
    return t


def main():
    from inverse_flow_tpu import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import inverse_flow_tpu.ops.inv_conv as ic

    print(f"# device: {jax.devices()[0]}", flush=True)
    rows = []
    for scale in SCALES:
      for (c, h, w, kh, kw) in SHAPES:
        key = jax.random.PRNGKey(c + h)
        k1, k2, k3 = jax.random.split(key, 3)
        w_eff = ic.apply_mask(
            scale * jax.random.normal(k1, (c, c, kh, kw), jnp.float32))
        x = jax.random.normal(k2, (8, c, h, w), jnp.float32)
        g_ct = jax.random.normal(k3, (8, c, h, w), jnp.float32)

        t64 = dense_oracle_f64(w_eff, c, h, w)
        x64 = np.asarray(jax.device_get(x), np.float64).reshape(8, -1)
        y64 = np.linalg.solve(t64, x64.T).T
        dx64 = np.linalg.solve(t64.T, np.asarray(
            jax.device_get(g_ct), np.float64).reshape(8, -1).T).T

        for prec in ("highest", "high", "default"):
            ic.SOLVE_PRECISION = prec

            @jax.jit
            def run(x, w_eff, g_ct):
                y = ic.inv_conv_solve(x, w_eff)
                z = ic.masked_conv_apply(y, w_eff)       # T y == x ?
                dx = jax.vjp(lambda xx: ic.inv_conv_solve(xx, w_eff),
                             x)[1](g_ct)[0]
                return y, z, dx

            y, z, dx = jax.device_get(run(x, w_eff, g_ct))
            # NOTE: do not shadow the loop variable `scale` here — a
            # previous revision did, which fed max|y64| back in as the
            # next shape's weight scale (1e51 blow-up, NaN rows).
            y_ref_norm = float(np.max(np.abs(y64)))
            err_y = float(np.max(np.abs(
                np.asarray(y, np.float64).reshape(8, -1) - y64))) / y_ref_norm
            err_rt = float(np.max(np.abs(z - jax.device_get(x))))
            err_dx = float(np.max(np.abs(
                np.asarray(dx, np.float64).reshape(8, -1) - dx64))) / max(
                    1.0, float(np.max(np.abs(dx64))))
            row = {"shape": [c, h, w, kh, kw], "w_scale": scale,
                   "y_ref_norm": y_ref_norm,
                   "precision": prec,
                   "rel_err_y_vs_f64": err_y,
                   "abs_roundtrip_err": err_rt,
                   "rel_err_dx_vs_f64": err_dx}
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("results/solve_precision_check.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
