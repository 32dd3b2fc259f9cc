"""Multi-chip verification BY INSPECTION (VERDICT r4 missing-4).

Value-parity tests on small CPU meshes can miss sharding regressions
that only change the *compiled* program — an accidental parameter
all-gather, a resharding collective-permute, a reduce-scatter/all-gather
pair where a single fused all-reduce was intended. These tests compile
the production shard_map data-parallel train step (the rebuild of the
reference's ``nn.DataParallel`` path, ``if_multiGPU_imagenet32.py``) on
the 8-virtual-device mesh and assert on the optimized HLO itself:

  * the gradient/loss pmean IS there (>= 1 ``all-reduce``), and
  * NO other collective appears — no ``all-gather`` (params are
    replicated in-spec; gathering any would mean a spec regression), no
    ``reduce-scatter``, ``all-to-all`` or ``collective-permute``.

The model is the flagship layer mix (inv-conv + one-hot RQ splines +
SplitPrior + RepeatedBlock) at tiny spatial size — shape-independent
HLO structure, fast compile.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from inverse_flow_tpu.data import synthetic
from inverse_flow_tpu.models.glow import build_glow
from inverse_flow_tpu.train.config import ExperimentConfig
from inverse_flow_tpu.train.experiment import Experiment

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-virtual-device CPU mesh")


def _count(txt, op):
    return len(re.findall(r"\b" + op, txt))


def _flagship_mix_experiment(n_train=16, batch=16):
    flow = build_glow((1, 8, 8), step_kind="inv_conv_no_pad", num_blocks=2,
                      block_size=2, coupling_width=16, actnorm=True,
                      split_prior=True, activation="Spline", n_bins=5,
                      tail_bound=20.0)
    loaders = synthetic.load_data((1, 8, 8), n_train=n_train, n_val=batch,
                                  n_test=batch, batch_size=batch)
    cfg = ExperimentConfig(name="hlo_probe", data_parallel=True,
                           batch_size=batch, log_timing=False,
                           save_images=False, plot_recon=False,
                           metrics_path="/tmp/hlo_probe_metrics.jsonl",
                           checkpoint_path="/tmp/hlo_probe.pkl")
    return Experiment(flow, *loaders, cfg)


@pytest.mark.slow
def test_shard_map_dp_step_collectives_by_inspection():
    exp = _flagship_mix_experiment()
    assert exp.mesh is not None
    assert exp.cfg.data_parallel_impl == "shard_map"

    x = exp._prep_batch(next(iter(exp.train_loader)))
    compiled = exp._train_step.lower(
        exp.state, x, jax.random.PRNGKey(0)).compile()
    txt = compiled.as_text()

    n_allreduce = _count(txt, "all-reduce")
    # the grads pmean (one all-reduce per leaf unless the combiner pass
    # fuses them) + loss/recon pmeans must be present
    assert n_allreduce >= 1, "gradient all-reduce missing from DP step"
    # and bounded: nothing should all-reduce beyond grads + 2 scalars
    n_leaves = len(jax.tree_util.tree_leaves(exp.state.params))
    assert n_allreduce <= n_leaves + 4, (
        f"{n_allreduce} all-reduces for {n_leaves} grad leaves — "
        "unexpected extra reductions")
    for op in ("all-gather", "reduce-scatter", "all-to-all",
               "collective-permute"):
        assert _count(txt, op) == 0, (
            f"unexpected {op} in shard_map DP step: params must stay "
            "replicated (no gathering/resharding)")


@pytest.mark.slow
def test_shard_map_dp_eval_collectives_by_inspection():
    exp = _flagship_mix_experiment()
    x = exp._prep_batch(next(iter(exp.val_loader)))
    txt = exp._eval_logpx.lower(exp.state.params, x,
                                jax.random.PRNGKey(0)).compile().as_text()
    assert _count(txt, "all-reduce") >= 1, "eval psum missing"
    for op in ("all-gather", "reduce-scatter", "all-to-all",
               "collective-permute"):
        assert _count(txt, op) == 0, f"unexpected {op} in DP eval"
