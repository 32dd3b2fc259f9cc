"""The training/eval/sampling harness.

Reference parity: ``inf/train/experiment.py:50-502`` (Experiment) — epoch
loop with eval cadence and best-val checkpointing, per-batch warmup LR,
gradient-norm clip, the weight clamp the reference mislabels as "grad_clip"
(``:292-296``), NaN-loss scrub (``:191``), recon-grad pass, trimmed batch /
per-sample timing into StatsRecorder (``:259-262,326-331,377-400``),
bits/dim conversion (``:76-77``), sample/recon image dumps, checkpoint
save/load.

TPU-native differences:
  * one jitted, donated train step (forward + backward + recon grads +
    clip + optimizer) instead of eager per-op dispatch;
  * timing is host wall-clock around ``block_until_ready`` (the CUDA-event
    equivalent on TPU);
  * data parallelism = batch sharding over an ICI mesh inside the same jit
    (replaces ``nn.DataParallel``); gradients all-reduce implicitly;
  * ActNorm's data-dependent init is an explicit functional pass on the
    first batch (under a sharded batch the mean/std reduce globally).
"""

from __future__ import annotations

import os
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..layers.sequential import Flow
from ..parallel.mesh import batch_sharding, make_mesh, replicate


def _exact_solver_layers(layers):
    """Rewrite solver='auto' InvFlowUnits to 'exact' (recursing into
    RepeatedBlock): used by the data-parallel path, whose jit+
    NamedSharding step must not auto-partition a pallas_call."""
    import dataclasses

    from ..layers.inv_flow import InvFlow, InvFlowUnit
    from ..layers.repeated import RepeatedBlock

    out = []
    for l in layers:
        if isinstance(l, RepeatedBlock):
            l = dataclasses.replace(
                l, step_layers=tuple(_exact_solver_layers(l.step_layers)))
        elif (isinstance(l, (InvFlow, InvFlowUnit))
              and l.solver in ("auto", "fused")):
            # 'fused' too: an explicit request cannot be honored safely
            # under automatic partitioning; shard_map is the supported
            # multi-chip route for the kernel
            l = dataclasses.replace(l, solver="exact")
        out.append(l)
    return out
from .checkpoint import load_checkpoint, save_checkpoint
from .config import ExperimentConfig
from .metrics import MetricsLogger
from .optim import make_optimizer
from .stats import StatsRecorder


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # GECO state (selfnorm.py:219-227): moving average of recon loss and
    # the adapted weight.
    recon_weight: jnp.ndarray
    recon_ema: jnp.ndarray


class Experiment:
    def __init__(self, flow: Flow, train_loader, val_loader, test_loader,
                 config: ExperimentConfig):
        self.flow = flow
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.test_loader = test_loader
        self.cfg = config

        self.data_shape = tuple(train_loader.data_shape)
        dim = int(np.prod(self.data_shape))
        self.to_bpd = lambda logpx: -logpx / (np.log(2.0) * dim)

        name = (config.name or "run").replace(" ", "_")
        metrics_path = config.metrics_path or f"./{name}_metrics.jsonl"
        self.logger = MetricsLogger(
            metrics_path, use_wandb=config.wandb,
            wandb_kwargs=dict(name=config.name, notes=config.notes,
                              project=config.wandb_project,
                              entity=config.wandb_entity,
                              config=config.to_dict()))
        self.checkpoint_path = (config.checkpoint_path
                                or f"./{name}_checkpoint.pkl")

        self.summary = {"Epoch": 0,
                        "Best Val LogPx": float("-inf"),
                        "Test LogPx": float("-inf")}
        self.batch_time = StatsRecorder()
        self.sample_time = StatsRecorder()
        # per-epoch device-memory tracking (if_imagenet_multi_gpu.py:31-51,
        # logged per epoch as at experiment.py:148-149)
        from .memory import MemoryTracker
        self.memory_tracker = MemoryTracker()

        # ---------------- mesh / sharding --------------------------------
        self.mesh = None
        if config.data_parallel and len(jax.devices()) > 1:
            self.mesh = make_mesh()
            if config.data_parallel_impl == "jit":
                # legacy jit+NamedSharding path: the automatic partitioner
                # must not split a pallas_call, so this impl runs with
                # exact XLA solvers. Work on a shallow COPY of the flow —
                # the caller's object keeps its solvers (a Flow reused for
                # a later non-DP Experiment must stay fused-capable).
                import copy
                flow = copy.copy(flow)
                flow.layers = tuple(_exact_solver_layers(flow.layers))
                self.flow = flow
            # 'shard_map' (default): per-shard execution is fully manual
            # SPMD — each device runs the whole step on its local batch
            # shard (pallas_call included), gradients pmean over the mesh.
            # No solver rewrite needed; this is the configuration that
            # keeps the fused kernel's measured win under data parallelism.

        # ---------------- state ------------------------------------------
        rng = jax.random.PRNGKey(config.seed)
        self.rng, init_rng = jax.random.split(rng)
        params, _ = flow.init(init_rng, self.data_shape)
        self.tx, self.lr_schedule = make_optimizer(
            config, steps_per_epoch=max(1, len(train_loader)))
        self.state = TrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            recon_weight=jnp.asarray(config.recon_loss_weight, jnp.float32),
            recon_ema=jnp.asarray(0.0, jnp.float32),
        )
        self._data_initialized = False
        self._u8_upload = None          # decided on the first host batch
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg = self.cfg
        flow = self.flow

        def loss_fn(params, x, rng, recon_weight):
            # cheap (modified-grad) path unless modified_grad disabled
            # (experiment.py:160-161: compute_expensive = not modified_grad)
            _, logpx = flow.forward(params, x, rng=rng,
                                    exact=not cfg.modified_grad)
            nll = -logpx
            nll = jnp.where(jnp.isnan(nll), 0.0, nll)    # NaN scrub (:191)
            loss = jnp.sum(nll) / x.shape[0]
            recon = jnp.zeros((), jnp.float32)
            if cfg.add_recon_grad and any(
                    l.has_recon_loss for l in flow.layers):
                rvec = flow.recon_loss(params, x, rng=rng,
                                       sym=cfg.sym_recon_grad,
                                       only_R=cfg.only_R_recon)
                rvec = jnp.where(jnp.isnan(rvec), 0.0, rvec)
                recon = jnp.mean(rvec)
            total = loss + recon_weight * recon
            return total, (loss, recon)

        def apply_grads(state: TrainState, grads, loss, recon):
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            if flow.has_carry:
                # carried non-learnable state (ConvExp u): the optimizer
                # must not touch it (weight decay would corrupt it)
                carry = flow.carry_mask(state.params)
                updates = jax.tree_util.tree_map(
                    lambda u, m: jnp.zeros_like(u) if m else u,
                    updates, carry)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates)
            if cfg.weight_clamp:
                # reference "grad_clip": clamp weights (experiment.py:292-296)
                if flow.has_carry:
                    params = jax.tree_util.tree_map(
                        lambda p, m: p if m else jnp.clip(
                            p, -cfg.weight_clamp, cfg.weight_clamp),
                        params, carry)
                else:
                    params = jax.tree_util.tree_map(
                        lambda p: jnp.clip(p, -cfg.weight_clamp,
                                           cfg.weight_clamp), params)
            if flow.has_carry:
                # refresh power-iteration state against the NEW weights
                # (reference: forward-pre-hook, spectral.py:208-244)
                params = flow.update_carry(params)
            # GECO weight adaptation (selfnorm.py:219-227)
            recon_weight, recon_ema = state.recon_weight, state.recon_ema
            if cfg.recon_loss_lr > 0.0:
                is_first = state.step == 0
                recon_ema = jnp.where(
                    is_first, recon,
                    cfg.recon_alpha * recon_ema
                    + (1 - cfg.recon_alpha) * recon)
                c_t = recon_ema            # recon + (ema - recon), detached
                recon_weight = recon_weight * jnp.exp(cfg.recon_loss_lr * c_t)
            return TrainState(params, opt_state, state.step + 1,
                              recon_weight, recon_ema), loss, recon

        def train_step(state: TrainState, x, rng):
            (_, (loss, recon)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, x, rng,
                                       state.recon_weight)
            return apply_grads(state, grads, loss, recon)

        def dp_train_step(state: TrainState, x, rng):
            # shard_map body: x is the LOCAL batch shard; grads/losses are
            # pmean-reduced over the mesh before the (replicated) optimizer
            # update — the explicit-SPMD equivalent of DataParallel's
            # gradient all-reduce. Each shard folds its data-axis index
            # into the step rng so dequantization noise is independent
            # across shards — strictly better MC coverage than the
            # reference DataParallel's identically-seeded per-replica
            # generators, which reuse the same noise values on every
            # replica's (different) samples. Per-shard equivalence:
            # shard i's draw == fold_in(rng, i) on a single device
            # (tested in test_shard_map_dp_per_shard_noise_semantics).
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            (_, (loss, recon)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, x, rng,
                                       state.recon_weight)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            recon = jax.lax.pmean(recon, "data")
            return apply_grads(state, grads, loss, recon)

        def eval_logpx_sum(params, x, rng):
            # eval uses the exact-logdet path (flowsequential.py:45 —
            # compute_expensive defaults True in log_prob). The expensive
            # dense slogdets are params-only, so they are amortized: cheap
            # per-batch pass + a per-epoch exact_ldj_correction (the
            # reference's dirty-flag cache, selfnorm.py:241-246).
            # eval_mc_samples > 1 averages the dequantization-noise MC
            # estimate over several draws (the reference uses a single
            # draw per batch, experiment.py:339-369, which makes val
            # curves noisy at eval_epochs=1).
            if cfg.eval_mc_samples <= 1:
                return jnp.sum(flow.cheap_log_prob(params, x, rng=rng))
            rngs = jax.random.split(rng, cfg.eval_mc_samples)
            lp = jax.lax.map(
                lambda r: flow.cheap_log_prob(params, x, rng=r), rngs)
            return jnp.sum(jnp.mean(lp, axis=0))

        def exact_corr(params):
            return flow.exact_ldj_correction(params, self.data_shape)

        donate = (0,)
        if self.mesh is not None and cfg.data_parallel_impl == "shard_map":
            from jax.sharding import PartitionSpec as P
            xspec = P("data", *([None] * len(self.data_shape)))
            # check_vma=False: pallas_call does not declare varying-manifest
            # axes yet (same as tests/test_fused_chain.py's shard_map test);
            # replication of the outputs holds by construction (grads are
            # pmean'd before any state update).
            self._train_step = jax.jit(
                jax.shard_map(dp_train_step, mesh=self.mesh,
                              in_specs=(P(), xspec, P()), out_specs=P(),
                              check_vma=False),
                donate_argnums=donate)

            def dp_eval(params, x, rng):
                # same per-shard fold as dp_train_step: independent eval
                # MC noise across shards
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                return jax.lax.psum(eval_logpx_sum(params, x, rng), "data")
            self._eval_logpx = jax.jit(
                jax.shard_map(dp_eval, mesh=self.mesh,
                              in_specs=(P(), xspec, P()), out_specs=P(),
                              check_vma=False))
        elif self.mesh is not None:
            x_shard = batch_sharding(self.mesh, 1 + len(self.data_shape))
            self._train_step = jax.jit(train_step, donate_argnums=donate,
                                       in_shardings=(None, x_shard, None))
            self._eval_logpx = jax.jit(
                eval_logpx_sum, in_shardings=(None, x_shard, None))
        else:
            self._train_step = jax.jit(train_step, donate_argnums=donate)
            self._eval_logpx = jax.jit(eval_logpx_sum)
        # unsharded fallback for eval batches that don't divide the mesh
        # (the final partial batch of a drop_last=False val/test loader)
        self._eval_logpx_local = (jax.jit(eval_logpx_sum)
                                  if self.mesh is not None
                                  else self._eval_logpx)
        self._exact_corr = jax.jit(exact_corr)
        self._sample = jax.jit(
            lambda params, rng, exact: flow.sample(
                params, rng, cfg.n_samples, exact=exact),
            static_argnums=(2,))
        self._sample_one = jax.jit(
            lambda params, rng: flow.sample(params, rng, 1))
        self._reconstruct = jax.jit(
            lambda params, x, rng: flow.reconstruct(params, x, rng=rng))

        def sample_chain(params, rng):
            # n=1 samples chained INSIDE one program (lax.scan): the
            # per-image device latency without per-call dispatch cost —
            # the in-harness twin of bench.py's sampling methodology.
            def body(acc, r):
                return acc + jnp.sum(flow.sample(params, r, 1)), None
            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(rng, 8))
            return acc
        self._sample_chain = jax.jit(sample_chain)

    # ------------------------------------------------------------------
    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _unshard(self, x):
        """Gather a (possibly mesh-sharded) batch to one fully
        replicated array. Diagnostic paths (reconstruct plots, verbose
        per-layer ldj, data-dependent init) run OUTSIDE shard_map,
        where the automatic partitioner would have to split any fused
        pallas_call (disallowed) — feed them an unsharded batch; their
        cost is irrelevant."""
        if self.mesh is None:
            return x
        return jnp.asarray(np.asarray(x))

    def _prep_batch(self, x, shard=True):
        # Image batches are raw 0-255 values (ToTensorNoNorm semantics);
        # uploading them as uint8 and casting on device cuts host->device
        # traffic 4x — the dominant per-step cost on low-bandwidth
        # (tunneled) links. The integrality check runs PER BATCH (a cheap
        # host pass) so a later non-integral batch (augmentation, mixed
        # data) can never be silently truncated; once a batch fails the
        # check, u8 upload is disabled for the rest of the run.
        if isinstance(x, np.ndarray) and x.dtype == np.uint8:
            x = jnp.asarray(np.ascontiguousarray(x)).astype(jnp.float32)
        elif (self._u8_upload is not False and isinstance(x, np.ndarray)
              and x.size):
            # one-pass gate: the uint8 cast round-trips equal iff every
            # value is integral in [0, 255] (fractions truncate, out-of-
            # range wraps — either breaks equality); the cast output IS
            # the upload buffer, so the check costs one cast + one
            # comparison. Empty batches decide nothing.
            # errstate: NaN/inf float batches would warn on the probe
            # cast ("invalid value encountered"); the equality check
            # below still correctly rejects them.
            with np.errstate(invalid="ignore"):
                u8 = x.astype(np.uint8)
            if np.array_equal(u8, x):
                self._u8_upload = True
                x = jnp.asarray(np.ascontiguousarray(u8)).astype(jnp.float32)
            else:
                self._u8_upload = False
                x = jnp.asarray(x, jnp.float32)
        else:
            x = jnp.asarray(x, jnp.float32)
        if (shard and self.mesh is not None
                and x.shape[0] % self.mesh.size == 0):
            # a final partial eval batch may not divide the mesh; it
            # stays unsharded and eval_epoch routes it to the local fn
            from ..parallel.mesh import shard_batch
            x = shard_batch(x, self.mesh)
        return x

    def _prefetch_batches(self, loader, depth: int = 2):
        """Yield (host_batch, device_batch) with the NEXT upload already
        issued while the current step computes — jnp.asarray dispatches
        the transfer asynchronously, so device compute and host->device
        traffic overlap (the torch DataLoader pin_memory/non_blocking
        equivalent)."""
        buf = []
        for x in loader:
            buf.append((x, self._prep_batch(x)))
            if len(buf) >= depth:
                yield buf.pop(0)
        while buf:
            yield buf.pop(0)

    def maybe_data_init(self, x):
        if self._data_initialized:
            return
        params = self.flow.data_init(self.state.params,
                                     self._prep_batch(x, shard=False),
                                     rng=self._next_rng())
        self.state = self.state._replace(
            params=params, opt_state=self.tx.init(params))
        self._data_initialized = True

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        from ..utils.profiling import trace
        for e in range(self.summary["Epoch"] + 1, cfg.epochs + 1):
            self.summary["Epoch"] = e
            # XLA profiler capture of the first epoch when requested
            # (TPU analogue of the reference's CUDA-event instrumentation,
            # experiment.py:221-224)
            with trace(cfg.profile_dir if e == 1 else None):
                avg_loss = self.train_epoch(e)
            self.logger.log("Train Avg Loss", avg_loss)
            self.memory_tracker.log_to(self.logger)

            if e % cfg.eval_epochs == 0:
                if cfg.eval_train:
                    tr = self.eval_epoch(self.train_loader)
                    self.logger.log("Train LogPx", tr)
                    self.logger.log("Train BPD", self.to_bpd(tr))
                val = self.eval_epoch(self.val_loader)
                self.logger.log("Val LogPx", val)
                if cfg.verbose:
                    self._log_per_layer_ldj()
                self.logger.log("Val BPD", self.to_bpd(val))
                if val > self.summary["Best Val LogPx"]:
                    self.summary["Best Val LogPx"] = val
                    self.summary["Best Val BPD"] = self.to_bpd(val)
                    test = self.eval_epoch(self.test_loader)
                    self.logger.log("Test LogPx", test)
                    self.logger.log("Test BPD", self.to_bpd(test))
                    self.summary["Test LogPx"] = test
                    self.summary["Test BPD"] = self.to_bpd(test)
                    self.save()

            if e < 5 or e == 10 or e % cfg.sample_epochs == 0:
                self.sample(e)
            if cfg.save_images and e % cfg.vis_epochs == 0:
                # filter heatmaps (selfnorm.py:248-278 wandb plots)
                self.flow.plot_filters(
                    self.state.params,
                    os.path.join(cfg.sample_dir, "filters"),
                    prefix=f"e{e:04d}")
        return self.summary

    # ------------------------------------------------------------------
    def train_epoch(self, epoch):
        cfg = self.cfg
        num_batches = 0
        epoch_losses, durations = [], []
        last_x = None
        prev_loss = None
        # Window timing: syncing a SINGLE step pays the full backend
        # round-trip (measured ~220 ms/call on the tunneled chip vs ~1 ms
        # of device work — round-1 VERDICT's 366x inflation). Instead, a
        # window of `timing_window` consecutive steps is timed between two
        # syncs; the steps chain through the train state, so the device
        # executes them back-to-back and elapsed/W is the true per-step
        # time (the per-call RTT amortizes away). Untimed steps dispatch
        # fully async.
        win_w = max(1, cfg.timing_window)
        win_left, win_n, t0 = 0, 0, 0.0
        pending_logs = []               # (batch_idx, loss_dev, recon_dev)
        batches = self._prefetch_batches(self.train_loader)

        if cfg.log_timing and epoch == 1:
            # Compute-only step time, measured BEFORE any device->host
            # value read: a chained window on a fixed on-device batch (no
            # input pipeline) — the device-work equivalent of the
            # reference's CUDA-event convention (``experiment.py:
            # 259-262``), which brackets GPU work only. It runs first
            # because on async/tunneled backends the FIRST host readback
            # of any result value can permanently degrade per-dispatch
            # latency (measured on the axon tunnel: 0.9 -> 183 ms/call
            # after one float(loss)); everything after it is unaffected
            # device-side. Runs on a copy of the train state (the jitted
            # step donates its inputs) and discards the result.
            first = next(batches, None)
            if first is not None:
                self.maybe_data_init(first[0])
                xb0 = first[1]
                st = jax.tree_util.tree_map(lambda a: a + 0
                                            if hasattr(a, "dtype") else a,
                                            self.state)
                st, l0, _ = self._train_step(st, xb0, self._next_rng())
                jax.block_until_ready(l0)    # absorb donation/first-run
                t0 = time.perf_counter()
                for i in range(win_w):
                    st, l0, _ = self._train_step(st, xb0,
                                                 self._next_rng())
                jax.block_until_ready(l0)
                ms = (time.perf_counter() - t0) * 1e3 / win_w
                self.logger.summary("Batch Compute Time Mean", ms)
                # The window is synced with block_until_ready, which on
                # some tunneled backends returns at enqueue-ack, not
                # device completion (BASELINE.md "Measurement
                # methodology") — so this metric's meaning depends on
                # the backend. Record the sync regime next to the value;
                # authoritative device time comes from the slope method
                # (bench.py / scripts/scan_slope_bench.py).
                self.logger.summary(
                    "Batch Compute Time sync regime",
                    "block_until_ready window (enqueue-ack on some "
                    "tunneled backends; slope method is authoritative)")
                # sampling latency the same way (also pre-readback):
                # chained calls of an in-program 8-sample scan; latency
                # is shape-dependent, so untrained params are fine
                r = self._next_rng()
                y = self._sample_chain(self.state.params, r)
                jax.block_until_ready(y)
                t0 = time.perf_counter()
                for i in range(4):
                    r = jax.random.fold_in(r, i)
                    y = self._sample_chain(self.state.params, r)
                jax.block_until_ready(y)
                ms = (time.perf_counter() - t0) * 1e3 / (4 * 8)
                self.logger.summary("Sample Compute Time Mean", ms)
                import itertools
                batches = itertools.chain([first], batches)

        for x, xb in batches:
            self.maybe_data_init(x)
            last_x = xb
            if (cfg.log_timing and win_left == 0
                    and num_batches % max(1, cfg.timing_interval) == 0):
                if prev_loss is not None:
                    jax.block_until_ready(prev_loss)   # drain queued work
                t0 = time.perf_counter()
                win_left, win_n = win_w, 0
            self.state, loss, recon = self._train_step(
                self.state, xb, self._next_rng())
            if win_left:
                win_left -= 1
                win_n += 1
                if win_left == 0:
                    jax.block_until_ready(loss)
                    durations.append(
                        (time.perf_counter() - t0) * 1e3 / win_n)
            prev_loss = loss
            # keep losses on device — float() here is a device->host
            # readback, which both stalls the pipeline and (on tunneled
            # backends) degrades all subsequent dispatch; logs flush in
            # one transfer at epoch end
            epoch_losses.append(loss)
            num_batches += 1
            if win_left and num_batches == len(self.train_loader):
                # epoch ends mid-window: close it over the steps it got
                jax.block_until_ready(loss)
                durations.append((time.perf_counter() - t0) * 1e3 / win_n)
                win_left = 0
            if num_batches % cfg.log_interval == 0:
                pending_logs.append((num_batches, loss, recon))

        if pending_logs:
            final_step = int(self.state.step)
            vals = jax.device_get([(l, r) for _, l, r in pending_logs])
            for (b, _, _), (lv, rv) in zip(pending_logs, vals):
                self.logger.log("Train Batch Loss", float(lv),
                                step=final_step - num_batches + b)
                if cfg.add_recon_grad:
                    self.logger.log("Train Total Recon Loss", float(rv))

        if cfg.log_timing and durations:
            # durations holds ONE per-step mean per timed window (window
            # timing, not per-batch events), so trim the first window —
            # it absorbs compile/warmup — rather than the reference's
            # first/last-100-batches convention (experiment.py:326-331),
            # which assumed one entry per batch.
            self.batch_time.update(durations[1:] if len(durations) > 1
                                   else durations)
            self.logger.summary("Batch Time Mean", self.batch_time.mean)
            self.logger.summary("Batch Time Std", self.batch_time.std)

        if cfg.plot_recon and last_x is not None:
            self.plot_recon(last_x, epoch)
        total_loss = float(np.sum(jax.device_get(epoch_losses))) \
            if epoch_losses else 0.0
        return total_loss / max(1, num_batches)

    def eval_epoch(self, loader):
        total, num = 0.0, 0
        corr = None
        sums = []
        for x, xb in self._prefetch_batches(loader):
            self.maybe_data_init(x)
            if corr is None:
                # exact-logdet offset: once per eval epoch (params frozen);
                # kept on device — readbacks are deferred to one flush
                corr = self._exact_corr(self.state.params)
            fn = self._eval_logpx
            if self.mesh is not None and x.shape[0] % self.mesh.size:
                fn = self._eval_logpx_local
            sums.append(fn(self.state.params, xb, self._next_rng()))
            num += x.shape[0]
            if num >= self.cfg.max_eval_ex:
                break
        total = float(np.sum(jax.device_get(sums))) if sums else 0.0
        total += (float(corr) if corr is not None else 0.0) * num
        return total / max(1, num)

    def _log_per_layer_ldj(self):
        """Per-layer mean ldj on one batch (reference `verbose` option,
        README.md:121)."""
        x = next(iter(self.val_loader))
        _, _, per_layer = self.flow.forward_verbose(
            self.state.params, self._prep_batch(x, shard=False),
            rng=self._next_rng())
        for name, v in per_layer.items():
            self.logger.log(f"ldj/{name}", float(v))

    # ------------------------------------------------------------------
    def sample(self, epoch):
        cfg = self.cfg
        exact = not cfg.modified_grad
        if cfg.log_timing:
            n = max(5, min(cfg.n_samples, 100))
            durations = []
            out = self._sample_one(self.state.params, self._next_rng())
            jax.block_until_ready(out)   # exclude compile
            for _ in range(n):
                t0 = time.perf_counter()
                out = self._sample_one(self.state.params, self._next_rng())
                jax.block_until_ready(out)
                durations.append((time.perf_counter() - t0) * 1e3)
            # 20% head/tail trim (experiment.py:398). NOTE: this legacy
            # per-call metric includes one host->device dispatch round-trip
            # per image (the reference's convention); on tunneled backends
            # that RTT dwarfs device work — "Sample Compute Time Mean"
            # (the pre-readback chained window logged in train_epoch) is
            # the device-latency number.
            self.sample_time.update(sorted(durations)[n // 5: -(n // 5)])
            self.logger.summary("Sample Time Mean (per-call, RTT-incl)",
                                self.sample_time.mean)
            self.logger.summary("Sample Time Std", self.sample_time.std)

        # exact inverses when the run disables the modified-grad
        # approximation (mirrors loss_fn's gate on cfg.modified_grad)
        x = self._sample(self.state.params, self._next_rng(), exact)
        self._save_image_grid(x, f"{epoch}.png")
        if cfg.sample_true_inv:
            x_true = self._sample(self.state.params, self._next_rng(), True)
            self._save_image_grid(x_true, f"{epoch}_trueinv.png")
        return x

    def plot_recon(self, x, epoch):
        x = self._unshard(x)
        xhat = self._reconstruct(self.state.params, x, self._next_rng())
        # FC flows reconstruct to the flat vector; view as the input image
        xhat = xhat.reshape(x.shape)
        self._save_image_grid(x, f"{epoch}_x.png")
        self._save_image_grid(xhat, f"{epoch}_xrecon.png")
        self._save_image_grid(jnp.abs(x - xhat), f"{epoch}_recon_diff.png")
        return xhat

    def _save_image_grid(self, x, fname, nrow=10):
        """PNG grid like torchvision.utils.save_image (values in [0,256))."""
        if not self.cfg.save_images:
            return
        try:
            from ..utils.imaging import save_image_grid
            os.makedirs(self.cfg.sample_dir, exist_ok=True)
            save_image_grid(np.asarray(jax.device_get(x)) / 256.0,
                            os.path.join(self.cfg.sample_dir, fname),
                            nrow=nrow)
        except Exception as e:  # imaging must never kill training
            self.logger.log("Warning", f"image save failed: {e}")

    # ------------------------------------------------------------------
    def save(self):
        self.logger.log(
            "Note", f"Saving checkpoint to: {self.checkpoint_path}")
        save_checkpoint(self.checkpoint_path, self.state, self.summary,
                        self.cfg.to_dict())

    def load(self, path=None):
        path = path or self.checkpoint_path
        self.logger.log("Note", f"Loading checkpoint from: {path}")
        state, summary = load_checkpoint(path, self.cfg.to_dict(),
                                         log=lambda m: self.logger.log(
                                             "Warning", m))
        # rebuild as TrainState with on-device arrays
        self.state = TrainState(*jax.tree_util.tree_map(jnp.asarray,
                                                        tuple(state)))
        self.summary = dict(summary)
        self._data_initialized = True
