"""The training runtime: explicit jitted train/eval steps + a thin epoch loop.

Replaces the reference's Lightning ``pl.Trainer`` (``chemprop/cli/train.py:
1912-1940``) with a TPU-first design:

* one jitted ``train_step`` (loss -> grad -> optax Adam -> Noam LR), donated
  state, compiled once per batch bucket shape;
* masked losses: targets carry NaN for missing tasks AND padded samples, so
  ``isfinite`` is the single masking mechanism (reference
  ``models/model.py:152-153``);
* metric accumulation as pytree states updated inside the jitted eval step
  (distributed reduction = ``psum`` when running under shard_map);
* host-side: early stopping, best/last checkpointing, CSV logging.

Data parallelism: batches are sharded over a 1-D device mesh along the
batch/node/edge axes via ``NamedSharding``; jit inserts the gradient
all-reduce (see chemprop_tpu/parallel/).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from chemprop_tpu.data.collate import TrainingBatch
from chemprop_tpu.data.dataloader import DataLoader
from chemprop_tpu.models.model import MPNN
from chemprop_tpu.nn.metrics import ChempropMetric
from chemprop_tpu.train.schedulers import build_noam_like_schedule, noam_lr_host

logger = logging.getLogger(__name__)


def _set_path(tree: dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        key = getattr(k, "key", str(k))
        node = node.setdefault(key, {})
    node[getattr(path[-1], "key", str(path[-1]))] = value


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def _device_prefetch(loader, sharding=None, depth: int = 2):
    """Iterate ``loader`` with batches already on device, keeping ``depth``
    transfers in flight: H2D of batch k+1 overlaps the compute of batch k
    (double-buffering; jax.device_put is asynchronous)."""
    from collections import deque

    q: deque = deque()
    it = iter(loader)
    try:
        while len(q) < depth:
            host = next(it)
            q.append((host, _device_put_batch(host, sharding)))
    except StopIteration:
        pass
    for host in it:
        yield q[0]
        q.popleft()
        q.append((host, _device_put_batch(host, sharding)))
    while q:
        yield q.popleft()


def _device_put_batch(batch: TrainingBatch, sharding=None):
    if sharding is None:
        return jax.device_put(batch)
    return jax.device_put(batch, sharding)


def _restore_order(preds: np.ndarray, loader, axis: int = 0) -> np.ndarray:
    """Un-permute concatenated predictions back to dataset row order when the
    loader's oversized-molecule isolation reordered batch emission
    (DataLoader.emitted_order; None = order may reshuffle, identity = no-op)."""
    order_fn = getattr(loader, "emitted_order", None)
    if order_fn is None:
        return preds
    order = order_fn()
    if order is None or preds.shape[axis] != len(order):
        return preds
    if np.array_equal(order, np.arange(len(order))):
        return preds
    # argsort (not a scatter-inverse) so a drop_last SUBSET of dataset
    # indices restores to ascending dataset order without indexing past
    # len(order)
    return np.take(preds, np.argsort(order, kind="stable"), axis=axis)


def _count_edges(host_batch) -> int:
    bmgs = (
        host_batch.bmg if isinstance(host_batch.bmg, tuple) else (host_batch.bmg,)
    )
    return int(sum(np.asarray(b.edge_mask).sum() for b in bmgs))


def _batch_signature(host_batch):
    leaves, treedef = jax.tree_util.tree_flatten(host_batch)
    return treedef, tuple((np.shape(x), np.asarray(x).dtype.str) for x in leaves)


def _stack_batches(batches: list):
    return jax.tree.map(lambda *xs: np.stack(xs), *batches)


def _prefetch_chunk_put(loader, K: int, sharding=None, depth: int = 2):
    """Yield ``(n_real_edges, k_steps, device_batch)``. With ``K > 1``,
    consecutive same-shape host batches are stacked into ``[k, ...]`` chunks
    (flushed on shape change) for the scan step; device transfers stay
    ``depth`` chunks ahead of compute (jax.device_put is asynchronous)."""
    from collections import deque

    def chunks():
        cur, cur_key, cur_edges = [], None, 0
        for hb in loader:
            e = _count_edges(hb)
            if K <= 1:
                yield e, 0, hb  # k=0 marks "not stacked"
                continue
            key = _batch_signature(hb)
            if cur and (key != cur_key or len(cur) == K):
                yield cur_edges, len(cur), _stack_batches(cur)
                cur, cur_edges = [], 0
            cur.append(hb)
            cur_key, cur_edges = key, cur_edges + e
        if cur:
            yield cur_edges, len(cur), _stack_batches(cur)

    q: deque = deque()
    it = chunks()
    for e, k, host in it:
        q.append((e, k, _device_put_batch(host, sharding)))
        if len(q) > depth:
            yield q.popleft()
    while q:
        yield q.popleft()


@dataclass
class Trainer:
    model: MPNN
    max_epochs: int = 50
    warmup_epochs: int = 2
    init_lr: float = 1e-4
    max_lr: float = 1e-3
    final_lr: float = 1e-4
    grad_clip: float | None = None
    patience: int | None = None
    monitor: str = "val_loss"
    mode: str = "min"
    min_delta: float = 0.0
    checkpoint_dir: str | Path | None = None
    seed: int = 0
    # named validation metrics, logged per epoch as ``val_<name>`` (trackable
    # via ``monitor``); computed on val_step_preds like the reference's
    # _evaluate_batch (inference activations, no output unscaling)
    val_metrics: dict[str, ChempropMetric] = field(default_factory=dict)
    log_every: int = 0
    # per-epoch scalar logging as tfevents (reference: Lightning
    # TensorBoardLogger, chemprop/cli/train.py:1843-1851); written by the
    # in-repo torch-free writer (chemprop_tpu/utils/tbevents.py). CSV/JSON
    # history stays the default — this is additive, behind the flag.
    tensorboard_dir: str | Path | None = None
    # jax.profiler trace of training steps in epoch 0 (TensorBoard-viewable);
    # the reference has no profiling at all (SURVEY.md §5.1) — on TPU this is
    # the tool that finds HBM-bandwidth stalls in the scatter path
    profile_dir: str | Path | None = None
    profile_steps: int = 5
    mesh: Any = None  # jax.sharding.Mesh: shard batches / replicate params
    data_sharding: Any = None  # NamedSharding pytree for input batches
    # explicit-SPMD mode: expects stacked-shard batches (DataLoader
    # n_shards = mesh size) and runs the train/eval steps under shard_map so
    # each chip executes the Pallas fast path on its own shard
    # (chemprop_tpu/parallel/shard_train.py); mesh is required
    sharded: bool = False
    # transfer learning: predicate on the flattened param path; matching
    # subtrees get zero updates (reference --freeze-encoder / --frzn-ffn-layers)
    freeze: Callable[[str], bool] | None = None
    # parameter init scheme: "lecun" (flax defaults) or "torch" (the
    # reference's nn.Linear law: kaiming-uniform weights, uniform biases) —
    # see chemprop_tpu/nn/init.py
    param_init: str = "lecun"
    # train steps chained per device dispatch (lax.scan over stacked
    # same-shape batches). None = auto by batch size: small batches are
    # chained so per-step host/link overhead amortizes (remote-TPU dispatch
    # and fetch latencies otherwise dominate small-dataset training); large
    # batches run one step per dispatch. 1 disables chaining.
    steps_per_dispatch: int | None = None

    # populated during fit
    start_epoch: int = 0
    state: TrainState | None = None
    best_variables: dict | None = None
    history: list[dict] = field(default_factory=list)

    # jit caches, reused across fits of the same trainer (a fresh closure per
    # fit would recompile every seed of a multi-seed run)
    _jit_key: tuple | None = field(default=None, repr=False)
    _train_step_jit: Any = field(default=None, repr=False)
    _scan_step_jit: Any = field(default=None, repr=False)
    _eval_step_jit: Any = field(default=None, repr=False)
    _init_jit: Any = field(default=None, repr=False)
    _best_update_jit: Any = field(default=None, repr=False)
    _predict_jits: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------ setup
    def _build_optimizer(self, steps_per_epoch: int) -> optax.GradientTransformation:
        warmup_steps = self.warmup_epochs * steps_per_epoch
        cooldown_steps = max(1, (self.max_epochs - self.warmup_epochs) * steps_per_epoch)
        self._sched_args = (
            warmup_steps, cooldown_steps, self.init_lr, self.max_lr, self.final_lr
        )
        self.lr_schedule = build_noam_like_schedule(*self._sched_args)
        tx = optax.adam(self.lr_schedule)
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        if self.freeze is not None:
            freeze = self.freeze

            def label(params):
                flat = jax.tree_util.tree_flatten_with_path(params)[0]
                labels = {}
                for path, _ in flat:
                    key = "/".join(getattr(k, "key", str(k)) for k in path)
                    _set_path(labels, path, "freeze" if freeze(key) else "train")
                return labels

            tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, label)
        return tx

    def _check_jit_cache(self, steps_per_epoch: int) -> None:
        """Invalidate the cached jitted functions when anything they close
        over changes; identical refits (multi-seed runs) reuse them and skip
        retrace + recompile."""
        key = (steps_per_epoch, id(self.model), self.sharded)
        if key != self._jit_key:
            self._jit_key = key
            self._train_step_jit = self._scan_step_jit = None
            self._eval_step_jit = self._init_jit = self._best_update_jit = None
            self._predict_jits.clear()
        # param_init only affects parameter creation, not the step functions
        if getattr(self, "_init_key", None) != self.param_init:
            self._init_key = self.param_init
            self._init_jit = None

    def init_state(self, batch: TrainingBatch, steps_per_epoch: int) -> TrainState:
        self._check_jit_cache(steps_per_epoch)
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        if self._init_jit is None:
            from chemprop_tpu.nn.init import init_scheme

            model, scheme = self.model, self.param_init

            def _init(init_rng, bmg, V_d, X_d):
                with init_scheme(scheme):
                    return model.init(init_rng, bmg, V_d, X_d, is_training=False)

            self._init_jit = jax.jit(_init)
        variables = self._init_jit(init_rng, batch.bmg, batch.V_d, batch.X_d)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        self.tx = self._build_optimizer(steps_per_epoch)
        opt_state = self.tx.init(params)
        n_params = sum(x.size for x in jax.tree.leaves(params))
        logger.info(f"initialized model with {n_params:,} parameters")
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    # ------------------------------------------------------------------ steps
    def _make_train_step(self) -> Callable:
        if self.sharded:
            if self._train_step_jit is None:
                from chemprop_tpu.parallel.shard_train import make_sharded_train_step

                self._train_step_jit = make_sharded_train_step(
                    self.model, self.model.criterion, self.tx, self.mesh
                )
            return self._train_step_jit
        if self._train_step_jit is None:
            self._train_step_jit = jax.jit(self._train_body(), donate_argnums=(0,))
        return self._train_step_jit

    def _make_scan_step(self) -> Callable:
        """``(state, stacked_batches[K]) -> (state, losses[K])`` — K chained
        train steps per dispatch (lax.scan), so per-step dispatch/link
        latency amortizes K-fold on small batches."""
        if self._scan_step_jit is None:
            body = self._train_body()

            def scan_steps(state, batches):
                return jax.lax.scan(body, state, batches)

            self._scan_step_jit = jax.jit(scan_steps, donate_argnums=(0,))
        return self._scan_step_jit

    def _train_body(self) -> Callable:
        model, criterion, tx = self.model, self.model.criterion, self.tx

        def train_step(state: TrainState, batch: TrainingBatch):
            rng, dropout_rng = jax.random.split(state.rng)
            bmg, V_d, X_d, Y, w, lt, gt = batch

            def loss_fn(params):
                variables = {"params": params}
                mutable = False
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(
                    variables,
                    bmg,
                    V_d,
                    X_d,
                    is_training=True,
                    method="train_step_preds",
                    rngs={"dropout": dropout_rng},
                    mutable=mutable,
                )
                preds, new_model_state = out if mutable else (out, {})
                mask = jnp.isfinite(Y)
                targets = jnp.nan_to_num(Y)
                lt_ = jnp.zeros_like(mask) if lt is None else lt
                gt_ = jnp.zeros_like(mask) if gt is None else gt
                loss = criterion(preds, targets, mask, w[:, 0], lt_, gt_)
                return loss, new_model_state

            (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params,
                batch_stats=new_model_state.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                step=state.step + 1,
                rng=rng,
            )
            return new_state, loss

        return train_step

    def _make_best_update(self) -> Callable:
        """Device-side best-epoch tracking: ``(best, score, variables, epoch)
        -> best`` where ``best = (score, epoch, variables)``. Keeps the
        per-epoch monitor comparison and the best-parameter snapshot entirely
        on device — no host fetch, no host-side parameter copy per epoch."""
        if self._best_update_jit is None:
            minimize, min_delta = self.mode == "min", self.min_delta

            def update_best(best, score, variables, epoch):
                best_score, best_epoch, best_vars = best
                better = (
                    score < best_score - min_delta
                    if minimize
                    else score > best_score + min_delta
                )
                new_vars = jax.tree.map(
                    lambda b, p: jnp.where(better, p, b), best_vars, variables
                )
                return (
                    jnp.where(better, score, best_score),
                    jnp.where(better, epoch, best_epoch),
                    new_vars,
                )

            self._best_update_jit = jax.jit(update_best, donate_argnums=(0,))
        return self._best_update_jit

    def _make_eval_step(self) -> Callable:
        if self.sharded:
            if self._eval_step_jit is None:
                from chemprop_tpu.parallel.shard_train import make_sharded_eval_step

                self._eval_step_jit = make_sharded_eval_step(
                    self.model, self.model.criterion, self.mesh
                )
            return self._eval_step_jit
        if self._eval_step_jit is not None:
            return self._eval_step_jit
        model, criterion = self.model, self.model.criterion

        def eval_step(params, batch_stats, batch: TrainingBatch):
            bmg, V_d, X_d, Y, w, lt, gt = batch
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            mask = jnp.isfinite(Y)
            targets = jnp.nan_to_num(Y)
            lt_ = jnp.zeros_like(mask) if lt is None else lt
            gt_ = jnp.zeros_like(mask) if gt is None else gt
            # criterion on train-space preds (reference validation_step)
            train_preds = model.apply(
                variables, bmg, V_d, X_d, is_training=False, method="train_step_preds"
            )
            loss_state = criterion.update_state(
                criterion.init_state(), train_preds, targets, mask, w[:, 0], lt_, gt_
            )
            # metrics on inference activations without unscaling
            # (reference _evaluate_batch)
            preds = model.apply(
                variables, bmg, V_d, X_d, is_training=False, method="val_step_preds"
            )
            return loss_state, preds

        self._eval_step_jit = jax.jit(eval_step)
        return self._eval_step_jit

    # ------------------------------------------------------------------- fit
    def fit(self, train_loader: DataLoader, val_loader: DataLoader | None = None) -> TrainState:
        steps_per_epoch = len(train_loader)
        first_batch = next(iter(train_loader))
        init_batch = first_batch
        if self.sharded:
            from chemprop_tpu.parallel.shard_train import is_sharded_batch, local_shard
            from chemprop_tpu.parallel.sharding import DATA_AXIS

            if self.mesh is None:
                raise ValueError("sharded=True requires a mesh")
            if not is_sharded_batch(first_batch):
                raise ValueError(
                    "sharded=True requires stacked-shard batches "
                    "(DataLoader(n_shards=mesh size))"
                )
            # sync batch-norm moments across chips so sharded training is
            # numerically identical to single-device training
            if getattr(self.model, "batch_norm", False) and getattr(
                self.model, "bn_axis", None
            ) is None:
                self.model = self.model.clone(bn_axis=DATA_AXIS)
            init_batch = local_shard(first_batch)
        if self.state is None:
            self.state = self.init_state(init_batch, steps_per_epoch)
        if self.mesh is not None:
            from chemprop_tpu.parallel.sharding import batch_shardings, replicate

            self.state = replicate(self.state, self.mesh)
            if self.data_sharding is None:
                self.data_sharding = batch_shardings(self.mesh, first_batch)
        train_step = self._make_train_step()
        eval_step = self._make_eval_step() if val_loader is not None else None

        tb_writer = None
        if self.tensorboard_dir is not None:
            from chemprop_tpu.utils.tbevents import ScalarEventWriter

            tb_writer = ScalarEventWriter(self.tensorboard_dir)

        # steps chained per dispatch: small batches amortize per-dispatch
        # host/link overhead K-fold via lax.scan; big batches (compute-bound)
        # and instrumented/sharded paths run one step per dispatch
        if self.sharded or self.mesh is not None or self.profile_dir is not None:
            K = 1
        elif self.steps_per_dispatch is not None:
            K = max(1, int(self.steps_per_dispatch))
        else:
            nbytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(first_batch))
            K = int(max(1, min(50, 8_000_000 // max(1, nbytes))))
        scan_step = self._make_scan_step() if K > 1 else None

        # deferred-sync mode: nothing in this configuration needs a per-epoch
        # host value, so the monitor comparison and best-parameter snapshot
        # run on device and every scalar is fetched once after the last epoch
        # (per-epoch round trips otherwise dominate small-dataset wall-clock
        # on remote-TPU links)
        deferred = (
            val_loader is None
            and self.checkpoint_dir is None
            and self.patience is None
            and not self.log_every
            and tb_writer is None
            and not self.sharded
        )

        best_score = np.inf if self.mode == "min" else -np.inf
        best_epoch = -1
        epochs_since_improvement = 0
        host_step = self.start_epoch * steps_per_epoch
        dev_best = None
        dev_epoch_losses: list = []
        n_fit_epochs = 0
        if deferred:
            update_best = self._make_best_update()
            # jnp.copy: update_best donates its best argument, so the initial
            # snapshot must not alias the live training state
            dev_best = (
                jnp.asarray(best_score, jnp.float32),
                jnp.asarray(-1, jnp.int32),
                jax.tree.map(
                    jnp.copy,
                    {"params": self.state.params, "batch_stats": self.state.batch_stats},
                ),
            )

        for epoch in range(self.start_epoch, self.max_epochs):
            t0 = time.time()
            # ---- train
            n_edges = 0
            losses = []
            profiling = False
            for step_i, (chunk_edges, k, batch) in enumerate(
                _prefetch_chunk_put(train_loader, K, self.data_sharding)
            ):
                if (
                    self.profile_dir is not None
                    and epoch == self.start_epoch
                    and step_i == 1  # skip the compile step
                ):
                    jax.profiler.start_trace(str(self.profile_dir))
                    profiling = True
                # edge counts come from the HOST batches: touching device
                # arrays here would block the dispatch pipeline every step
                # (on remote-TPU links that round-trip dominates epoch time)
                n_edges += chunk_edges
                if k:  # stacked chunk of k steps
                    self.state, ls = scan_step(self.state, batch)
                    losses.append(ls)
                    host_step += k
                else:
                    self.state, loss = train_step(self.state, batch)
                    losses.append(loss)
                    host_step += 1
                if profiling and step_i >= self.profile_steps:
                    jax.block_until_ready(losses[-1])
                    jax.profiler.stop_trace()
                    profiling = False
                    logger.info(f"wrote jax.profiler trace to {self.profile_dir}")
            if profiling:
                jax.block_until_ready(losses[-1])
                jax.profiler.stop_trace()
            epoch_loss_dev = (
                jnp.mean(jnp.concatenate([jnp.atleast_1d(l) for l in losses]))
                if losses
                else jnp.asarray(float("nan"))
            )
            dt = time.time() - t0
            record = {
                "epoch": epoch,
                "train_loss": float("nan"),
                "time_s": dt,
                "edges_per_s": n_edges / max(dt, 1e-9),
                "lr": noam_lr_host(host_step, *self._sched_args),
            }
            n_fit_epochs += 1

            if deferred:
                dev_epoch_losses.append(epoch_loss_dev)
                dev_best = update_best(
                    dev_best,
                    epoch_loss_dev,
                    {"params": self.state.params, "batch_stats": self.state.batch_stats},
                    jnp.asarray(epoch, jnp.int32),
                )
                self.history.append(record)
                continue

            # one device->host fetch per epoch, after the queue has drained
            train_loss = float(epoch_loss_dev) if losses else float("nan")
            record["train_loss"] = train_loss

            # ---- validate
            if val_loader is not None:
                record.update(self._run_validation(val_loader, eval_step))

            self.history.append(record)
            if tb_writer is not None:
                tb_writer.add_scalars(record, step=epoch)
                tb_writer.flush()
            if self.log_every and epoch % self.log_every == 0:
                logger.info(
                    " ".join(
                        f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                        for k, v in record.items()
                    )
                )

            # ---- checkpoint / early stop
            score = record.get(self.monitor, train_loss)
            improved = (
                score < best_score - self.min_delta
                if self.mode == "min"
                else score > best_score + self.min_delta
            )
            if improved:
                best_score, best_epoch = score, epoch
                epochs_since_improvement = 0
                self.best_variables = jax.device_get(
                    {"params": self.state.params, "batch_stats": self.state.batch_stats}
                )
                if self.checkpoint_dir is not None:
                    self._save_checkpoint("best")
            else:
                epochs_since_improvement += 1
            if self.checkpoint_dir is not None:
                self._save_checkpoint("last")
            if self.patience is not None and epochs_since_improvement > self.patience:
                logger.info(f"early stopping at epoch {epoch} (best epoch {best_epoch})")
                break

        if deferred and dev_best is not None:
            # single batched fetch for everything the loop deferred
            b_score, b_epoch, b_vars = dev_best
            fetched = jax.device_get(
                {"losses": dev_epoch_losses, "score": b_score, "epoch": b_epoch, "vars": b_vars}
            )
            for rec, l in zip(self.history[-n_fit_epochs:], fetched["losses"]):
                rec["train_loss"] = float(l)
            best_score, best_epoch = float(fetched["score"]), int(fetched["epoch"])
            self.best_variables = fetched["vars"]
        if tb_writer is not None:
            tb_writer.close()
        if self.best_variables is None:
            self.best_variables = jax.device_get(
                {"params": self.state.params, "batch_stats": self.state.batch_stats}
            )
        return self.state

    def _run_validation(self, val_loader: DataLoader, eval_step) -> dict[str, float]:
        criterion = self.model.criterion
        state = None
        preds_chunks, Y_chunks = [], []
        for host in val_loader:
            batch = self._put(host) if self.mesh is not None else _device_put_batch(host)
            loss_state, preds = eval_step(self.state.params, self.state.batch_stats, batch)
            if state is None:
                state = loss_state
            else:
                state = jax.tree.map(lambda a, b: a + b, state, loss_state)
            if self.val_metrics:
                # targets/masks come from the HOST batch (device fetches here
                # would add a round trip per batch)
                p = np.asarray(preds)
                Y = np.asarray(host.Y)
                if self.sharded:  # [S, B_shard, ...] -> flat rows
                    p = p.reshape((-1,) + p.shape[2:])
                    Y = Y.reshape((-1,) + Y.shape[2:])
                preds_chunks.append(p[host.pad_mask])
                Y_chunks.append(Y[host.pad_mask])
        record = {
            "val_loss": float(criterion.compute(state)) if state is not None else float("nan")
        }
        if self.val_metrics and preds_chunks:
            preds = np.concatenate(preds_chunks, axis=0)
            Y = np.concatenate(Y_chunks, axis=0)
            # multi-target heads (MVE/evidential/quantile): point pred = chan 0
            # (reference _evaluate_batch, models/model.py:195-196)
            if preds.ndim == 3 and self.model.n_targets > 1:
                preds = preds[..., 0]
            mask = np.isfinite(Y)
            targets = np.nan_to_num(Y)
            for name, metric in self.val_metrics.items():
                try:
                    if metric.needs_collection:
                        val = float(metric.compute_from_arrays(preds, Y, mask))
                    else:
                        mstate = metric.update_state(
                            metric.init_state(),
                            jnp.asarray(preds),
                            jnp.asarray(targets),
                            jnp.asarray(mask),
                            jnp.ones(len(Y)),
                            jnp.zeros_like(mask),
                            jnp.zeros_like(mask),
                        )
                        val = float(metric.compute(mstate))
                except Exception as e:  # a failed metric must not kill training
                    logger.warning(f"val metric {name} failed: {e}")
                    val = float("nan")
                record[f"val_{name}"] = val
        return record

    # --------------------------------------------------------------- predict
    def predict(
        self,
        loader: DataLoader,
        variables: dict | None = None,
        train_space: bool = False,
        use_batch_statistics: bool = False,
    ) -> np.ndarray:
        """Inference over a loader; padded rows are stripped.

        ``use_batch_statistics=True`` runs the model in train mode (per-batch
        BN statistics instead of running averages — the reference evaluates
        its overfit bar with the module left in train mode). Note this also
        activates dropout if the model was configured with a nonzero rate.
        """
        if variables is None:
            variables = self.best_variables or {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        method = "train_step_preds" if train_space else None
        if self.sharded and self.mesh is not None:
            if use_batch_statistics:
                raise NotImplementedError(
                    "use_batch_statistics predict is single-device only"
                )
            from chemprop_tpu.parallel.shard_train import make_sharded_apply

            apply_sharded = make_sharded_apply(self.model, self.mesh, method=method)
            chunks = []
            for batch in loader:
                batch = self._put(batch)
                preds = np.asarray(apply_sharded(variables, batch))
                preds = preds.reshape((-1,) + preds.shape[2:])
                chunks.append(preds[batch.pad_mask])
            return _restore_order(np.concatenate(chunks, axis=0), loader)

        cache_key = ("predict", method, use_batch_statistics)
        apply = self._predict_jits.get(cache_key)
        if apply is None:

            def _apply(v, bmg, V_d, X_d):
                kwargs = {"method": method} if method else {}
                if use_batch_statistics:
                    out = self.model.apply(
                        v,
                        bmg,
                        V_d,
                        X_d,
                        is_training=True,
                        rngs={"dropout": jax.random.PRNGKey(0)},
                        mutable=["batch_stats"] if v.get("batch_stats") else False,
                        **kwargs,
                    )
                    return out[0] if isinstance(out, tuple) else out
                return self.model.apply(v, bmg, V_d, X_d, is_training=False, **kwargs)

            apply = jax.jit(_apply)
            self._predict_jits[cache_key] = apply

        variables = jax.device_put(variables)  # once, not per batch dispatch
        dev_chunks, masks = [], []
        for host in loader:
            masks.append(host.pad_mask)  # host mask BEFORE the device put
            batch = self._put(host) if self.mesh is not None else _device_put_batch(host)
            dev_chunks.append(apply(variables, batch.bmg, batch.V_d, batch.X_d))
        # all batches dispatched asynchronously; one batched fetch at the end
        vals = jax.device_get(dev_chunks)
        preds = np.concatenate([np.asarray(v)[m] for v, m in zip(vals, masks)], axis=0)
        return _restore_order(preds, loader)

    def _put(self, batch: TrainingBatch) -> TrainingBatch:
        """Device-put a host batch with mesh shardings (multi-host safety:
        on a global mesh, feeding host-local numpy arrays straight into a jit
        would fail or silently replicate — the shardings are computed per
        batch structure since predict batches may lack targets)."""
        if self.mesh is None:
            return batch
        from chemprop_tpu.parallel.sharding import batch_shardings

        return _device_put_batch(batch, batch_shardings(self.mesh, batch))

    def predict_mc_dropout(
        self,
        loader: DataLoader,
        variables: dict | None = None,
        sampling_size: int = 10,
        seed: int = 0,
    ) -> np.ndarray:
        """``sampling_size`` stochastic forward passes with dropout active
        (Monte-Carlo dropout, cf. reference ``uncertainty/estimator.py:491-636``).
        Returns ``[sampling_size, n, ...]`` inference-space predictions; the
        caller takes mean/variance over axis 0."""
        if variables is None:
            variables = self.best_variables or {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }

        @jax.jit
        def _apply(v, bmg, V_d, X_d, key):
            return self.model.apply(
                v, bmg, V_d, X_d, method="mc_dropout_preds", rngs={"dropout": key}
            )

        keys = jax.random.split(jax.random.PRNGKey(seed), sampling_size)
        samples = []
        for s in range(sampling_size):
            chunks = []
            for b, batch in enumerate(loader):
                batch = self._put(batch)
                key = jax.random.fold_in(keys[s], b)
                preds = _apply(variables, batch.bmg, batch.V_d, batch.X_d, key)
                chunks.append(np.asarray(preds)[batch.pad_mask])
            samples.append(_restore_order(np.concatenate(chunks, axis=0), loader))
        return np.stack(samples, axis=0)

    # ----------------------------------------------------------- checkpoints
    def _save_checkpoint(self, tag: str) -> None:
        from chemprop_tpu.models.serialize import save_checkpoint

        path = Path(self.checkpoint_dir) / f"{tag}.ckpt"
        if tag == "best" and self.best_variables is not None:
            variables = dict(self.best_variables)
        else:
            variables = jax.device_get(
                {"params": self.state.params, "batch_stats": self.state.batch_stats}
            )
        if tag == "last":
            # full training state so runs can resume (the reference cannot:
            # its --resume-experiment is an unimplemented TODO,
            # cli/train.py:187-192)
            variables = dict(variables)
            variables["opt_state"] = jax.device_get(self.state.opt_state)
            variables["step"] = jax.device_get(self.state.step)
            variables["rng"] = jax.device_get(self.state.rng)
            variables["epoch"] = np.int32(len(self.history))
        save_checkpoint(path, self.model, variables)

    def resume_from(self, path: str | Path, batch: TrainingBatch, steps_per_epoch: int) -> int:
        """Restore full training state from a ``last.ckpt``; returns the epoch
        to resume from."""
        from flax import serialization
        from chemprop_tpu.models.serialize import load_checkpoint

        _, restored, _ = load_checkpoint(path)
        template = self.init_state(batch, steps_per_epoch)
        params = serialization.from_state_dict(template.params, restored["params"])
        batch_stats = serialization.from_state_dict(
            template.batch_stats, restored.get("batch_stats", {})
        )
        opt_state = serialization.from_state_dict(
            template.opt_state, restored["opt_state"]
        )
        self.state = template.replace(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.asarray(restored["step"], jnp.int32),
            rng=jnp.asarray(restored["rng"]),
        )
        return int(restored.get("epoch", 0))
