"""Trainer specialization for MolAtomBond models: the loss is the sum of the
per-head criterion values (cf. reference ``chemprop/models/mol_atom_bond.py:
318-339``), each masked by target finiteness over its own table (mol rows,
node rows, directed-edge rows)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from chemprop_tpu.train.trainer import Trainer, TrainState, _device_put_batch


@dataclass
class MABTrainer(Trainer):
    HEADS = ("mol", "atom", "bond")

    def _losses(self, model, preds, batch, return_parts: bool = False):
        criterions = model.criterions()
        total = 0.0
        parts = {}
        for head, preds_k, crit, Y, w, lt, gt in zip(
            self.HEADS, preds, criterions, batch.Ys, batch.ws, batch.lt_masks, batch.gt_masks
        ):
            if preds_k is None or crit is None or Y is None:
                continue
            mask = jnp.isfinite(Y)
            targets = jnp.nan_to_num(Y)
            lt_ = jnp.zeros_like(mask) if lt is None else lt
            gt_ = jnp.zeros_like(mask) if gt is None else gt
            part = crit(preds_k, targets, mask, w[:, 0], lt_, gt_)
            parts[head] = part
            total = total + part
        return (total, parts) if return_parts else total

    def _train_body(self) -> Callable:
        model, tx = self.model, self.tx

        def train_step(state: TrainState, batch):
            rng, dropout_rng = jax.random.split(state.rng)

            def loss_fn(params):
                variables = {"params": params}
                mutable = False
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                    mutable = ["batch_stats"]
                out = model.apply(
                    variables,
                    batch.bmg,
                    batch.V_d,
                    batch.E_d,
                    batch.X_d,
                    batch.constraints,
                    is_training=True,
                    method="train_step_preds",
                    rngs={"dropout": dropout_rng},
                    mutable=mutable,
                )
                preds, new_model_state = out if mutable else (out, {})
                return self._losses(model, preds, batch), new_model_state

            (loss, new_model_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                state.replace(
                    params=params,
                    batch_stats=new_model_state.get("batch_stats", state.batch_stats),
                    opt_state=opt_state,
                    step=state.step + 1,
                    rng=rng,
                ),
                loss,
            )

        return train_step

    def _make_eval_step(self) -> Callable:
        if self._eval_step_jit is not None:
            return self._eval_step_jit
        model = self.model

        def eval_step(params, batch_stats, batch):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            preds = model.apply(
                variables,
                batch.bmg,
                batch.V_d,
                batch.E_d,
                batch.X_d,
                batch.constraints,
                is_training=False,
                method="train_step_preds",
            )
            loss, parts = self._losses(model, preds, batch, return_parts=True)
            return {"total": loss, "n": jnp.ones(()), **parts}, preds

        self._eval_step_jit = jax.jit(eval_step)
        return self._eval_step_jit

    def _run_validation(self, val_loader, eval_step) -> dict[str, float]:
        """Returns ``val_loss`` plus per-head ``val_loss-{mol,atom,bond}``
        and any named per-head metrics like ``val_rmse-atom`` (the reference's
        --tracking-metric suffix convention, cli/train.py:494-498)."""
        sums: dict[str, float] = {}
        n = 0
        collected: dict[str, list] = {h: [] for h in self.HEADS}
        targets_c: dict[str, list] = {h: [] for h in self.HEADS}
        for batch in val_loader:
            batch = _device_put_batch(batch, self.data_sharding)
            state, preds = eval_step(self.state.params, self.state.batch_stats, batch)
            for k, v in state.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
            if self.val_metrics:
                # padding rows carry NaN targets in every table, so the
                # isfinite mask inside the metric excludes them
                for head, p, Y in zip(self.HEADS, preds, batch.Ys):
                    if p is None or Y is None:
                        continue
                    collected[head].append(np.asarray(p))
                    targets_c[head].append(np.asarray(Y))
        record = {"val_loss": sums.get("total", float("nan")) / max(n, 1)}
        for head in self.HEADS:
            if head in sums:
                record[f"val_loss-{head}"] = sums[head] / max(n, 1)
        for name, metric in self.val_metrics.items():
            base, _, head = name.rpartition("-")
            if head not in self.HEADS or not collected.get(head):
                continue
            p = np.concatenate(collected[head], axis=0)
            Y = np.concatenate(targets_c[head], axis=0)
            if p.ndim == 3:
                p = p[..., 0]
            mask = np.isfinite(Y)
            try:
                if metric.needs_collection:
                    val = float(metric.compute_from_arrays(p, Y, mask))
                else:
                    mstate = metric.update_state(
                        metric.init_state(),
                        jnp.asarray(p),
                        jnp.asarray(np.nan_to_num(Y)),
                        jnp.asarray(mask),
                        jnp.ones(len(Y)),
                        jnp.zeros_like(mask),
                        jnp.zeros_like(mask),
                    )
                    val = float(metric.compute(mstate))
            except Exception:
                val = float("nan")
            record[f"val_{name}"] = val
        return record

    def init_state(self, batch, steps_per_epoch: int) -> TrainState:
        import jax

        from chemprop_tpu.nn.init import init_scheme

        self._check_jit_cache(steps_per_epoch)
        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        with init_scheme(self.param_init):
            variables = self.model.init(
                init_rng,
                batch.bmg,
                batch.V_d,
                batch.E_d,
                batch.X_d,
                batch.constraints,
                is_training=False,
            )
        from flax.core import FrozenDict

        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        self.tx = self._build_optimizer(steps_per_epoch)
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=rng,
        )

    def predict(self, loader, variables=None, **kwargs):
        """Returns (mol_preds, atom_preds, bond_preds) with padding stripped
        (bond predictions on primary directed edges, one per bond)."""
        apply = jax.jit(
            lambda v, b: self.model.apply(
                v, b.bmg, b.V_d, b.E_d, b.X_d, b.constraints, is_training=False
            )
        )
        return self._predict_with(loader, variables, lambda v, b: apply(v, b))

    def predict_mc_dropout(self, loader, variables=None, sampling_size: int = 10, seed: int = 0):
        """``sampling_size`` stochastic passes with dropout active; returns
        per-head ``[S, n, ...]`` stacks (None for absent heads). Cf. the
        reference MC-dropout estimator (``uncertainty/estimator.py:491-636``)."""
        apply = jax.jit(
            lambda v, b, key: self.model.apply(
                v, b.bmg, b.V_d, b.E_d, b.X_d, b.constraints,
                method="mc_dropout_preds", rngs={"dropout": key},
            )
        )
        keys = jax.random.split(jax.random.PRNGKey(seed), sampling_size)
        samples = []
        for s_i in range(sampling_size):
            counter = iter(range(1 << 30))  # distinct dropout key per batch

            def fn(v, b, s_i=s_i, counter=counter):
                return apply(v, b, jax.random.fold_in(keys[s_i], next(counter)))

            samples.append(self._predict_with(loader, variables, fn))
        stack = lambda xs: np.stack(xs, 0) if xs[0] is not None else None
        return tuple(stack([s[k] for s in samples]) for k in range(3))

    def _predict_with(self, loader, variables, apply_fn):
        if variables is None:
            variables = self.best_variables or {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        mol_chunks, atom_chunks, bond_chunks = [], [], []
        for batch in loader:
            mol_p, atom_p, bond_p = apply_fn(variables, batch)
            collect_mab_rows(batch, mol_p, atom_p, bond_p, mol_chunks, atom_chunks, bond_chunks)
        cat = lambda cs: np.concatenate(cs, 0) if cs else None
        return restore_mab_order(
            loader, cat(mol_chunks), cat(atom_chunks), cat(bond_chunks)
        )


def collect_mab_rows(batch, mol_p, atom_p, bond_p, mol_chunks, atom_chunks, bond_chunks):
    """Strip one batch's per-head padded outputs down to real rows and
    append them to the chunk lists (shared by MABTrainer and the
    fingerprint CLI so the layout conventions live in one place):
    zero-atom molecules keep their one zero node row; bond rows keep one
    direction per bond, restored to canonical pre-dst-sort bond order via
    ``edge_origin // 2``."""
    bmg = batch.bmg
    if mol_p is not None:
        counts = np.zeros(bmg.n_graphs + 1)
        np.add.at(counts, np.asarray(bmg.batch), 1)
        keep = counts[: bmg.n_graphs] > 0  # real graphs have nodes
        mol_chunks.append(np.asarray(mol_p)[keep])
    if atom_p is not None:
        atom_chunks.append(np.asarray(atom_p)[np.asarray(bmg.node_mask)])
    if bond_p is not None:
        primary = (
            np.arange(bmg.E.shape[0]) < np.asarray(bmg.rev)
        ) & np.asarray(bmg.edge_mask)
        sel = np.asarray(bond_p)[primary]
        if batch.edge_origin is not None:
            bond_ids = np.asarray(batch.edge_origin)[primary] // 2
            sel = sel[np.argsort(bond_ids, kind="stable")]
        bond_chunks.append(sel)


def restore_mab_order(loader, mol_cat, atom_cat, bond_cat):
    """Restore dataset row order after oversized-molecule isolation
    reordered batch emission (``DataLoader.emitted_order``) — grouped by
    per-molecule atom/bond counts for the atom/bond tables. With
    ``drop_last`` the emitted indices are a SUBSET of the dataset; rows
    come back sorted by dataset index (argsort handles both cases)."""
    order_fn = getattr(loader, "emitted_order", None)
    order = order_fn() if order_fn is not None else None
    if order is None or np.array_equal(order, np.arange(len(order))):
        return mol_cat, atom_cat, bond_cat
    data = loader.dataset.data
    if mol_cat is not None and len(mol_cat) == len(order):
        mol_cat = mol_cat[np.argsort(order, kind="stable")]
    if atom_cat is not None:
        # a zero-atom molecule featurizes to one zero node row
        atom_cat = _regroup_rows(
            atom_cat, order, [max(1, d.mol.num_atoms) for d in data]
        )
    if bond_cat is not None:
        bond_cat = _regroup_rows(bond_cat, order, [d.mol.num_bonds for d in data])
    return mol_cat, atom_cat, bond_cat


def _regroup_rows(arr: np.ndarray, order: np.ndarray, counts: list[int]) -> np.ndarray:
    """Un-permute a row-concatenated per-atom/bond table whose GROUPS were
    emitted in ``order`` back to dataset-index order; ``counts[i]`` is
    dataset molecule ``i``'s group size (``order`` may be a subset of the
    dataset under ``drop_last``). No-op if the counts don't tile the table
    (unexpected layout — better unreordered than silently wrong)."""
    counts = np.asarray(counts, np.int64)
    emitted = counts[order]
    if arr.shape[0] != int(emitted.sum()):
        return arr
    starts = np.concatenate([[0], np.cumsum(emitted)])
    take = [
        np.arange(starts[p], starts[p] + emitted[p])
        for p in np.argsort(order, kind="stable")
    ]
    return arr[np.concatenate(take)] if take else arr
