"""MolAtomBondMPNN: up to three heads (molecule / atom / bond) over MAB
message passing (cf. reference ``chemprop/models/mol_atom_bond.py:21-569``).

Padded-batch adaptations (exactly equivalent math, see docstrings):

* bond fingerprints are ``[H_e ; H_e[rev]]`` per directed edge; predictions
  are averaged over the direction pair via ``(p + p[rev]) / 2`` instead of
  the reference's adjacent-pair ``(p[::2]+p[1::2])/2`` (edges are sorted);
* bond losses are evaluated on "primary" directed edges only
  (``edge_idx < rev``), so each bond counts once, matching the reference's
  per-bond loss; bond targets are stored per directed edge at collate;
* the bond constrainer runs over directed edges with doubled constraints,
  which is algebraically identical to the reference's per-bond form.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from chemprop_tpu.data.collate import BatchMolGraph
from chemprop_tpu.nn.agg import Aggregation
from chemprop_tpu.nn.batchnorm import MaskedBatchNorm
from chemprop_tpu.nn.ffn import ConstrainerFFN
from chemprop_tpu.nn.message_passing.base import _gather_rev
from chemprop_tpu.nn.transforms import ScaleTransform


class MolAtomBondMPNN(nn.Module):
    message_passing: nn.Module
    agg: Aggregation | None = None
    mol_predictor: nn.Module | None = None
    atom_predictor: nn.Module | None = None
    bond_predictor: nn.Module | None = None
    atom_constrainer: ConstrainerFFN | None = None
    bond_constrainer: ConstrainerFFN | None = None
    batch_norm: bool = False
    X_d_transform: ScaleTransform | None = None

    def setup(self):
        if self.batch_norm:
            if self.mol_predictor is not None:
                self.bn_mol = MaskedBatchNorm()
            if self.atom_predictor is not None:
                self.bn_atom = MaskedBatchNorm()
            if self.bond_predictor is not None:
                self.bn_bond = MaskedBatchNorm()

    @property
    def predictors(self):
        return (self.mol_predictor, self.atom_predictor, self.bond_predictor)

    def criterions(self):
        return tuple(p.get_criterion() if p is not None else None for p in self.predictors)

    def fingerprint(
        self,
        bmg: BatchMolGraph,
        V_d: jax.Array | None = None,
        E_d: jax.Array | None = None,
        X_d: jax.Array | None = None,
        is_training: bool = True,
        mc_dropout: bool = False,
    ):
        H_v, H_e = self.message_passing(bmg, V_d, E_d, is_training, mc_dropout)
        H_g = self.agg(H_v, bmg) if (self.agg is not None and H_v is not None) else None

        if self.batch_norm:
            if H_g is not None and self.mol_predictor is not None:
                counts = jnp.zeros(bmg.n_graphs + 1).at[bmg.batch].add(1.0)[: bmg.n_graphs]
                H_g = self.bn_mol(H_g, mask=counts > 0, is_training=is_training)
            if H_v is not None and self.atom_predictor is not None:
                H_v = self.bn_atom(H_v, mask=bmg.node_mask, is_training=is_training)
            if H_e is not None and self.bond_predictor is not None:
                H_e = self.bn_bond(H_e, mask=bmg.edge_mask, is_training=is_training)

        if H_g is not None and X_d is not None:
            if self.X_d_transform is not None:
                X_d = self.X_d_transform(X_d, is_training)
            H_g = jnp.concatenate([H_g, X_d], axis=1)
        if H_e is not None:
            H_e = jnp.concatenate([H_e, _gather_rev(H_e, bmg)], axis=1)
        return H_g, H_v, H_e

    def _headwise(self, fps, bmg, constraints, is_training, train_space: bool, mc: bool = False):
        H_g, H_v, H_e = fps
        outs = []
        for kind, fp, predictor in zip(
            ("mol", "atom", "bond"), fps, self.predictors
        ):
            if predictor is None or fp is None:
                outs.append(None)
                continue
            if mc:
                preds = predictor.mc_step(fp)
            elif train_space:
                preds = predictor.train_step(fp, is_training)
            else:
                preds = predictor(fp, is_training)
            if kind == "bond":
                # direction-pair averaging (both directions carry the value)
                if preds.ndim == 3:
                    preds = (preds + _gather_rev(preds, bmg)) / 2
                else:
                    preds = (preds + _gather_rev(preds, bmg)) / 2
            outs.append(preds)

        if constraints is not None:
            atom_c, bond_c = constraints
            if self.atom_constrainer is not None and atom_c is not None:
                preds = outs[1]
                point = preds[..., 0] if preds.ndim == 3 else preds
                fixed = self.atom_constrainer(
                    H_v, point, bmg.batch, atom_c, is_training
                )
                outs[1] = (
                    preds.at[..., 0].set(fixed) if preds.ndim == 3 else fixed
                )
            if self.bond_constrainer is not None and bond_c is not None:
                preds = outs[2]
                point = preds[..., 0] if preds.ndim == 3 else preds
                # doubled constraints over directed edges == per-bond form
                edge_graph = bmg.batch[bmg.src]
                fixed = self.bond_constrainer(
                    H_e, point, edge_graph, 2 * bond_c, is_training
                )
                outs[2] = preds.at[..., 0].set(fixed) if preds.ndim == 3 else fixed
        return tuple(outs)

    def __call__(
        self,
        bmg: BatchMolGraph,
        V_d=None,
        E_d=None,
        X_d=None,
        constraints=None,
        is_training: bool = False,
    ):
        fps = self.fingerprint(bmg, V_d, E_d, X_d, is_training)
        return self._headwise(fps, bmg, constraints, is_training, train_space=False)

    def mc_dropout_preds(
        self,
        bmg: BatchMolGraph,
        V_d=None,
        E_d=None,
        X_d=None,
        constraints=None,
    ):
        """Inference-space triple-head predictions with dropout layers active
        (one Monte-Carlo sample; cf. reference MC-dropout estimator)."""
        fps = self.fingerprint(bmg, V_d, E_d, X_d, is_training=False, mc_dropout=True)
        return self._headwise(fps, bmg, constraints, is_training=False, train_space=False, mc=True)

    def train_step_preds(
        self,
        bmg: BatchMolGraph,
        V_d=None,
        E_d=None,
        X_d=None,
        constraints=None,
        is_training: bool = True,
    ):
        fps = self.fingerprint(bmg, V_d, E_d, X_d, is_training)
        return self._headwise(fps, bmg, constraints, is_training, train_space=True)

    def encoding(
        self, bmg: BatchMolGraph, V_d=None, E_d=None, X_d=None, i: int = -1,
        is_training: bool = False,
    ):
        fps = self.fingerprint(bmg, V_d, E_d, X_d, is_training)
        return tuple(
            p.encode(fp, i, is_training) if (p is not None and fp is not None) else None
            for fp, p in zip(fps, self.predictors)
        )
