"""The explicit-SPMD (shard_map) path: the multi-chip mode that keeps the
Pallas fast path (``pallas_call`` has no GSPMD partitioning rule, so the
GSPMD tests in test_sharding.py only ever cover the composed XLA ops).

Covers, on the 8-device virtual CPU mesh:

* graph-granularity guarantee: stacked-shard collate puts whole graphs on
  one shard and balances edge load,
* ``fused_message`` running in Pallas interpret mode INSIDE shard_map
  matches the composed single-device op,
* the sharded train step (psum'd criterion state + grads + BN moments)
  matches the single-device step numerically, step for step,
* sharded eval/predict match single-device predictions,
* all-padding shards (batch smaller than shard count) are harmless.

Reference analog: Lightning DDP, ``chemprop/cli/train.py:1943-1953``.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from chemprop_tpu.data import DataLoader, MoleculeDatapoint, MoleculeDataset, PadSpec
from chemprop_tpu.data.collate import (
    collate_batch,
    collate_sharded,
    partition_shards,
)
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
from chemprop_tpu.parallel import local_shard, make_mesh
from chemprop_tpu.train import Trainer

SMIS = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CNC(C)Cc1ccccc1",
    "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "c1ccc2ccccc2c1",
    "CC(=O)OC1=CC=CC=C1C(=O)O",
    "C1CCNCC1",
    "CCCCCCCCO",
    "c1ccncc1",
    "OC(=O)c1ccccc1O",
    "CCN(CC)CC",
    "ClCCl",
    "c1ccc(cc1)C(=O)N",
    "CC(C)(C)O",
    "N#Cc1ccccc1",
]


def _dataset(n=16):
    dps = [
        MoleculeDatapoint.from_smi(s, y=np.array([np.sin(i) * 2.0]))
        for i, s in enumerate(SMIS[:n])
    ]
    ds = MoleculeDataset(dps)
    ds.normalize_targets()
    return ds


def _data(ds):
    return [ds[i] for i in range(len(ds))]


class TestShardedCollate:
    def test_partition_balances_and_caps(self):
        sizes = [50, 1, 1, 1, 40, 30, 2, 3]
        groups = partition_shards(sizes, 4)
        assert sorted(i for g in groups for i in g) == list(range(8))
        assert all(len(g) == 2 for g in groups)
        loads = sorted(sum(sizes[i] for i in g) for g in groups)
        assert loads[-1] <= 51  # LPT: the 50 pairs with a small one

    def test_whole_graphs_per_shard(self):
        """The graph-granularity proof: on every shard, every real edge's
        endpoints and reverse edge are local, and each graph's nodes/edges
        live entirely on that shard."""
        ds = _dataset()
        sb = collate_sharded(_data(ds), 4)
        S = sb.bmg.V.shape[0]
        assert S == 4
        for k in range(S):
            src, dst = sb.bmg.src[k], sb.bmg.dst[k]
            rev = sb.bmg.rev[k]
            n_local = sb.bmg.V.shape[1]
            assert src.max() < n_local and dst.max() < n_local
            assert rev.max() < sb.bmg.E.shape[1]
            em = sb.bmg.edge_mask[k]
            # reverse edge of a real edge is a real local edge
            assert em[rev[em]].all()
            # dst-sorted within the shard
            assert (np.diff(dst) >= 0).all()

    def test_stacked_equals_per_shard_collate(self):
        ds = _dataset()
        sb = collate_sharded(_data(ds), 4)
        # every shard's Y/weights rows cover the whole dataset exactly once
        Y = np.asarray(sb.Y).reshape(-1)
        w = np.asarray(sb.w).reshape(-1)
        real = w > 0
        assert real.sum() == len(ds)
        got = np.sort(Y[real])
        want = np.sort(np.concatenate([ds[i].y for i in range(len(ds))]))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_empty_shards_when_batch_smaller(self):
        ds = _dataset(3)
        sb = collate_sharded(_data(ds), 8)
        w = np.asarray(sb.w)
        assert w.shape[0] == 8
        assert (w.reshape(8, -1).sum(1) > 0).sum() == 3  # 5 all-padding shards
        # all-padding shards still have self-consistent indices
        k = int(np.argmin(w.reshape(8, -1).sum(1)))
        assert not sb.bmg.edge_mask[k].any()
        assert (sb.bmg.src[k] == sb.bmg.V.shape[1] - 1).all()


class TestFusedMessageUnderShardMap:
    def test_interpret_kernel_in_shard_map_matches_composed(self, monkeypatch):
        """fused_message in Pallas interpret mode inside shard_map == the
        composed XLA ops on the same shards (the combination VERDICT.md
        round 1 flagged as never exercised)."""
        from jax.sharding import PartitionSpec as P

        from chemprop_tpu.ops import fused_message as fm
        from chemprop_tpu.parallel.shard_train import _shard_map

        mesh = make_mesh(jax.devices()[:4])
        ds = _dataset()
        # per-shard pads satisfying the kernel gate: E >= (2kw+1)*128, %128
        sb = collate_sharded(_data(ds), 4, pad=PadSpec(128, 512, 4))
        H = jax.random.normal(
            jax.random.PRNGKey(0), (4, 512, 128), jnp.float32
        )  # [S, E_l, d]

        def body(H, bmg):
            bmg = local_shard(bmg)
            h = H[0]
            out = fm.fused_message(h, bmg.src, bmg.dst, bmg.rev, bmg.V.shape[0], 2)
            return out[None]

        run = _shard_map(body, mesh, (P("data"), P("data")), P("data"))

        monkeypatch.setenv("CHEMPROP_TPU_INTERPRET", "1")
        got = np.asarray(jax.jit(run)(H, sb.bmg))
        monkeypatch.setenv("CHEMPROP_TPU_PALLAS", "0")
        want = np.asarray(jax.jit(run)(H, sb.bmg))
        em = np.asarray(sb.bmg.edge_mask)
        np.testing.assert_allclose(got[em], want[em], rtol=2e-5, atol=2e-5)


def _model(dropout=0.0, batch_norm=True):
    return MPNN(
        message_passing=BondMessagePassing(d_h=128, depth=3, dropout=dropout),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=128, hidden_dim=64),
        batch_norm=batch_norm,
    )


class TestShardedTrainer:
    @pytest.mark.parametrize("n_shards", [4, 8])
    def test_gradients_match_single_device(self, n_shards):
        """Exact check: one SGD(1.0) step via the sharded train step moves
        the params by the same gradient as the single-device global-batch
        loss (incl. synced batchnorm moments and running-stat updates).
        SGD isolates the gradients — Adam would amplify fp reduction-order
        noise into sign(grad)-scaled updates for near-zero gradients."""
        import optax

        from chemprop_tpu.parallel import make_sharded_train_step
        from chemprop_tpu.parallel.sharding import DATA_AXIS
        from chemprop_tpu.train.trainer import TrainState

        ds = _dataset()
        data = _data(ds)
        flat = collate_batch(data, PadSpec(256, 512, 16))
        sb = collate_sharded(data, n_shards, PadSpec(64, 128, -(-16 // n_shards)))
        mesh = make_mesh(jax.devices()[:n_shards])

        model = _model()
        key = jax.random.PRNGKey(5)
        variables = model.init(key, local_shard(sb).bmg, is_training=False)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        criterion = model.criterion

        # single-device global-batch gradients
        def flat_loss(p):
            out, new_ms = model.apply(
                {"params": p, "batch_stats": batch_stats},
                flat.bmg,
                None,
                None,
                is_training=True,
                method="train_step_preds",
                rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            mask = jnp.isfinite(flat.Y)
            loss = criterion(out, jnp.nan_to_num(flat.Y), mask, flat.w[:, 0])
            return loss, new_ms["batch_stats"]

        (loss_flat, bs_flat), g_flat = jax.value_and_grad(flat_loss, has_aux=True)(params)

        # sharded step with SGD(1.0): param delta == gradient
        tx = optax.sgd(1.0)
        model_s = model.clone(bn_axis=DATA_AXIS)
        step = make_sharded_train_step(model_s, criterion, tx, mesh)
        state = TrainState(
            # fresh copies: the sharded step donates its state buffers
            params=jax.tree.map(jnp.array, params),
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=key,
        )
        new_state, loss_shard = step(state, sb)
        assert abs(float(loss_flat) - float(loss_shard)) < 1e-6
        g_shard = jax.tree.map(lambda a, b: a - b, params, new_state.params)
        for path_a, (ga, gb) in zip(
            jax.tree_util.tree_flatten_with_path(g_flat)[0],
            zip(jax.tree.leaves(g_flat), jax.tree.leaves(g_shard)),
        ):
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), atol=2e-6, err_msg=str(path_a[0])
            )
        # running BN stats advanced identically (psum'd moments)
        for sa, sb_ in zip(jax.tree.leaves(bs_flat), jax.tree.leaves(new_state.batch_stats)):
            np.testing.assert_allclose(np.asarray(sa), np.asarray(sb_), atol=1e-6)

    def test_trainer_loss_trajectory_matches(self):
        """Full Trainer fit: per-epoch global losses equal single-device
        training (params drift only by Adam's sign-amplified fp noise)."""
        ds = _dataset()

        def run(sharded):
            model = _model()
            if sharded:
                mesh = make_mesh(jax.devices()[:4])
                loader = DataLoader(
                    ds, batch_size=16, pad_spec=PadSpec(64, 128, 4), prefetch=0, n_shards=4
                )
                trainer = Trainer(model, max_epochs=3, mesh=mesh, sharded=True, seed=7)
            else:
                loader = DataLoader(ds, batch_size=16, pad_spec=PadSpec(256, 512, 16), prefetch=0)
                trainer = Trainer(model, max_epochs=3, seed=7)
            trainer.fit(loader)
            return trainer

        t_flat = run(False)
        t_shard = run(True)
        for a, b in zip(t_flat.history, t_shard.history):
            assert abs(a["train_loss"] - b["train_loss"]) < 1e-4, (a, b)

    def test_validation_and_predict_match(self):
        ds = _dataset()
        n_shards = 4
        mesh = make_mesh(jax.devices()[:n_shards])
        loader_s = DataLoader(
            ds, batch_size=16, pad_spec=PadSpec(64, 128, 4), prefetch=0, n_shards=n_shards
        )
        loader_f = DataLoader(ds, batch_size=16, pad_spec=PadSpec(256, 512, 16), prefetch=0)

        t_s = Trainer(_model(), max_epochs=1, mesh=mesh, sharded=True, seed=3)
        t_s.fit(loader_s, val_loader=loader_s)
        t_f = Trainer(_model(), max_epochs=1, seed=3)
        t_f.fit(loader_f, val_loader=loader_f)
        assert abs(t_s.history[-1]["val_loss"] - t_f.history[-1]["val_loss"]) < 1e-5

        # sharded predict vs a single-device forward with the SAME variables
        preds_s = t_s.predict(loader_s)
        flat_batch = next(iter(loader_f))
        preds_f = np.asarray(
            t_s.model.apply(
                t_s.best_variables, flat_batch.bmg, None, None, is_training=False
            )
        )[flat_batch.pad_mask]
        # row order differs (shard partition): compare as multisets
        np.testing.assert_allclose(
            np.sort(preds_s.ravel()), np.sort(preds_f.ravel()), atol=1e-5
        )

    def test_sharded_with_interpret_kernels(self, monkeypatch):
        """End-to-end sharded training with the Pallas kernels live (interpret
        mode) — loss finite and close to the composed-op run."""
        monkeypatch.setenv("CHEMPROP_TPU_INTERPRET", "1")
        ds = _dataset(8)
        mesh = make_mesh(jax.devices()[:2])
        # 512-edge shards satisfy the fused kernel's minimum size
        loader = DataLoader(
            ds, batch_size=8, pad_spec=PadSpec(128, 512, 4), prefetch=0, n_shards=2
        )
        trainer = Trainer(_model(), max_epochs=1, mesh=mesh, sharded=True, seed=1)
        trainer.fit(loader)
        loss_kernel = trainer.history[-1]["train_loss"]

        monkeypatch.setenv("CHEMPROP_TPU_PALLAS", "0")
        trainer2 = Trainer(_model(), max_epochs=1, mesh=mesh, sharded=True, seed=1)
        trainer2.fit(loader)
        loss_composed = trainer2.history[-1]["train_loss"]
        assert np.isfinite(loss_kernel)
        assert abs(loss_kernel - loss_composed) < 1e-4
