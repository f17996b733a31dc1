"""Multi-chip sharding tests on the virtual 8-device CPU mesh (what the
reference never had — its only distributed path is Lightning DDP exercised
single-process; SURVEY.md §4). Verifies that GSPMD edge/node partitioning is
numerically equivalent to single-device execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from chemprop_tpu.data import MoleculeDatapoint, MoleculeDataset, PadSpec, collate_batch
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN
from chemprop_tpu.parallel import make_mesh
from chemprop_tpu.parallel.sharding import batch_shardings, replicate, shard_batch

SMIS = [
    "CCO",
    "c1ccccc1",
    "CC(=O)Nc1ccc(O)cc1",
    "CNC(C)Cc1ccccc1",
    "CC(C)CC1=CC=C(C=C1)C(C)C(=O)O",
    "c1ccc2ccccc2c1",
    "CC(=O)OC1=CC=CC=C1C(=O)O",
    "C1CCNCC1",
]


@pytest.fixture(scope="module")
def batch():
    dps = [MoleculeDatapoint.from_smi(s, y=np.array([float(i)])) for i, s in enumerate(SMIS)]
    ds = MoleculeDataset(dps)
    ds.normalize_targets()
    data = [ds[i] for i in range(len(ds))]
    # pads divisible by 8 so every table shards evenly
    return collate_batch(data, PadSpec(192, 192, 8))


@pytest.fixture(scope="module")
def model_and_variables(batch):
    model = MPNN(
        message_passing=BondMessagePassing(),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )
    variables = model.init(jax.random.PRNGKey(0), batch.bmg, is_training=False)
    return model, variables


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh(jax.devices()[:8])


class TestShardingPlacement:
    def test_batch_shardings_shapes(self, mesh, batch):
        sh = batch_shardings(mesh, batch)
        sharded = shard_batch(batch, mesh)
        # every evenly-divisible leading dim is split over the 8 devices
        for name in ("V", "E", "src", "dst", "rev", "batch"):
            arr = getattr(sharded.bmg, name)
            assert arr.sharding.num_devices == 8, name
            shard_shapes = {s.data.shape for s in arr.addressable_shards}
            assert len(shard_shapes) == 1
            assert next(iter(shard_shapes))[0] == arr.shape[0] // 8, name

    def test_replicate(self, mesh, model_and_variables):
        _, variables = model_and_variables
        rep = replicate(variables, mesh)
        leaf = jax.tree_util.tree_leaves(rep)[0]
        assert leaf.sharding.is_fully_replicated


class TestNumericalEquivalence:
    def test_forward_matches_single_device(self, mesh, batch, model_and_variables):
        """Edge-partitioned forward == unsharded forward: XLA's inserted
        collectives must not change the math."""
        model, variables = model_and_variables
        fn = jax.jit(lambda v, bmg: model.apply(v, bmg, is_training=False))
        out_single = np.asarray(fn(variables, batch.bmg))

        sharded = shard_batch(batch, mesh)
        rep_vars = replicate(variables, mesh)
        out_sharded = np.asarray(fn(rep_vars, sharded.bmg))
        np.testing.assert_allclose(out_sharded, out_single, rtol=2e-5, atol=2e-5)

    def test_gradients_match_single_device(self, mesh, batch, model_and_variables):
        model, variables = model_and_variables

        def loss_fn(v, bmg, Y, w):
            preds = model.apply(v, bmg, is_training=False)
            mask = jnp.isfinite(Y)
            sq = jnp.where(mask, jnp.square(preds - jnp.nan_to_num(Y)), 0.0)
            return (sq * w).sum() / jnp.maximum(mask.sum(), 1)

        grad_fn = jax.jit(jax.grad(loss_fn))
        g_single = grad_fn(variables, batch.bmg, batch.Y, batch.w)

        sharded = shard_batch(batch, mesh)
        g_sharded = grad_fn(
            replicate(variables, mesh), sharded.bmg, sharded.Y, sharded.w
        )
        for a, b in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_sharded)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5)


class TestTrainerOnMesh:
    def test_fit_on_mesh_matches_unsharded_losses(self, mesh):
        from chemprop_tpu.data import DataLoader
        from chemprop_tpu.train import Trainer

        def run(mesh_arg):
            dps = [
                MoleculeDatapoint.from_smi(s, y=np.array([float(i)]))
                for i, s in enumerate(SMIS)
            ]
            ds = MoleculeDataset(dps)
            ds.normalize_targets()
            model = MPNN(
                message_passing=BondMessagePassing(),
                agg=MeanAggregation(),
                predictor=RegressionFFN(),
                batch_norm=False,
            )
            trainer = Trainer(model, max_epochs=3, mesh=mesh_arg, seed=0)
            loader = DataLoader(ds, batch_size=8, pad_spec=PadSpec(192, 192, 8), prefetch=0)
            trainer.fit(loader)
            return [h["train_loss"] for h in trainer.history]

        losses_mesh = run(mesh)
        losses_single = run(None)
        np.testing.assert_allclose(losses_mesh, losses_single, rtol=1e-4, atol=1e-5)
