"""Edge-partitioned training mode (parallel/partitioned_mp.py): a REAL
featurized molecule (fused rings, not a synthetic chain) sharded across the
8-device CPU mesh must reproduce the single-device MPNN — forward
predictions, the full depth loop + W_h GEMM, and one optimizer step's
parameters — exactly (f32 tolerance). VERDICT r3 item 3: the halo op as a
training capability, not just an op."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from chemprop_tpu.data import MoleculeDatapoint
from chemprop_tpu.data.collate import PadSpec, collate_batch
from chemprop_tpu.data.datasets import Datum
from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.models import MPNN
from chemprop_tpu.nn import (
    AtomMessagePassing,
    BondMessagePassing,
    MeanAggregation,
    RegressionFFN,
)
from chemprop_tpu.parallel.partitioned_mp import (
    build_partitioned_graph,
    make_partitioned_apply,
    make_partitioned_train_step,
)

# a polymer of linked cyclohexane rings: large (>2000 directed edges, more
# than the fused kernels' widest window) but with bounded graph bandwidth
GIANT_SMILES = "C1(CCCCC1)" * 180
D_H = 48


@pytest.fixture(scope="module")
def giant_mg():
    feat = SimpleMoleculeMolGraphFeaturizer()
    dp = MoleculeDatapoint.from_smi(GIANT_SMILES, y=np.array([1.5]))
    return feat(dp.mol)


@pytest.fixture(scope="module")
def model():
    return MPNN(
        message_passing=BondMessagePassing(d_h=D_H, depth=3),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=D_H, hidden_dim=D_H),
        batch_norm=False,
    )


@pytest.fixture(scope="module")
def variables(model, giant_mg):
    batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
    return model.init(jax.random.PRNGKey(0), batch.bmg, None, None, is_training=False)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def _single_device_preds(model, variables, giant_mg, train_space=False):
    batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
    method = "train_step_preds" if train_space else None
    kwargs = {"method": method} if method else {}
    out = model.apply(variables, batch.bmg, None, None, is_training=False, **kwargs)
    return np.asarray(out)[:1]


class TestPartitionedForward:
    @pytest.mark.parametrize("n_shards", [2, 8])
    def test_matches_single_device(self, model, variables, giant_mg, n_shards):
        g, dims = build_partitioned_graph(giant_mg, n_shards)
        sub = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
        apply_p = make_partitioned_apply(model, sub, dims)
        got = np.asarray(apply_p(variables, g))
        want = _single_device_preds(model, variables, giant_mg)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_graph_actually_straddles(self, giant_mg):
        """The test molecule must be bigger than any single shard's slice
        (otherwise this file proves nothing)."""
        g, dims = build_partitioned_graph(giant_mg, 8)
        assert giant_mg.E.shape[0] > dims.P  # edges span multiple shards
        assert int(np.asarray(g.n_edges).min()) > 0  # every shard owns edges


class TestPartitionedTrainStep:
    def test_one_step_matches_single_device(self, model, variables, giant_mg, mesh):
        from chemprop_tpu.train.trainer import TrainState

        y = np.array([[1.5]], np.float32)
        g, dims = build_partitioned_graph(giant_mg, 8)
        tx = optax.adam(1e-3)
        params = variables["params"]

        # single-device reference step
        batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
        criterion = model.criterion

        def loss_fn(p):
            preds = model.apply(
                {"params": p}, batch.bmg, None, None, is_training=False,
                method="train_step_preds",
            )[:1]
            mask = jnp.isfinite(y)
            st = criterion.update_state(
                criterion.init_state(), preds, jnp.nan_to_num(y), mask,
                jnp.ones(1), jnp.zeros_like(mask), jnp.zeros_like(mask),
            )
            return criterion.compute(st)

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(ref_grads, tx.init(params), params)
        ref_params = optax.apply_updates(params, updates)

        # partitioned step
        state = TrainState(
            # real copies: the step donates its state and must not eat the
            # module-scoped fixture's arrays
            params=jax.tree.map(lambda x: jnp.array(np.asarray(x)), params),
            batch_stats={},
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        step = make_partitioned_train_step(model, tx, mesh, dims)
        new_state, loss = step(state, g, jnp.asarray(y), jnp.ones(1))

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
        key = lambda item: str(item[0])
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref_params)[0], key=key),
            sorted(jax.tree_util.tree_flatten_with_path(new_state.params)[0], key=key),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5,
                err_msg=str(pa),
            )


@pytest.fixture(scope="module")
def atom_model():
    return MPNN(
        message_passing=AtomMessagePassing(d_h=D_H, depth=3),
        agg=MeanAggregation(),
        predictor=RegressionFFN(input_dim=D_H, hidden_dim=D_H),
        batch_norm=False,
    )


@pytest.fixture(scope="module")
def atom_variables(atom_model, giant_mg):
    batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
    return atom_model.init(
        jax.random.PRNGKey(0), batch.bmg, None, None, is_training=False
    )


class TestPartitionedAtomMP:
    """r5 scope widening: AtomMessagePassing in the edge-partitioned mode
    (no reverse-edge subtraction — only the node-accumulator halo)."""

    @pytest.mark.parametrize("n_shards", [2, 8])
    def test_forward_matches_single_device(
        self, atom_model, atom_variables, giant_mg, n_shards
    ):
        g, dims = build_partitioned_graph(giant_mg, n_shards)
        sub = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
        apply_p = make_partitioned_apply(atom_model, sub, dims)
        got = np.asarray(apply_p(atom_variables, g))
        want = _single_device_preds(atom_model, atom_variables, giant_mg)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_one_step_matches_single_device(
        self, atom_model, atom_variables, giant_mg, mesh
    ):
        from chemprop_tpu.train.trainer import TrainState

        model, variables = atom_model, atom_variables
        y = np.array([[1.5]], np.float32)
        g, dims = build_partitioned_graph(giant_mg, 8)
        tx = optax.adam(1e-3)
        params = variables["params"]
        batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
        criterion = model.criterion

        def loss_fn(p):
            preds = model.apply(
                {"params": p}, batch.bmg, None, None, is_training=False,
                method="train_step_preds",
            )[:1]
            mask = jnp.isfinite(y)
            st = criterion.update_state(
                criterion.init_state(), preds, jnp.nan_to_num(y), mask,
                jnp.ones(1), jnp.zeros_like(mask), jnp.zeros_like(mask),
            )
            return criterion.compute(st)

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(ref_grads, tx.init(params), params)
        ref_params = optax.apply_updates(params, updates)

        state = TrainState(
            params=jax.tree.map(lambda x: jnp.array(np.asarray(x)), params),
            batch_stats={},
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        step = make_partitioned_train_step(model, tx, mesh, dims)
        new_state, loss = step(state, g, jnp.asarray(y), jnp.ones(1))

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
        key = lambda item: str(item[0])
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref_params)[0], key=key),
            sorted(jax.tree_util.tree_flatten_with_path(new_state.params)[0], key=key),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5,
                err_msg=str(pa),
            )


class TestPartitionedUndirected:
    """r5 scope widening: the --undirected pre-average H = (H + H[rev]) / 2
    in the partitioned mode (cross-cut reverse edges resolve through the
    sideways edge halo)."""

    @pytest.mark.parametrize("mp_cls", [BondMessagePassing, AtomMessagePassing])
    def test_forward_matches_single_device(self, giant_mg, mesh, mp_cls):
        model = MPNN(
            message_passing=mp_cls(d_h=D_H, depth=3, undirected=True),
            agg=MeanAggregation(),
            predictor=RegressionFFN(input_dim=D_H, hidden_dim=D_H),
            batch_norm=False,
        )
        batch = collate_batch(
            [Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)]
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, None, None, is_training=False
        )
        g, dims = build_partitioned_graph(giant_mg, 8)
        apply_p = make_partitioned_apply(model, mesh, dims)
        got = np.asarray(apply_p(variables, g))
        want = _single_device_preds(model, variables, giant_mg)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestPartitionedExtraDescriptors:
    """r5 scope widening: extra atom descriptors (V_d -> W_d) and extra
    datapoint descriptors (X_d concat) in the partitioned mode."""

    D_VD, D_XD = 6, 4

    def _data(self, giant_mg):
        rng = np.random.default_rng(3)
        V_d = rng.normal(size=(giant_mg.V.shape[0], self.D_VD)).astype(np.float32)
        x_d = rng.normal(size=(self.D_XD,)).astype(np.float32)
        return V_d, x_d

    def _model(self):
        return MPNN(
            message_passing=BondMessagePassing(d_h=D_H, depth=3, d_vd=self.D_VD),
            agg=MeanAggregation(),
            predictor=RegressionFFN(
                input_dim=D_H + self.D_VD + self.D_XD, hidden_dim=D_H
            ),
            batch_norm=False,
        )

    def test_forward_matches_single_device(self, giant_mg, mesh):
        V_d, x_d = self._data(giant_mg)
        model = self._model()
        batch = collate_batch(
            [Datum(giant_mg, V_d, x_d, np.array([1.5]), 1.0, None, None)]
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, batch.V_d, batch.X_d, is_training=False
        )
        g, dims = build_partitioned_graph(giant_mg, 8, V_d=V_d)
        apply_p = make_partitioned_apply(model, mesh, dims)
        got = np.asarray(apply_p(variables, g, jnp.asarray(x_d)[None]))
        want = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )[:1]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_one_step_matches_single_device(self, giant_mg, mesh):
        from chemprop_tpu.train.trainer import TrainState

        V_d, x_d = self._data(giant_mg)
        model = self._model()
        y = np.array([[1.5]], np.float32)
        batch = collate_batch(
            [Datum(giant_mg, V_d, x_d, np.array([1.5]), 1.0, None, None)]
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, batch.V_d, batch.X_d, is_training=False
        )
        params = variables["params"]
        tx = optax.adam(1e-3)
        criterion = model.criterion

        def loss_fn(p):
            preds = model.apply(
                {"params": p}, batch.bmg, batch.V_d, batch.X_d, is_training=False,
                method="train_step_preds",
            )[:1]
            mask = jnp.isfinite(y)
            st = criterion.update_state(
                criterion.init_state(), preds, jnp.nan_to_num(y), mask,
                jnp.ones(1), jnp.zeros_like(mask), jnp.zeros_like(mask),
            )
            return criterion.compute(st)

        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(ref_grads, tx.init(params), params)
        ref_params = optax.apply_updates(params, updates)

        g, dims = build_partitioned_graph(giant_mg, 8, V_d=V_d)
        state = TrainState(
            params=jax.tree.map(lambda x: jnp.array(np.asarray(x)), params),
            batch_stats={},
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        step = make_partitioned_train_step(model, tx, mesh, dims)
        new_state, loss = step(
            state, g, jnp.asarray(y), jnp.ones(1), jnp.asarray(x_d)[None]
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)
        key = lambda item: str(item[0])
        for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(ref_params)[0], key=key),
            sorted(jax.tree_util.tree_flatten_with_path(new_state.params)[0], key=key),
        ):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5,
                err_msg=str(pa),
            )

    def test_missing_V_d_raises(self, giant_mg, mesh):
        model = self._model()
        V_d, x_d = self._data(giant_mg)
        batch = collate_batch(
            [Datum(giant_mg, V_d, x_d, np.array([1.5]), 1.0, None, None)]
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, batch.V_d, batch.X_d, is_training=False
        )
        g, dims = build_partitioned_graph(giant_mg, 8)  # V_d NOT passed
        apply_p = make_partitioned_apply(model, mesh, dims)
        with pytest.raises(ValueError, match="extra atom descriptors"):
            apply_p(variables, g, jnp.asarray(x_d)[None])


class TestPredictPartitioned:
    """r5: partitioned INFERENCE routing (predict --edge-partition) — mixed
    giant+small datasets, graph-transform eval scaling, input-order output."""

    def test_mixed_routing_matches_dense(self, model, variables, giant_mg, mesh):
        from chemprop_tpu.parallel.partitioned_mp import predict_partitioned

        feat = SimpleMoleculeMolGraphFeaturizer()
        small_mg = feat(MoleculeDatapoint.from_smi("CCO", y=np.array([0.2])).mol)
        data = [
            Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None),
            Datum(small_mg, None, None, np.array([0.2]), 1.0, None, None),
            Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None),
        ]
        got = predict_partitioned(model, variables, data, n_shards=8)
        assert got.shape[0] == 3
        for i, d in enumerate(data):
            batch = collate_batch([d])
            want = np.asarray(
                model.apply(variables, batch.bmg, None, None, is_training=False)
            )[:1]
            np.testing.assert_allclose(got[i : i + 1], want, rtol=2e-5, atol=2e-5)

    def test_bucket_floor_conflict_routes_dense(self, model, variables, mesh):
        """Two molecules can share a dim bucket where one's halo floors
        (maxed over members) exceed the other's per-shard owned range:
        plan_buckets must route the conflicting molecule dense instead of
        raising (code-review r5 finding)."""
        from chemprop_tpu.parallel.partitioned_mp import plan_buckets, predict_partitioned

        feat = SimpleMoleculeMolGraphFeaturizer()
        # A: long cross-link ring -> wide halo requirement on 2 shards;
        # B: plain chain with a small per-shard owned range
        smi_a = "C" * 5 + "C1" + "C" * 40 + "C1" + "C" * 44
        smi_b = "C" * 73
        data = [
            Datum(feat(MoleculeDatapoint.from_smi(s, y=np.array([0.0])).mol),
                  None, None, np.array([0.0]), 1.0, None, None)
            for s in (smi_a, smi_b)
        ]
        keys, graphs, bucket_dims = plan_buckets(data, 2)
        # no molecule may be dropped: each is either bucketed or dense
        assert all(
            (k is None and g is None) or (k is not None and g is not None)
            for k, g in zip(keys, graphs)
        )
        # and the full predict path runs without raising, in input order
        got = predict_partitioned(model, variables, data, n_shards=2)
        assert got.shape[0] == 2 and np.isfinite(got).all()

    def test_encode_index_matches_dense_encoding(self, model, variables, giant_mg, mesh):
        """encode_index returns model.encoding semantics (fingerprint CLI)."""
        from chemprop_tpu.parallel.partitioned_mp import predict_partitioned

        data = [Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)]
        got = predict_partitioned(model, variables, data, n_shards=8, encode_index=-1)
        batch = collate_batch(data)
        want = np.asarray(
            model.apply(variables, batch.bmg, None, None, i=-1, method="encoding")
        )[:1]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_graph_transform_applied_at_eval(self, giant_mg, mesh):
        """A model with eval-only extra-feature scaling (GraphTransform)
        must scale V/E identically on the partitioned path."""
        from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform
        from chemprop_tpu.parallel.partitioned_mp import predict_partitioned

        d_v, d_e = giant_mg.V.shape[1], giant_mg.E.shape[1]
        gt = GraphTransform(
            V_transform=ScaleTransform(
                mean=np.full(d_v, 0.1), scale=np.full(d_v, 2.0)
            ),
            E_transform=ScaleTransform(
                mean=np.full(d_e, -0.2), scale=np.full(d_e, 0.5)
            ),
        )
        model = MPNN(
            message_passing=BondMessagePassing(d_h=D_H, depth=3, graph_transform=gt),
            agg=MeanAggregation(),
            predictor=RegressionFFN(input_dim=D_H, hidden_dim=D_H),
            batch_norm=False,
        )
        batch = collate_batch(
            [Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)]
        )
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, None, None, is_training=False
        )
        data = [Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)]
        got = predict_partitioned(model, variables, data, n_shards=8)
        want = np.asarray(
            model.apply(variables, batch.bmg, None, None, is_training=False)
        )[:1]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


class TestPartitionedDropout:
    """r5 scope widening: dropout in the partitioned train step (per-shard
    masks from a folded rng; head masks replicated across shards)."""

    def _make(self, rate):
        return MPNN(
            message_passing=BondMessagePassing(d_h=D_H, depth=3, dropout=rate),
            agg=MeanAggregation(),
            predictor=RegressionFFN(input_dim=D_H, hidden_dim=D_H, dropout=rate),
            batch_norm=False,
        )

    def test_dropout_step_trains_and_is_seeded(self, giant_mg, mesh):
        from chemprop_tpu.train.trainer import TrainState

        model = self._make(0.25)
        batch = collate_batch([Datum(giant_mg, None, None, np.array([1.5]), 1.0, None, None)])
        variables = model.init(
            jax.random.PRNGKey(0), batch.bmg, None, None, is_training=False
        )
        g, dims = build_partitioned_graph(giant_mg, 8)
        tx = optax.adam(1e-3)
        y = jnp.asarray(np.array([[1.5]], np.float32))
        step = make_partitioned_train_step(model, tx, mesh, dims)

        def run(seed):
            state = TrainState(
                params=jax.tree.map(
                    lambda x: jnp.array(np.asarray(x)), variables["params"]
                ),
                batch_stats={},
                opt_state=tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32),
                rng=jax.random.PRNGKey(seed),
            )
            new_state, loss = step(state, g, y, jnp.ones(1))
            return new_state, float(loss)

        s1, l1 = run(7)
        s2, l2 = run(7)
        s3, l3 = run(8)
        assert np.isfinite(l1)
        # same rng -> bit-identical step; different rng -> different masks
        assert l1 == l2
        assert l1 != l3
        # rng advanced for the next step
        assert not np.array_equal(np.asarray(s1.rng), np.asarray(jax.random.PRNGKey(7)))
        # the step actually moved the parameters
        w0 = np.asarray(variables["params"]["message_passing"]["W_h"]["kernel"])
        w1 = np.asarray(s1.params["message_passing"]["W_h"]["kernel"])
        assert not np.allclose(w0, w1)

    def test_rate_zero_matches_deterministic_path(self, model, variables, giant_mg, mesh):
        """dropout=0 must take the exact deterministic path (no rng use in
        the masks, same numbers as before the r5 widening)."""
        from chemprop_tpu.train.trainer import TrainState

        g, dims = build_partitioned_graph(giant_mg, 8)
        tx = optax.adam(1e-3)
        y = jnp.asarray(np.array([[1.5]], np.float32))
        step = make_partitioned_train_step(model, tx, mesh, dims)
        losses = []
        for seed in (0, 1):
            state = TrainState(
                params=jax.tree.map(
                    lambda x: jnp.array(np.asarray(x)), variables["params"]
                ),
                batch_stats={},
                opt_state=tx.init(variables["params"]),
                step=jnp.zeros((), jnp.int32),
                rng=jax.random.PRNGKey(seed),
            )
            _, loss = step(state, g, y, jnp.ones(1))
            losses.append(float(loss))
        assert losses[0] == losses[1]
