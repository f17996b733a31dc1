"""Myerson explainer tests: the Shapley efficiency axiom (attributions sum
to the full-graph prediction for a connected molecule, since v(N) = f(N) and
v({}) = 0), exact-vs-sampling agreement, and disconnected-graph additivity."""

import numpy as np
import pytest


def _featurize(smi):
    from chemprop_tpu.data import MoleculeDatapoint
    from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer

    dp = MoleculeDatapoint.from_smi(smi, y=np.array([0.0]))
    return SimpleMoleculeMolGraphFeaturizer()(dp.mol)


@pytest.fixture(scope="module")
def model_and_variables():
    import jax

    from chemprop_tpu.models import MPNN
    from chemprop_tpu.nn import BondMessagePassing, MeanAggregation, RegressionFFN

    model = MPNN(
        message_passing=BondMessagePassing(),
        agg=MeanAggregation(),
        predictor=RegressionFFN(),
        batch_norm=False,
    )
    mg = _featurize("CCO")
    from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs

    bmg = batch_mol_graphs([mg], PadSpec(16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), bmg, is_training=False)
    return model, variables


def _predict_one(model, variables, mg):
    from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs, pad_to_bucket

    bmg = batch_mol_graphs(
        [mg], PadSpec(pad_to_bucket(mg.V.shape[0] + 1), pad_to_bucket(max(1, mg.E.shape[0])), 1)
    )
    out = np.asarray(model.apply(variables, bmg, None, None, is_training=False))
    return out[0]


class TestMyersonExact:
    def test_efficiency_axiom(self, model_and_variables):
        from chemprop_tpu.interpret import MyersonExplainer

        model, variables = model_and_variables
        mg = _featurize("CC(=O)O")  # 4 heavy atoms
        phi = MyersonExplainer(model, variables).explain(mg)
        assert phi.shape == (4, 1)
        full = _predict_one(model, variables, mg)
        np.testing.assert_allclose(phi.sum(axis=0), full, rtol=1e-4, atol=1e-4)

    def test_symmetry(self, model_and_variables):
        """In ethane-like symmetric molecules the two equivalent atoms get
        equal attributions."""
        from chemprop_tpu.interpret import MyersonExplainer

        model, variables = model_and_variables
        mg = _featurize("CC")
        phi = MyersonExplainer(model, variables).explain(mg)
        np.testing.assert_allclose(phi[0], phi[1], rtol=1e-5)


class TestMyersonSampling:
    def test_matches_exact_on_small_molecule(self, model_and_variables):
        from chemprop_tpu.interpret import MyersonExplainer

        model, variables = model_and_variables
        mg = _featurize("CCO")
        exact = MyersonExplainer(model, variables).explain(mg)
        sampled = MyersonExplainer(
            model, variables, sampling_threshold=0, n_samples=300, seed=1
        ).explain(mg)
        np.testing.assert_allclose(sampled, exact, rtol=0.2, atol=0.05)

    def test_sampling_efficiency_axiom(self, model_and_variables):
        """Every sampled permutation telescopes to v(N), so efficiency holds
        exactly even for few samples."""
        from chemprop_tpu.interpret import MyersonExplainer

        model, variables = model_and_variables
        mg = _featurize("c1ccccc1O")
        phi = MyersonExplainer(
            model, variables, sampling_threshold=0, n_samples=20, seed=2
        ).explain(mg)
        full = _predict_one(model, variables, mg)
        np.testing.assert_allclose(phi.sum(axis=0), full, rtol=1e-4, atol=1e-4)
