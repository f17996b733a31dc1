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


class TestMCTSRationale:
    """MCTS rationale extraction (the reference ships this only as the
    ``interpreting_monte_carlo_tree_search`` notebook, adapted from
    chemprop v1 interpret.py; here it is a first-class API)."""

    def test_find_deletion_clusters(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.interpret import find_deletion_clusters

        mol = make_mol("Cc1ccccc1")  # toluene: 1 non-ring bond + 1 ring
        clusters, atom_cls = find_deletion_clusters(mol)
        sizes = sorted(int(m).bit_count() for m in clusters)
        assert sizes == [2, 6]
        # the ipso carbon belongs to both clusters
        shared = [a for a, cs in enumerate(atom_cls) if len(cs) == 2]
        assert len(shared) == 1

    def test_search_finds_planted_rationale(self):
        """With a synthetic scorer rewarding subsets containing the full
        ring, the search peels the chain and surfaces the ring as the
        top rationale."""
        import numpy as np

        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.interpret import MCTSRationaleExplainer

        smi = "CCCCCCc1ccccc1"
        mol = make_mol(smi)
        ring_mask = 0
        for ring in mol.rings:
            for a in ring:
                ring_mask |= 1 << a

        class Planted(MCTSRationaleExplainer):
            def _score_masks(self, mg, masks):
                return np.array(
                    [1.0 if m & ring_mask == ring_mask else 0.0 for m in masks]
                )

        expl = Planted(
            model=None, variables=None, n_rollout=10,
            max_atoms=7, min_atoms=4, prop_delta=0.5,
        )
        rats = expl.explain(smi)
        assert rats, "expected at least one rationale"
        best = rats[0]
        assert best["score"] == 1.0
        assert ring_mask == ring_mask & sum(1 << a for a in best["atoms"])
        assert best["n_atoms"] <= 7

    def test_subgraph_smiles_roundtrip(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.smiles_writer import write_smiles
        from chemprop_tpu.interpret import subgraph_smiles

        mol = make_mol("Cc1ccccc1")
        ring_mask = 0
        for ring in mol.rings:
            for a in ring:
                ring_mask |= 1 << a
        assert subgraph_smiles(mol, ring_mask) == write_smiles(make_mol("c1ccccc1"))

    def test_end_to_end_real_model(self, model_and_variables):
        """The full pipeline (featurize → batched subgraph scoring → PUCT
        search → SMILES extraction) runs against a real MPNN."""
        from chemprop_tpu.interpret import MCTSRationaleExplainer

        model, variables = model_and_variables
        expl = MCTSRationaleExplainer(
            model, variables, n_rollout=5, max_atoms=6, min_atoms=2,
            prop_delta=-1e9,
        )
        rats = expl.explain("CCc1ccccc1O")
        assert rats
        for r in rats:
            assert np.isfinite(r["score"])
            assert 0 < r["n_atoms"] <= 6
            assert r["atoms"] and len(r["atoms"]) == r["n_atoms"]
        # reporting SMILES exist for at least the best rationale
        assert any(r["smiles"] for r in rats)


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
