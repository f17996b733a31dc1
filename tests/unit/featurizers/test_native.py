"""Parity tests: native C++ batch featurizer vs the Python path (cf. reference
``tests/unit/featurizers/test_cuikmolmaker.py`` — C++/Python identical
BatchMolGraphs)."""

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.featurizers import SimpleMoleculeMolGraphFeaturizer
from chemprop_tpu.featurizers.native import (
    featurize_batch_native,
    molgraphs_from_native,
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_native_matches_python(smis):
    feat = SimpleMoleculeMolGraphFeaturizer()
    nb = featurize_batch_native(smis)
    mgs = molgraphs_from_native(nb)
    assert len(mgs) == len(smis)
    for smi, mg_native in zip(smis, mgs):
        mg_py = feat(make_mol(smi))
        np.testing.assert_array_equal(mg_native.V, mg_py.V.astype(np.float32), err_msg=smi)
        np.testing.assert_array_equal(mg_native.E, mg_py.E.astype(np.float32), err_msg=smi)
        np.testing.assert_array_equal(mg_native.edge_index, mg_py.edge_index, err_msg=smi)
        np.testing.assert_array_equal(mg_native.rev_edge_index, mg_py.rev_edge_index, err_msg=smi)


def test_native_batch_layout(smis):
    nb = featurize_batch_native(smis[:10])
    assert nb.V.shape[1] == 72 and nb.E.shape[1] == 14
    assert nb.atom_offsets[0] == 0 and nb.atom_offsets[-1] == nb.V.shape[0]
    assert nb.edge_offsets[-1] == nb.E.shape[0]
    # batch vector is the mol id per atom
    for m in range(10):
        a0, a1 = nb.atom_offsets[m], nb.atom_offsets[m + 1]
        assert (nb.batch[a0:a1] == m).all()
    # rev is a global involution
    np.testing.assert_array_equal(nb.rev[nb.rev], np.arange(len(nb.rev)))


def test_native_errors():
    with pytest.raises(ValueError, match="not_a_smiles"):
        featurize_batch_native(["CCO", "not_a_smiles"])


def test_native_keep_h():
    nb = featurize_batch_native(["[H][H]"], keep_h=True)
    assert nb.V.shape[0] == 2
    nb2 = featurize_batch_native(["[H]C([H])([H])[H]"], keep_h=False)
    assert nb2.V.shape[0] == 1


def test_native_throughput(smis):
    """The point of the C++ path: beat per-molecule Python featurization."""
    import time

    big = (smis * 10)[:1000]
    featurize_batch_native(big)  # warm up allocator/pages (slow first-touch container)
    t0 = time.perf_counter()
    featurize_batch_native(big)
    t_native = time.perf_counter() - t0

    feat = SimpleMoleculeMolGraphFeaturizer()
    t0 = time.perf_counter()
    for smi in big[:100]:
        feat(make_mol(smi))
    t_python = (time.perf_counter() - t0) * 10

    assert t_native < t_python, f"native {t_native:.3f}s not faster than python {t_python:.3f}s"


class TestNativeCGR:
    """C++ CGR batch featurizer vs the Python CGR path — bit-identical
    (the cuik ``batch_reaction_featurizer`` parity bar, cf. reference
    ``tests/unit/featurizers/test_cuikmolmaker_reaction.py``)."""

    @pytest.fixture(scope="class")
    def rxn_smis(self, data_dir):
        import csv as _csv

        with open(data_dir / "regression" / "rxn" / "rxn.csv") as f:
            return [r["smiles"] for r in _csv.DictReader(f)][:30]

    @pytest.mark.parametrize(
        "mode",
        [
            "REAC_PROD", "REAC_PROD_BALANCE", "REAC_DIFF",
            "REAC_DIFF_BALANCE", "PROD_DIFF", "PROD_DIFF_BALANCE",
        ],
    )
    def test_rxn_parity(self, rxn_smis, mode):
        from chemprop_tpu.data.datapoints import ReactionDatapoint
        from chemprop_tpu.featurizers.molgraph.reaction import (
            CondensedGraphOfReactionFeaturizer,
        )
        from chemprop_tpu.featurizers.native import (
            featurize_rxn_batch_native,
            molgraphs_from_native,
            native_available,
        )

        if not native_available():
            pytest.skip("native library unavailable")
        nb = featurize_rxn_batch_native(rxn_smis, keep_h=True, mode=mode)
        native_mgs = molgraphs_from_native(nb)

        feat = CondensedGraphOfReactionFeaturizer(mode_=mode)
        for smi, nmg in zip(rxn_smis, native_mgs):
            dp = ReactionDatapoint.from_smi(smi, keep_h=True)
            pmg = feat((dp.rct, dp.pdt))
            np.testing.assert_array_equal(nmg.V, pmg.V, err_msg=f"{smi} V ({mode})")
            np.testing.assert_array_equal(nmg.E, pmg.E, err_msg=f"{smi} E ({mode})")
            np.testing.assert_array_equal(nmg.edge_index, pmg.edge_index)
            np.testing.assert_array_equal(nmg.rev_edge_index, pmg.rev_edge_index)

    def test_dataset_populate_cache_native(self, rxn_smis):
        from chemprop_tpu.data.datapoints import ReactionDatapoint
        from chemprop_tpu.data.datasets import ReactionDataset
        from chemprop_tpu.featurizers.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")
        dps = [ReactionDatapoint.from_smi(s, keep_h=True) for s in rxn_smis[:8]]
        ds = ReactionDataset(dps)
        ref = [ds[i].mg for i in range(len(ds))]
        assert ds.populate_cache_native(keep_h=True)
        for i in range(len(ds)):
            np.testing.assert_array_equal(ds[i].mg.V, ref[i].V)
            np.testing.assert_array_equal(ds[i].mg.E, ref[i].E)
