"""v1 checkpoint conversion pinned to the reference's golden predictions
(cf. reference ``tests/unit/utils/test_converter.py:46-62`` +
``tests/data/example_model_v1_regression_mol_prediction.csv``): the converted
model must reproduce the exact predictions the v1 torch model produced —
end-to-end proof that SMILES parsing, perception (nitro charge separation,
conjugation, hybridization, fused-ring kekulization), v1 featurization, and
the weight remap all match the reference stack."""

import csv
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from chemprop_tpu.cli.parsing import make_dataset
from chemprop_tpu.data import MoleculeDatapoint, PadSpec, collate_batch
from chemprop_tpu.models.torch_convert import convert_model


@pytest.fixture(scope="module")
def v1_model(data_dir):
    return convert_model(data_dir / "example_model_v1_regression_mol.pt")


@pytest.fixture(scope="module")
def golden(data_dir):
    rows = list(
        csv.DictReader(open(data_dir / "example_model_v1_regression_mol_prediction.csv"))
    )
    return [r["smiles"] for r in rows], np.array([float(r["logSolubility"]) for r in rows])


class TestV1Conversion:
    def test_model_structure(self, v1_model):
        model, variables, cols = v1_model
        assert cols == ["logSolubility"]
        # v1 ffn_num_layers=2 -> two Linear blocks
        ffn = variables["params"]["predictor"]["ffn"]
        assert set(ffn) == {"block0", "block1"}
        # v1 atom featurizer is 133-dim; bond 14 -> W_i input 147
        assert variables["params"]["message_passing"]["W_i"]["kernel"].shape == (147, 300)

    def test_golden_predictions(self, v1_model, golden):
        model, variables, _ = v1_model
        smis, want = golden
        dps = [MoleculeDatapoint.from_smi(s, y=np.array([np.nan])) for s in smis]
        ds = make_dataset(dps, multi_hot_atom_featurizer_mode="v1")
        data = [ds[i] for i in range(len(ds))]
        batch = collate_batch(data, PadSpec.for_graphs([d.mg for d in data]))
        preds = np.asarray(
            model.apply(variables, batch.bmg, batch.V_d, batch.X_d, is_training=False)
        )[batch.pad_mask]
        np.testing.assert_allclose(preds.ravel(), want, atol=1e-5)

    def test_convert_cli(self, data_dir, tmp_path, monkeypatch):
        from chemprop_tpu.cli.main import main as cli_main

        out = tmp_path / "v1_converted.ckpt"
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "chemprop-tpu", "convert", "--conversion", "v1_to_v2",
                "-i", str(data_dir / "example_model_v1_regression_mol.pt"),
                "-o", str(out),
            ],
        )
        assert cli_main() in (0, None)
        from chemprop_tpu.models.serialize import load_model

        model, variables, extra = load_model(out)
        assert extra["output_columns"] == ["logSolubility"]


class TestPerceptionGoldens:
    """Perception rules pinned by the v1 parity hunt (RDKit semantics)."""

    def test_nitro_charge_separation(self):
        from chemprop_tpu.chem import make_mol

        m = make_mol("O=N(=O)c1ccccc1")
        charges = sorted(a.formal_charge for a in m.atoms[:3])
        assert charges == [-1, 0, 1]
        n = next(a for a in m.atoms if a.symbol == "N")
        assert n.formal_charge == 1 and n.total_num_hs == 0

    def test_azide_charge_separation(self):
        from chemprop_tpu.chem import make_mol

        m = make_mol("CN=N=N")
        charges = [a.formal_charge for a in m.atoms]
        assert charges.count(1) == 1 and charges.count(-1) == 1

    def test_sulfur_lone_pair_does_not_conjugate(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import HybridizationType

        m = make_mol("CC(=O)SC")  # thioester
        s = next(a for a in m.atoms if a.symbol == "S")
        assert s.hybridization == HybridizationType.SP3
        b = m.get_bond_between(1, 3)  # C(=O)-S
        assert not b.is_conjugated

    def test_ester_oxygen_conjugates(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import HybridizationType

        m = make_mol("CC(=O)OC")
        o_ester = m.atoms[3]
        assert m.get_bond_between(1, 3).is_conjugated
        assert o_ester.hybridization == HybridizationType.SP2

    def test_phosphate_bonds_not_conjugated(self):
        from chemprop_tpu.chem import make_mol

        m = make_mol("COP(=O)(OC)OC")
        p = next(a.idx for a in m.atoms if a.symbol == "P")
        assert all(not b.is_conjugated for b in m.atom_bonds(p))

    def test_fused_nonaromatic_ring_linker_kekulizes_single(self):
        from chemprop_tpu.chem import make_mol
        from chemprop_tpu.chem.mol import BondType

        # triazolam scaffold: the c-n bond inside the 7-membered ring links
        # two aromatic systems but is not itself aromatic
        m = make_mol("Cc3nnc4CN=C(c1ccccc1)c2ccccc2n34")
        linker = m.get_bond_between(19, 20)
        assert linker is not None and linker.bond_type == BondType.SINGLE


def test_predict_auto_detects_v1_featurizer(data_dir, tmp_path, monkeypatch):
    """predict must notice the 147-dim W_i and switch to the v1 atom
    featurizer automatically (reference cli/predict.py:224-298)."""
    import pandas as pd

    from chemprop_tpu.cli.main import main as cli_main
    from chemprop_tpu.models.serialize import save_model

    model, variables, cols = convert_model(data_dir / "example_model_v1_regression_mol.pt")
    ckpt = tmp_path / "v1.ckpt"
    save_model(ckpt, model, variables, output_columns=cols)

    golden = pd.read_csv(data_dir / "example_model_v1_regression_mol_prediction.csv")
    inp = tmp_path / "in.csv"
    golden[["smiles"]].to_csv(inp, index=False)  # ALL 50 golden rows
    out = tmp_path / "preds.csv"
    monkeypatch.setattr(
        sys,
        "argv",
        ["chemprop-tpu", "predict", "-i", str(inp), "--model-paths", str(ckpt), "-o", str(out)],
    )
    assert cli_main() in (0, None)
    got = pd.read_csv(out)["logSolubility"].to_numpy()
    np.testing.assert_allclose(got, golden["logSolubility"].to_numpy(), atol=1e-5)
