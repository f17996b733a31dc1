"""LazyMoleculeDatapoint: deferred SMILES parsing (cf. reference
LazyMoleculeDatapoint, data/datapoints.py:154)."""

import numpy as np

from chemprop_tpu.data.datapoints import LazyMoleculeDatapoint, MoleculeDatapoint


def test_mol_parsed_on_first_access():
    dp = LazyMoleculeDatapoint.from_smi("CCO", y=np.array([1.0]))
    assert "_mol" not in dp.__dict__  # nothing parsed yet
    assert dp.mol.num_atoms == 3
    assert "_mol" in dp.__dict__  # cached now
    assert dp.mol is dp.mol


def test_matches_eager_datapoint():
    lazy = LazyMoleculeDatapoint.from_smi("c1ccccc1O", keep_h=False)
    eager = MoleculeDatapoint.from_smi("c1ccccc1O", keep_h=False)
    assert lazy.mol.num_atoms == eager.mol.num_atoms
    assert lazy.mol.num_bonds == eager.mol.num_bonds
    assert lazy.name == eager.name == "c1ccccc1O"


def test_parse_flags_respected():
    lazy = LazyMoleculeDatapoint.from_smi("[H][H]", keep_h=True)
    assert lazy.mol.num_atoms == 2


def test_works_in_dataset():
    from chemprop_tpu.data import MoleculeDataset

    dps = [LazyMoleculeDatapoint.from_smi(s, y=np.array([float(i)]))
           for i, s in enumerate(["CCO", "CC", "c1ccccc1"])]
    ds = MoleculeDataset(dps)
    d = ds[0]
    assert d.mg.V.shape[0] == 3
