"""Split-family tests (cf. reference ``tests/unit/data/test_splitting.py``)."""

import numpy as np
import pytest

from chemprop_tpu.chem import make_mol
from chemprop_tpu.chem.scaffold import murcko_scaffold_key
from chemprop_tpu.data import SplitType, make_split_indices, split_data_by_indices


@pytest.fixture(scope="module")
def mols(smis):
    return [make_mol(s) for s in smis]


def _assert_partition(tr, va, te, n):
    all_idxs = sorted(tr + va + te)
    assert all_idxs == list(range(n))


@pytest.mark.parametrize("split", ["random", "kmeans", "kennard_stone", "scaffold_balanced"])
def test_partition_and_sizes(mols, split):
    (tr,), (va,), (te,) = make_split_indices(mols, split, (0.8, 0.1, 0.1), seed=0)
    _assert_partition(tr, va, te, len(mols))
    assert len(tr) >= 60  # grouped splits may deviate from exact 80


def test_random_deterministic(mols):
    a = make_split_indices(mols, "random", seed=42)
    b = make_split_indices(mols, "random", seed=42)
    assert a == b
    c = make_split_indices(mols, "random", seed=43)
    assert a != c


def test_replicates_differ(mols):
    trs, vas, tes = make_split_indices(mols, "random", num_replicates=3, seed=0)
    assert len(trs) == 3
    assert trs[0] != trs[1] != trs[2]


def test_scaffolds_not_split(mols):
    (tr,), (va,), (te,) = make_split_indices(mols, "scaffold_balanced", seed=0)
    keys = [murcko_scaffold_key(m) for m in mols]
    for key in set(keys):
        where = {
            "tr" if i in set(tr) else "va" if i in set(va) else "te"
            for i, k in enumerate(keys)
            if k == key
        }
        assert len(where) == 1, f"scaffold {key} split across {where}"


def test_repeated_smiles_stay_together():
    smis = ["CCO"] * 5 + ["CCN"] * 5 + ["CCC"] * 5 + ["CCCl"] * 5
    mols = [make_mol(s) for s in smis]
    (tr,), (va,), (te,) = make_split_indices(
        mols, "random_with_repeated_smiles", (0.5, 0.25, 0.25), seed=0
    )
    for group_start in range(0, 20, 5):
        g = set(range(group_start, group_start + 5))
        assert g <= set(tr) or g <= set(va) or g <= set(te)


def test_train_only():
    mols = [make_mol("CCO")] * 10
    trs, vas, tes = make_split_indices(mols, "random", (1.0, 0.0, 0.0), num_replicates=2)
    assert trs[0] == list(range(10)) and vas[0] == [] and tes[0] == []


def test_split_data_by_indices():
    data = list("abcdefghij")
    (tr,), (va,), (te,) = split_data_by_indices(data, [[0, 1, 2]], [[3]], [[4, 5]])
    assert tr == ["a", "b", "c"] and va == ["d"] and te == ["e", "f"]
    # multicomponent: list of per-component datapoint lists
    comp = [list("abc"), list("xyz")]
    (tr,), _, _ = split_data_by_indices(comp, [[0, 2]], None, None)
    assert tr == [["a", "c"], ["x", "z"]]


def test_bad_sizes(mols):
    with pytest.raises(ValueError):
        make_split_indices(mols, "random", (0.5, 0.2))
    with pytest.raises(ValueError):
        make_split_indices(mols, "random", (0.5, 0.2, 0.2))
    with pytest.raises(KeyError):
        SplitType.get("not_a_split")
