"""Molecule-level descriptor featurizers producing extra datapoint descriptors
``x_d`` (cf. reference ``chemprop/featurizers/molecule.py:15-106``).

Morgan fingerprints come from the in-repo implementation
(:mod:`chemprop_tpu.chem.morgan`); the descriptastorus-based RDKit-2D
descriptor sets are not available without RDKit and raise a clear error.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from chemprop_tpu.chem.mol import Mol
from chemprop_tpu.chem.morgan import morgan_binary_fingerprint, morgan_count_fingerprint
from chemprop_tpu.utils.registry import ClassRegistry

MoleculeFeaturizerRegistry = ClassRegistry()


@dataclass
class MorganFeaturizerMixin:
    radius: int = 2
    length: int = 2048
    include_chirality: bool = True

    def __post_init__(self):
        if self.radius < 0:
            raise ValueError(f"radius must be >= 0, got {self.radius}")

    def __len__(self) -> int:
        return self.length


@MoleculeFeaturizerRegistry.register("morgan_binary")
class MorganBinaryFeaturizer(MorganFeaturizerMixin):
    def __call__(self, mol: Mol) -> np.ndarray:
        return morgan_binary_fingerprint(mol, self.radius, self.length)


@MoleculeFeaturizerRegistry.register("morgan_count")
class MorganCountFeaturizer(MorganFeaturizerMixin):
    def __call__(self, mol: Mol) -> np.ndarray:
        return morgan_count_fingerprint(mol, self.radius, self.length)


@MoleculeFeaturizerRegistry.register("charge")
class ChargeFeaturizer:
    """Net formal charge as a single descriptor."""

    def __call__(self, mol: Mol) -> np.ndarray:
        return np.array([sum(a.formal_charge for a in mol.atoms)])

    def __len__(self) -> int:
        return 1


class _UnavailableFeaturizer:
    _reason = "requires RDKit/descriptastorus, which this TPU-native stack does not ship"

    def __init__(self, *args, **kwargs):
        raise NotImplementedError(f"{type(self).__name__} {self._reason}")


@MoleculeFeaturizerRegistry.register("rdkit_2d")
class RDKit2DFeaturizer(_UnavailableFeaturizer):
    pass


@MoleculeFeaturizerRegistry.register("v1_rdkit_2d")
class V1RDKit2DFeaturizer(_UnavailableFeaturizer):
    pass


@MoleculeFeaturizerRegistry.register("v1_rdkit_2d_normalized")
class V1RDKit2DNormalizedFeaturizer(_UnavailableFeaturizer):
    pass
