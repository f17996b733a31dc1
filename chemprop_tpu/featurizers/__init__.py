from chemprop_tpu.featurizers.atom import (
    AtomFeatureMode,
    MultiHotAtomFeaturizer,
    RIGRAtomFeaturizer,
    get_multi_hot_atom_featurizer,
)
from typing import TypeVar

from chemprop_tpu.featurizers.base import GraphFeaturizer, VectorFeaturizer
from chemprop_tpu.featurizers.molgraph.cache import (
    MolGraphCache,
    MolGraphCacheFacade,
    MolGraphCacheOnTheFly,
)
from chemprop_tpu.featurizers.native import (
    BatchCuikMolGraph,
    CuikmolmakerCGRFeaturizer,
    CuikmolmakerMolGraphFeaturizer,
)

# reference-compatible names (``chemprop/featurizers/base.py:13-30``)
Featurizer = VectorFeaturizer
MoleculeFeaturizer = VectorFeaturizer
S = TypeVar("S")
T = TypeVar("T")
from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer
from chemprop_tpu.featurizers.molecule import (
    BinaryFeaturizerMixin,
    ChargeFeaturizer,
    CountFeaturizerMixin,
    MoleculeFeaturizerRegistry,
    MorganBinaryFeaturizer,
    MorganCountFeaturizer,
    MorganFeaturizerMixin,
    RDKit2DFeaturizer,
    V1RDKit2DFeaturizer,
    V1RDKit2DNormalizedFeaturizer,
)
from chemprop_tpu.featurizers.molgraph import (
    CGRFeaturizer,
    CondensedGraphOfReactionFeaturizer,
    RxnMode,
    SimpleMoleculeMolGraphFeaturizer,
)

__all__ = [
    "BatchCuikMolGraph",
    "CuikmolmakerCGRFeaturizer",
    "CuikmolmakerMolGraphFeaturizer",
    "Featurizer",
    "MoleculeFeaturizer",
    "MolGraphCache",
    "MolGraphCacheFacade",
    "MolGraphCacheOnTheFly",
    "MorganFeaturizerMixin",
    "BinaryFeaturizerMixin",
    "CountFeaturizerMixin",
    "RDKit2DFeaturizer",
    "S",
    "T",
    "V1RDKit2DFeaturizer",
    "V1RDKit2DNormalizedFeaturizer",
    "AtomFeatureMode",
    "CGRFeaturizer",
    "ChargeFeaturizer",
    "CondensedGraphOfReactionFeaturizer",
    "RxnMode",
    "GraphFeaturizer",
    "MoleculeFeaturizerRegistry",
    "MorganBinaryFeaturizer",
    "MorganCountFeaturizer",
    "MultiHotAtomFeaturizer",
    "MultiHotBondFeaturizer",
    "RIGRAtomFeaturizer",
    "RIGRBondFeaturizer",
    "SimpleMoleculeMolGraphFeaturizer",
    "VectorFeaturizer",
    "get_multi_hot_atom_featurizer",
]
