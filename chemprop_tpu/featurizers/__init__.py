from chemprop_tpu.featurizers.atom import (
    AtomFeatureMode,
    MultiHotAtomFeaturizer,
    RIGRAtomFeaturizer,
    get_multi_hot_atom_featurizer,
)
from chemprop_tpu.featurizers.base import GraphFeaturizer, VectorFeaturizer
from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer
from chemprop_tpu.featurizers.molecule import (
    ChargeFeaturizer,
    MoleculeFeaturizerRegistry,
    MorganBinaryFeaturizer,
    MorganCountFeaturizer,
)
from chemprop_tpu.featurizers.molgraph import (
    CGRFeaturizer,
    CondensedGraphOfReactionFeaturizer,
    RxnMode,
    SimpleMoleculeMolGraphFeaturizer,
)

__all__ = [
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
