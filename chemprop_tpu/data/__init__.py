from chemprop_tpu.data.collate import (
    BatchMolGraph,
    MABTrainingBatch,
    PadSpec,
    TrainingBatch,
    batch_mol_graphs,
    collate_batch,
    collate_mol_atom_bond_batch,
    collate_multicomponent,
    pad_to_bucket,
)
from chemprop_tpu.data.dataloader import DataLoader, build_dataloader
from chemprop_tpu.data.datapoints import (
    LazyMoleculeDatapoint,
    LazyReactionDatapoint,
    MolAtomBondDatapoint,
    MoleculeDatapoint,
    ReactionDatapoint,
)
from chemprop_tpu.data.datasets import (
    CuikmolmakerDataset,
    CuikmolmakerReactionDataset,
    Datum,
    MABDatum,
    MolAtomBondDataset,
    MoleculeDataset,
    MulticomponentDataset,
    ReactionDataset,
)

# reference-compatible names (``chemprop/data/__init__.py``); design deltas:
# the padded BatchMolGraph serves both plain and MolAtomBond batching (bond
# ids live in MABTrainingBatch), and multicomponent batches reuse
# TrainingBatch with tuple-valued bmg/V_d fields
MolAtomBondDatum = MABDatum
MolAtomBondTrainingBatch = MABTrainingBatch
BatchMolAtomBondGraph = BatchMolGraph
MulticomponentTrainingBatch = TrainingBatch
MolGraphDataset = MoleculeDataset | ReactionDataset | MolAtomBondDataset
from chemprop_tpu.data.molgraph import MolGraph
from chemprop_tpu.data.samplers import ClassBalanceSampler, SeededSampler
from chemprop_tpu.data.splitting import SplitType, make_split_indices, split_data_by_indices

__all__ = [
    "BatchMolAtomBondGraph",
    "CuikmolmakerDataset",
    "CuikmolmakerReactionDataset",
    "LazyMoleculeDatapoint",
    "LazyReactionDatapoint",
    "MABDatum",
    "MABTrainingBatch",
    "MolAtomBondDataset",
    "MolAtomBondDatum",
    "MolAtomBondTrainingBatch",
    "MolGraphDataset",
    "MulticomponentTrainingBatch",
    "collate_mol_atom_bond_batch",
    "BatchMolGraph",
    "ClassBalanceSampler",
    "DataLoader",
    "Datum",
    "MolAtomBondDatapoint",
    "MolGraph",
    "MoleculeDatapoint",
    "MoleculeDataset",
    "MulticomponentDataset",
    "ReactionDataset",
    "collate_multicomponent",
    "PadSpec",
    "ReactionDatapoint",
    "SeededSampler",
    "SplitType",
    "TrainingBatch",
    "batch_mol_graphs",
    "build_dataloader",
    "collate_batch",
    "make_split_indices",
    "pad_to_bucket",
    "split_data_by_indices",
]
