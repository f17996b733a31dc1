from chemprop_tpu.data.collate import (
    BatchMolGraph,
    PadSpec,
    TrainingBatch,
    batch_mol_graphs,
    collate_batch,
    collate_multicomponent,
    pad_to_bucket,
)
from chemprop_tpu.data.dataloader import DataLoader, build_dataloader
from chemprop_tpu.data.datapoints import (
    MolAtomBondDatapoint,
    MoleculeDatapoint,
    ReactionDatapoint,
)
from chemprop_tpu.data.datasets import (
    Datum,
    MoleculeDataset,
    MulticomponentDataset,
    ReactionDataset,
)
from chemprop_tpu.data.molgraph import MolGraph
from chemprop_tpu.data.samplers import ClassBalanceSampler, SeededSampler
from chemprop_tpu.data.splitting import SplitType, make_split_indices, split_data_by_indices

__all__ = [
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
