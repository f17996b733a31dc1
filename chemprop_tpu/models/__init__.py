from chemprop_tpu.models.model import MPNN
from chemprop_tpu.models.mol_atom_bond import MolAtomBondMPNN
from chemprop_tpu.models.multi import MulticomponentMPNN
from chemprop_tpu.models.serialize import load_checkpoint, load_model, save_checkpoint, save_model

__all__ = [
    "MPNN",
    "MolAtomBondMPNN",
    "MulticomponentMPNN",
    "load_checkpoint",
    "load_model",
    "save_checkpoint",
    "save_model",
]
