"""Global configuration defaults (cf. reference ``chemprop/conf.py:8-9``)."""

DEFAULT_ATOM_FDIM = 72
DEFAULT_BOND_FDIM = 14
DEFAULT_HIDDEN_DIM = 300
