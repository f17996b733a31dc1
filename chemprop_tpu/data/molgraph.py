"""Re-export of the per-molecule graph record (defined in
:mod:`chemprop_tpu.types` to keep the featurizer layer import-cycle-free)."""

from chemprop_tpu.types import MolGraph

__all__ = ["MolGraph"]
