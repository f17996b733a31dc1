from chemprop_tpu.models.model import MPNN

__all__ = ["MPNN"]
