"""chemprop_tpu: a TPU-native molecular property prediction framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
chemprop D-MPNN framework (reference: chemprop/chemprop v2.3.1), designed
TPU-first: static-shape padded graph batching, segment-op/Pallas message
passing on the MXU/VPU, pjit/shard_map data- and edge-parallelism over device
meshes, and a self-contained chemistry substrate (no RDKit dependency).
"""

__version__ = "0.1.0"

from chemprop_tpu import (  # noqa: E402
    callbacks,
    data,
    exceptions,
    featurizers,
    models,
    nn,
    schedulers,
    uncertainty,
    utils,
)

__all__ = [
    "callbacks",
    "data",
    "exceptions",
    "featurizers",
    "models",
    "nn",
    "schedulers",
    "uncertainty",
    "utils",
    "__version__",
]
