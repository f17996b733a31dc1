from chemprop_tpu.uncertainty.calibrator import CalibratorRegistry
from chemprop_tpu.uncertainty.estimator import UncertaintyEstimatorRegistry
from chemprop_tpu.uncertainty.evaluator import UncertaintyEvaluatorRegistry

__all__ = [
    "CalibratorRegistry",
    "UncertaintyEstimatorRegistry",
    "UncertaintyEvaluatorRegistry",
]
