from chemprop_tpu.nn import metrics
from chemprop_tpu.nn.agg import (
    Aggregation,
    AggregationRegistry,
    AttentiveAggregation,
    MeanAggregation,
    NormAggregation,
    SumAggregation,
)
from chemprop_tpu.nn.batchnorm import MaskedBatchNorm
from chemprop_tpu.nn.ffn import MLP, ConstrainerFFN
from chemprop_tpu.nn.message_passing import AtomMessagePassing, BondMessagePassing
from chemprop_tpu.nn.message_passing.multi import MulticomponentMessagePassing
from chemprop_tpu.nn.metrics import ChempropMetric, LossFunctionRegistry, MetricRegistry
from chemprop_tpu.nn.predictors import (
    BinaryClassificationFFN,
    BinaryDirichletFFN,
    EvidentialFFN,
    MulticlassClassificationFFN,
    MulticlassDirichletFFN,
    MveFFN,
    PredictorRegistry,
    QuantileFFN,
    RegressionFFN,
    SpectralFFN,
)
from chemprop_tpu.nn.message_passing.base import _MessagePassingBase as MessagePassing
from chemprop_tpu.nn.message_passing.mol_atom_bond import (
    MABAtomMessagePassing,
    MABBondMessagePassing,
    _MABMessagePassingBase as MABMessagePassing,
)
from chemprop_tpu.nn.metrics import (
    MAE,
    MSE,
    RMSE,
    SID,
    BCELoss,
    BinaryAccuracy,
    BinaryAUPRC,
    BinaryAUROC,
    BinaryF1Score,
    BinaryMCCLoss,
    BinaryMCCMetric,
    BoundedMAE,
    BoundedMixin,
    BoundedMSE,
    BoundedRMSE,
    CrossEntropyLoss,
    DirichletLoss,
    EvidentialLoss,
    MulticlassMCCLoss,
    MulticlassMCCMetric,
    MVELoss,
    QuantileLoss,
    R2Score,
    Wasserstein,
)
from chemprop_tpu.nn.predictors import (
    BinaryClassificationFFNBase,
    _FFNPredictorBase as Predictor,
)

# the reference's ClassificationMixin (predictors.py) provides the
# logits-vs-probabilities train/inference split; here that split lives on
# BinaryClassificationFFNBase directly
ClassificationMixin = BinaryClassificationFFNBase

from chemprop_tpu.nn.transforms import GraphTransform, ScaleTransform, UnscaleTransform
from chemprop_tpu.nn.utils import Activation, get_activation_function

__all__ = [
    "MessagePassing",
    "MABAtomMessagePassing",
    "MABBondMessagePassing",
    "MABMessagePassing",
    "MAE",
    "MSE",
    "RMSE",
    "SID",
    "BCELoss",
    "BinaryAccuracy",
    "BinaryAUPRC",
    "BinaryAUROC",
    "BinaryF1Score",
    "BinaryMCCLoss",
    "BinaryMCCMetric",
    "BoundedMAE",
    "BoundedMixin",
    "BoundedMSE",
    "BoundedRMSE",
    "CrossEntropyLoss",
    "DirichletLoss",
    "EvidentialLoss",
    "MulticlassMCCLoss",
    "MulticlassMCCMetric",
    "MVELoss",
    "QuantileLoss",
    "R2Score",
    "Wasserstein",
    "BinaryClassificationFFNBase",
    "Predictor",
    "ClassificationMixin",
    "Activation",
    "Aggregation",
    "AggregationRegistry",
    "AtomMessagePassing",
    "AttentiveAggregation",
    "BinaryClassificationFFN",
    "BinaryDirichletFFN",
    "BondMessagePassing",
    "ChempropMetric",
    "ConstrainerFFN",
    "EvidentialFFN",
    "GraphTransform",
    "LossFunctionRegistry",
    "MLP",
    "MaskedBatchNorm",
    "MeanAggregation",
    "MetricRegistry",
    "MulticlassClassificationFFN",
    "MulticomponentMessagePassing",
    "MulticlassDirichletFFN",
    "MveFFN",
    "NormAggregation",
    "PredictorRegistry",
    "QuantileFFN",
    "RegressionFFN",
    "ScaleTransform",
    "SpectralFFN",
    "SumAggregation",
    "UnscaleTransform",
    "get_activation_function",
    "metrics",
]
