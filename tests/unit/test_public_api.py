"""Public-API parity: every name the reference's package ``__init__``s
actually import (``chemprop/__init__.py`` and submodule ``__init__``s) must
resolve from the corresponding ``chemprop_tpu`` package, so a migrating
user's imports keep working.

Names the reference lists in ``__all__`` but never defines anywhere
(importing them fails in the reference itself) are excluded:
``MetricEvaluator``/``UncertaintyEvaluator`` (uncertainty) and
``MulticlassDirichletLoss`` (nn).
"""

import importlib

import pytest

# reference package -> names its __init__ imports (snapshot of v2.3.1)
REFERENCE_EXPORTS = {
    "": ["data", "exceptions", "featurizers", "models", "nn", "schedulers",
         "uncertainty", "utils"],
    "data": [
        "BatchMolGraph", "BatchMolAtomBondGraph", "ClassBalanceSampler",
        "Datum", "MolAtomBondDatum", "MolAtomBondTrainingBatch",
        "MoleculeDatapoint", "LazyMoleculeDatapoint", "ReactionDatapoint",
        "LazyReactionDatapoint", "MolAtomBondDatapoint", "MoleculeDataset",
        "CuikmolmakerDataset", "CuikmolmakerReactionDataset",
        "MolAtomBondDataset", "ReactionDataset", "MulticomponentDataset",
        "MolGraphDataset", "MolGraph", "SeededSampler", "SplitType",
        "TrainingBatch", "MulticomponentTrainingBatch", "build_dataloader",
        "collate_batch", "collate_mol_atom_bond_batch",
        "collate_multicomponent", "make_split_indices",
        "split_data_by_indices",
    ],
    "nn": [
        "Aggregation", "AggregationRegistry", "AttentiveAggregation",
        "MeanAggregation", "NormAggregation", "SumAggregation",
        "MessagePassing", "AtomMessagePassing", "BondMessagePassing",
        "MABMessagePassing", "MABAtomMessagePassing", "MABBondMessagePassing",
        "MulticomponentMessagePassing", "MLP", "ConstrainerFFN",
        "ChempropMetric", "LossFunctionRegistry", "MetricRegistry",
        "MSE", "MAE", "RMSE", "BoundedMSE", "BoundedMAE", "BoundedRMSE",
        "BoundedMixin", "R2Score", "MVELoss", "EvidentialLoss",
        "QuantileLoss", "BCELoss", "CrossEntropyLoss", "BinaryMCCLoss",
        "BinaryMCCMetric", "MulticlassMCCLoss", "MulticlassMCCMetric",
        "DirichletLoss", "SID", "Wasserstein", "BinaryAUROC", "BinaryAUPRC",
        "BinaryAccuracy", "BinaryF1Score", "Predictor", "PredictorRegistry",
        "RegressionFFN", "MveFFN", "EvidentialFFN", "QuantileFFN",
        "BinaryClassificationFFNBase", "BinaryClassificationFFN",
        "BinaryDirichletFFN", "MulticlassClassificationFFN",
        "MulticlassDirichletFFN", "SpectralFFN", "ClassificationMixin",
        "ScaleTransform", "UnscaleTransform", "GraphTransform",
        "Activation", "get_activation_function",
    ],
    "models": ["MPNN", "MolAtomBondMPNN", "MulticomponentMPNN", "load_model",
               "save_model"],
    "featurizers": [
        "Featurizer", "S", "T", "MultiHotAtomFeaturizer", "AtomFeatureMode",
        "get_multi_hot_atom_featurizer", "RIGRAtomFeaturizer",
        "MultiHotBondFeaturizer", "RIGRBondFeaturizer", "MolGraphCacheFacade",
        "MolGraphCache", "MolGraphCacheOnTheFly",
        "SimpleMoleculeMolGraphFeaturizer", "CuikmolmakerMolGraphFeaturizer",
        "CondensedGraphOfReactionFeaturizer", "CGRFeaturizer", "RxnMode",
        "MoleculeFeaturizerRegistry", "MorganFeaturizerMixin",
        "MorganBinaryFeaturizer", "MorganCountFeaturizer",
        "RDKit2DFeaturizer", "V1RDKit2DFeaturizer",
        "V1RDKit2DNormalizedFeaturizer", "ChargeFeaturizer",
    ],
    "uncertainty": [
        "CalibratorBase", "RegressionCalibrator",
        "BinaryClassificationCalibrator", "MulticlassClassificationCalibrator",
        "ZScalingCalibrator", "ZelikmanCalibrator", "MVEWeightingCalibrator",
        "RegressionConformalCalibrator", "PlattCalibrator",
        "IsotonicCalibrator", "MultilabelConformalCalibrator",
        "MulticlassConformalCalibrator", "AdaptiveMulticlassConformalCalibrator",
        "IsotonicMulticlassCalibrator", "UncertaintyCalibratorRegistry",
        "UncertaintyEstimator", "UncertaintyEstimatorRegistry",
        "NoUncertaintyEstimator", "EnsembleEstimator", "DropoutEstimator",
        "MVEEstimator", "EvidentialTotalEstimator",
        "EvidentialEpistemicEstimator", "EvidentialAleatoricEstimator",
        "ClassEstimator", "ClassificationDirichletEstimator",
        "MulticlassDirichletEstimator", "QuantileRegressionEstimator",
        "UncertaintyEvaluatorRegistry", "RegressionEvaluator",
        "BinaryClassificationEvaluator", "MulticlassClassificationEvaluator",
        "NLLRegressionEvaluator", "NLLClassEvaluator", "NLLMulticlassEvaluator",
        "CalibrationAreaEvaluator", "ExpectedNormalizedErrorEvaluator",
        "SpearmanEvaluator", "RegressionConformalEvaluator",
        "MultilabelConformalEvaluator", "MulticlassConformalEvaluator",
    ],
    "utils": ["ClassRegistry", "Factory", "EnumMapping", "make_mol",
              "parallel_execute", "pretty_shape", "create_and_call_object"],
}


@pytest.mark.parametrize("subpackage", sorted(REFERENCE_EXPORTS))
def test_reference_exports_resolve(subpackage):
    mod = importlib.import_module(
        "chemprop_tpu" + (f".{subpackage}" if subpackage else "")
    )
    missing = [n for n in REFERENCE_EXPORTS[subpackage] if not hasattr(mod, n)]
    assert not missing, f"chemprop_tpu.{subpackage}: missing {missing}"


def test_schedulers_exports():
    from chemprop_tpu.schedulers import build_NoamLike_LRSched  # noqa: F401
    from chemprop_tpu.exceptions import InvalidShapeError

    with pytest.raises(ValueError):
        raise InvalidShapeError("x", (1, 2), (3, 4))
