from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer

__all__ = ["SimpleMoleculeMolGraphFeaturizer"]
