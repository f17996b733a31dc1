"""Prediction-time callbacks (cf. reference ``chemprop/callbacks/__init__.py``).

The reference hooks Lightning ``Callback`` objects into ``trainer.predict``;
here a callback is any object with ``run(model, variables, dataset, output_dir)``
invoked by the predict CLI after inference. ``MyersonExplainerCallback`` wraps
the in-repo Myerson attribution engine (:mod:`chemprop_tpu.interpret`) under
the reference's class name.
"""

from __future__ import annotations

from chemprop_tpu.interpret import MyersonExplainer
from chemprop_tpu.utils.registry import ClassRegistry

CallbackRegistry = ClassRegistry()


@CallbackRegistry.register("myerson")
class MyersonExplainerCallback:
    """Per-atom Myerson-value attributions computed during predict
    (cf. reference ``callbacks/interpret.py:25-164``): exact enumeration for
    molecules with <= ``sampling_threshold`` atoms, Monte-Carlo sampling
    above it; results saved as ``.npz`` (or ``.json``)."""

    def __init__(self, sampling_threshold: int = 20, n_samples: int = 200,
                 save_as_json: bool = False, seed: int = 0, **kwargs):
        self.sampling_threshold = sampling_threshold
        self.n_samples = n_samples
        self.save_as_json = save_as_json
        self.seed = seed
        self.kwargs = kwargs

    def explain(self, model, variables, dataset):
        explainer = MyersonExplainer(
            model,
            variables,
            sampling_threshold=self.sampling_threshold,
            n_samples=self.n_samples,
            seed=self.seed,
            **self.kwargs,
        )
        return [explainer.explain(dataset[i].mg) for i in range(len(dataset))]


@CallbackRegistry.register("mcts")
class MCTSRationaleCallback:
    """MCTS substructure rationales computed during predict
    (:class:`chemprop_tpu.interpret.MCTSRationaleExplainer`; the reference
    ships this algorithm only as its
    ``interpreting_monte_carlo_tree_search`` notebook)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def explain(self, model, variables, dataset):
        from chemprop_tpu.interpret import MCTSRationaleExplainer

        explainer = MCTSRationaleExplainer(model, variables, **self.kwargs)
        return [explainer.explain_mol(dataset.data[i].mol) for i in range(len(dataset))]


__all__ = ["CallbackRegistry", "MCTSRationaleCallback", "MyersonExplainerCallback"]
