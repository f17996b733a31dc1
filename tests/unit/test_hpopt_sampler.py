"""TPE sampler unit tests (the in-repo hyperopt/optuna equivalent behind
``chemprop-tpu hpopt --search-algorithm``; cf. reference cli/hpopt.py:70-92
which delegates to Ray Tune's HyperOptSearch/OptunaSearch)."""

import numpy as np

from chemprop_tpu.cli.hpopt import SEARCH_SPACE, TPESampler, _expand_keywords, _sample


def _objective(cfg):
    # minimum at depth=4, max_lr=1e-3, dropout=0.05
    return (
        (cfg["depth"] - 4) ** 2
        + (np.log10(cfg["max_lr"]) + 3) ** 2
        + 10 * abs(cfg["dropout"] - 0.05)
    )


def _run(sampler_or_rng, n, keys):
    best = np.inf
    history = []
    for _ in range(n):
        if isinstance(sampler_or_rng, TPESampler):
            cfg = sampler_or_rng.suggest()
        else:
            cfg = _sample(sampler_or_rng, keys)
        score = _objective(cfg)
        if isinstance(sampler_or_rng, TPESampler):
            sampler_or_rng.observe(cfg, score)
        history.append(score)
        best = min(best, score)
    return best, history


class TestTPESampler:
    KEYS = ["depth", "max_lr", "dropout"]

    def test_suggestions_stay_in_bounds(self):
        tpe = TPESampler(self.KEYS, np.random.default_rng(0), n_startup=3)
        for _ in range(30):
            cfg = tpe.suggest()
            tpe.observe(cfg, _objective(cfg))
            assert 2 <= cfg["depth"] <= 6
            assert 1e-4 <= cfg["max_lr"] <= 1e-2
            assert cfg["dropout"] in SEARCH_SPACE["dropout"][1]

    def test_int_step_snaps_to_grid(self):
        keys = ["message_hidden_dim"]
        tpe = TPESampler(keys, np.random.default_rng(1), n_startup=2)
        for _ in range(20):
            cfg = tpe.suggest()
            tpe.observe(cfg, abs(cfg["message_hidden_dim"] - 400))
            assert cfg["message_hidden_dim"] % 100 == 0
            assert 200 <= cfg["message_hidden_dim"] <= 800

    def test_tpe_concentrates_after_startup(self):
        tpe = TPESampler(self.KEYS, np.random.default_rng(2), n_startup=8)
        _, history = _run(tpe, 60, self.KEYS)
        # post-startup suggestions should be much better than the random
        # startup phase on average
        assert np.mean(history[-20:]) < np.mean(history[:8])

    def test_tpe_beats_random_budget_matched(self):
        n = 50
        tpe_bests, rand_bests = [], []
        for seed in range(5):
            tpe = TPESampler(self.KEYS, np.random.default_rng(seed), n_startup=8)
            tpe_bests.append(_run(tpe, n, self.KEYS)[0])
            rand_bests.append(_run(np.random.default_rng(seed + 100), n, self.KEYS)[0])
        assert np.mean(tpe_bests) <= np.mean(rand_bests) + 1e-9

    def test_categorical_shifts_toward_winner(self):
        keys = ["aggregation"]
        tpe = TPESampler(keys, np.random.default_rng(3), n_startup=6)
        for _ in range(40):
            cfg = tpe.suggest()
            tpe.observe(cfg, 0.0 if cfg["aggregation"] == "sum" else 1.0)
        wins = sum(tpe.suggest()["aggregation"] == "sum" for _ in range(50))
        assert wins > 25  # > uniform(1/3) by a wide margin

    def test_nonfinite_scores_ignored(self):
        tpe = TPESampler(self.KEYS, np.random.default_rng(4), n_startup=2)
        cfg = tpe.suggest()
        tpe.observe(cfg, float("inf"))
        assert len(tpe.observations) == 0


def test_expand_keywords_groups():
    assert "max_lr" in _expand_keywords(["learning_rate"])
    assert set(_expand_keywords(["all"])) == set(SEARCH_SPACE)
