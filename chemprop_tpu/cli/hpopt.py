"""``chemprop-tpu hpopt`` — hyperparameter search (cf. reference
``chemprop/cli/hpopt.py``, which shells out to Ray Tune). This implementation
runs host-level random search over the same search space, training each trial
with the in-repo Trainer and writing ``best_config.json`` for retraining with
``--config-path``."""

from __future__ import annotations

import argparse
import copy
import json
import logging
from pathlib import Path

import numpy as np

from chemprop_tpu.cli.train import add_train_args

logger = logging.getLogger(__name__)

SEARCH_SPACE = {
    "depth": ("int", 2, 6),
    "message_hidden_dim": ("int_step", 200, 800, 100),
    "ffn_hidden_dim": ("int_step", 200, 800, 100),
    "ffn_num_layers": ("int", 1, 3),
    "dropout": ("choice", [0.0, 0.0, 0.05, 0.1, 0.2]),
    "max_lr": ("log", 1e-4, 1e-2),
    "final_lr_ratio": ("log", 1e-2, 1.0),
    "warmup_epochs": ("int", 1, 5),
    "batch_size": ("choice", [16, 32, 64, 128]),
    "aggregation": ("choice", ["mean", "sum", "norm"]),
    "activation": ("choice", ["relu", "leakyrelu", "prelu", "tanh", "elu"]),
}


def add_hpopt_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    add_train_args(parser)
    g = parser.add_argument_group("Hpopt args")
    g.add_argument("--raytune-num-samples", "--num-trials", type=int, default=10, dest="num_trials")
    g.add_argument(
        "--search-algorithm",
        "--raytune-search-algorithm",
        choices=["random", "hyperopt", "optuna"],
        default="hyperopt",
        help="random = independent draws; hyperopt/optuna = sequential TPE "
        "(tree-structured Parzen estimator), the default sampler behind both "
        "reference backends (cli/hpopt.py:70-92) — implemented in-repo, no ray",
    )
    g.add_argument("--hyperopt-random-state-seed", type=int, default=None)
    g.add_argument(
        "--startup-trials",
        "--hyperopt-n-initial-points",
        type=int,
        default=5,
        help="TPE: number of initial random trials before the estimator kicks in",
    )
    g.add_argument(
        "--search-parameter-keywords",
        nargs="+",
        default=["depth", "ffn_num_layers", "dropout", "message_hidden_dim", "ffn_hidden_dim"],
        help=f"subset of: {sorted(SEARCH_SPACE)} or 'all'/'basic'/'learning_rate'",
    )
    g.add_argument("--hpopt-save-dir", type=Path, default=None)
    g.add_argument(
        "--scheduler",
        choices=["fifo", "asha"],
        default="fifo",
        help="fifo = full-budget random search (reference FIFOScheduler); "
        "asha = successive halving: all trials start on a small epoch "
        "budget, the top 1/eta per rung resume (full training state) with "
        "eta x the budget (reference ASHAScheduler)",
    )
    g.add_argument(
        "--asha-eta",
        "--raytune-reduction-factor",
        type=int,
        default=3,
        dest="asha_eta",
        help="ASHA reduction factor (reference --raytune-reduction-factor)",
    )
    g.add_argument(
        "--raytune-trial-scheduler",
        choices=["FIFO", "AsyncHyperBand"],
        default=None,
        help="reference-compatible spelling of --scheduler "
        "(FIFO -> fifo, AsyncHyperBand -> asha); cf. reference cli/hpopt.py:197-201",
    )
    g.add_argument(
        "--raytune-grace-period",
        type=int,
        default=None,
        help="ASHA: minimum epochs a trial runs before it can be halved "
        "(rung-0 budget); cf. reference cli/hpopt.py:224-229",
    )
    # Ray cluster-resource knobs: accepted for CLI compatibility with the
    # reference (cli/hpopt.py:203-240) but inert here — trials run in-process
    # on the local host/chip, so there is no Ray cluster to size.
    for flag in (
        "--raytune-num-workers",
        "--raytune-num-checkpoints-to-keep",
        "--raytune-max-concurrent-trials",
        "--raytune-num-cpus",
        "--raytune-num-gpus",
    ):
        g.add_argument(flag, type=int, default=None, help=argparse.SUPPRESS)
    g.add_argument("--raytune-use-gpu", action="store_true", help=argparse.SUPPRESS)
    g.add_argument("--raytune-temp-dir", default=None, help=argparse.SUPPRESS)
    return parser


def _expand_keywords(keywords: list[str]) -> list[str]:
    out: set[str] = set()
    for kw in keywords:
        match kw:
            case "all":
                out |= set(SEARCH_SPACE)
            case "basic":
                out |= {"depth", "ffn_num_layers", "dropout", "message_hidden_dim", "ffn_hidden_dim"}
            case "learning_rate":
                out |= {"max_lr", "final_lr_ratio", "warmup_epochs"}
            case _:
                if kw not in SEARCH_SPACE:
                    raise ValueError(f"unknown search keyword {kw!r}")
                out.add(kw)
    return sorted(out)


def _sample(rng: np.random.Generator, keys: list[str]) -> dict:
    cfg = {}
    for k in keys:
        spec = SEARCH_SPACE[k]
        match spec[0]:
            case "int":
                cfg[k] = int(rng.integers(spec[1], spec[2] + 1))
            case "int_step":
                cfg[k] = int(rng.choice(np.arange(spec[1], spec[2] + 1, spec[3])))
            case "choice":
                cfg[k] = spec[1][int(rng.integers(len(spec[1])))]
            case "log":
                cfg[k] = float(np.exp(rng.uniform(np.log(spec[1]), np.log(spec[2]))))
    return cfg


class TPESampler:
    """Sequential tree-structured Parzen estimator (Bergstra et al. 2011) —
    the sampler behind both hyperopt and optuna defaults that the reference
    delegates to via Ray Tune (``cli/hpopt.py:70-92``). Observations are split
    into the best ``gamma`` fraction ("good") and the rest; each dimension
    proposes candidates from a KDE over the good values and keeps the one
    maximizing the good/bad density ratio. Pure numpy, deterministic."""

    def __init__(self, keys, rng, n_startup=5, gamma=0.25, n_candidates=24):
        self.keys = keys
        self.rng = rng
        self.n_startup = n_startup
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.observations: list[tuple[dict, float]] = []

    def observe(self, cfg: dict, score: float) -> None:
        if np.isfinite(score):
            self.observations.append((cfg, score))

    def suggest(self) -> dict:
        if len(self.observations) < self.n_startup:
            return _sample(self.rng, self.keys)
        scores = np.array([s for _, s in self.observations])
        n_good = max(1, int(np.ceil(self.gamma * len(scores))))
        order = np.argsort(scores)
        good = [self.observations[i][0] for i in order[:n_good]]
        bad = [self.observations[i][0] for i in order[n_good:]] or good
        return {k: self._suggest_dim(k, good, bad) for k in self.keys}

    # ------------------------------------------------------------ per-dim
    def _suggest_dim(self, key, good, bad):
        spec = SEARCH_SPACE[key]
        kind = spec[0]
        if kind == "choice":
            values = list(spec[1])
            idx = {v: i for i, v in enumerate(dict.fromkeys(values))}
            support = list(idx)
            l = self._cat_probs([idx[c[key]] for c in good], len(support))
            g = self._cat_probs([idx[c[key]] for c in bad], len(support))
            ratio = l / g
            # sample proportional to the density ratio (EI-equivalent for
            # categoricals) rather than argmax, to keep exploring
            p = ratio / ratio.sum()
            return support[int(self.rng.choice(len(support), p=p))]

        log_scale = kind == "log"
        xform = np.log if log_scale else (lambda x: np.asarray(x, dtype=float))
        lo, hi = xform(spec[1]), xform(spec[2])
        gx = xform([c[key] for c in good])
        bx = xform([c[key] for c in bad])
        sigma = max((hi - lo) / max(len(gx), 1), 1e-6 * (hi - lo) + 1e-12)
        cands = np.clip(
            gx[self.rng.integers(len(gx), size=self.n_candidates)]
            + self.rng.normal(0, sigma, self.n_candidates),
            lo,
            hi,
        )
        score = self._kde(cands, gx, sigma) / self._kde(cands, bx, sigma)
        x = float(cands[int(np.argmax(score))])
        if log_scale:
            return float(np.exp(x))
        if kind == "int":
            return int(np.clip(round(x), spec[1], spec[2]))
        # int_step: snap to the grid
        step = spec[3]
        return int(np.clip(round((x - spec[1]) / step) * step + spec[1], spec[1], spec[2]))

    def _cat_probs(self, idxs, k):
        counts = np.bincount(idxs, minlength=k).astype(float) + 1.0  # Laplace
        return counts / counts.sum()

    @staticmethod
    def _kde(x, data, sigma):
        d = (x[:, None] - data[None, :]) / sigma
        return np.exp(-0.5 * d**2).mean(axis=1) / (sigma * np.sqrt(2 * np.pi)) + 1e-12


def _run_trial(args, out_dir, trial: int, cfg: dict, epochs: int, resume: bool) -> float:
    """Train one trial to ``epochs`` total (resuming its full state if
    ``resume``); returns its best validation score (inf on failure)."""
    from chemprop_tpu.cli import train as train_cli

    targs = copy.deepcopy(args)
    for k, v in cfg.items():
        if k == "final_lr_ratio":
            targs.final_lr = v * targs.max_lr
        else:
            setattr(targs, k, v)
    targs.output_dir = out_dir / f"trial_{trial}"
    targs.num_replicates = 1
    targs.ensemble_size = 1
    targs.epochs = epochs
    last = sorted(targs.output_dir.rglob("last.ckpt"))
    if resume and last:
        targs.resume = last[0]
    logger.info(f"trial {trial}: epochs={epochs} resume={resume and bool(last)} {cfg}")
    try:
        train_cli.main(targs)
        with open(sorted(targs.output_dir.rglob("history.json"))[0]) as f:
            history = json.load(f)
        return min(h.get("val_loss", h["train_loss"]) for h in history)
    except Exception as e:
        logger.warning(f"trial {trial} failed: {e}")
        return float("inf")


def main(args) -> int:
    out_dir = args.hpopt_save_dir or (args.output_dir or Path("chemprop_tpu_hpopt"))
    out_dir.mkdir(parents=True, exist_ok=True)
    keys = _expand_keywords(args.search_parameter_keywords)
    seed = getattr(args, "hyperopt_random_state_seed", None)
    rng = np.random.default_rng(args.data_seed if seed is None else seed)
    algo = getattr(args, "search_algorithm", "random")
    sampler = (
        TPESampler(keys, rng, n_startup=getattr(args, "startup_trials", 5))
        if algo in ("hyperopt", "optuna")
        else None
    )
    # ASHA needs its trial population upfront; TPE is sequential, so the
    # scheduler choice picks the config source
    configs = [_sample(rng, keys) for _ in range(args.num_trials)]

    results = []
    best = (np.inf, None, None)

    if getattr(args, "raytune_trial_scheduler", None) is not None:
        args.scheduler = {"FIFO": "fifo", "AsyncHyperBand": "asha"}[args.raytune_trial_scheduler]
    if args.scheduler == "asha":
        # synchronous successive halving: every survivor resumes its full
        # training state (params + Adam moments + LR step) at eta x budget
        eta = max(2, args.asha_eta)
        n_rungs = 0
        while eta ** (n_rungs + 1) <= args.num_trials and args.epochs // eta ** (n_rungs + 1) >= 1:
            n_rungs += 1
        survivors = list(range(args.num_trials))
        budget = max(1, args.epochs // eta**n_rungs)
        grace = getattr(args, "raytune_grace_period", None)
        if grace is not None:
            # reference ASHAScheduler grace_period: floor on the rung-0 budget
            budget = min(args.epochs, max(budget, grace))
        rung = 0
        while True:
            scored = []
            for trial in survivors:
                score = _run_trial(args, out_dir, trial, configs[trial], budget, resume=rung > 0)
                scored.append((score, trial))
                results.append(
                    {"trial": trial, "rung": rung, "epochs": budget,
                     "config": configs[trial], "score": score}
                )
            scored.sort(key=lambda t: t[0])
            if budget >= args.epochs or len(scored) == 1:
                best = (scored[0][0], configs[scored[0][1]], scored[0][1])
                break
            survivors = [t for _, t in scored[: max(1, -(-len(scored) // eta))]]
            budget = min(args.epochs, budget * eta)
            rung += 1
    else:
        for trial in range(args.num_trials):
            cfg = sampler.suggest() if sampler is not None else configs[trial]
            score = _run_trial(args, out_dir, trial, cfg, args.epochs, resume=False)
            if sampler is not None:
                sampler.observe(cfg, score)
            results.append({"trial": trial, "config": cfg, "score": score})
            if score < best[0]:
                best = (score, cfg, trial)

    with open(out_dir / "all_progress.json", "w") as f:
        json.dump(results, f, indent=2)
    best_cfg = dict(best[1] or {})
    if "final_lr_ratio" in best_cfg:
        best_cfg["final_lr"] = best_cfg.pop("final_lr_ratio") * args.max_lr
    with open(out_dir / "best_config.json", "w") as f:
        json.dump(best_cfg, f, indent=2)
    print(json.dumps({"best_trial": best[2], "best_score": best[0], "best_config": best_cfg}))
    return 0


class HpoptSubcommand:
    COMMAND = "hpopt"
    HELP = "hyperparameter optimization (host-level random search)"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_hpopt_args(parser)
        parser.set_defaults(func=main)
        return parser
