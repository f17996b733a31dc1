"""Accuracy parity: full training runs, this framework vs the reference's
math in eager PyTorch, identical data/splits/featurization/hyperparameters.

The north star asks for "RMSE (ESOL-style) and AUC (Tox21-style) parity".
The reference publishes no numbers, so the comparison baseline is the
reference's own training math (D-MPNN + Adam + Noam LR, reference defaults:
d_h=300, depth=3, FFN 1x300, batch 64, 50 epochs, lr 1e-4->1e-3->1e-4)
implemented in eager torch on this host, fed the SAME featurized graphs and
the SAME seeded 80/10/10 split.

Round-4 A/B attribution (VERDICT r3 item 2): the r3 deficit (ours lost RMSE
on all 3 seeds) had two untested named suspects —

* init law: torch ``nn.Linear`` uses kaiming-uniform(a=sqrt(5)) weights +
  uniform(+-1/sqrt(fan_in)) biases; flax defaults are lecun_normal + zeros
  (3x the weight variance, zero biases). ``ours_init`` arms run both
  (``Trainer(param_init=...)``).
* partial-batch policy: the r3 torch baseline dropped the last partial batch
  (64 of 80 train molecules per epoch, 1 step/epoch); the actual reference
  keeps it (``drop_last=False`` unless the tail is a single sample,
  ``/root/reference/chemprop/data/dataloader.py:77-85``) as do we. The
  faithful baseline keeps it; the r3 behavior is retained as an arm.

Round-5 statistical power (VERDICT r4 weak #5 / next #6): the r4 claim
rested on the 100-molecule lipo set (10-molecule test splits, seed std
0.21 vs a claimed delta of 0.011). r5 runs PAIRED-BY-SEED on the two
largest in-env corpora — the 500-row ESOL set (``regression/bounded.csv``
logSolubility, bound markers stripped; the north star names ESOL and this
IS Delaney's data) and the 500-row Tox21-style NR-AhR classification set —
with 10 seeds, and reports the 95% t-CI of the per-seed DIFFERENCE
(ours − reference), which is the quantity parity claims are about.

Writes ACCURACY_r05.json at the repo root.

Run: python experiments/accuracy_parity.py
(ACCURACY_AB=1 re-enables the r4 attribution arms: torch init law and
drop-partial-batch; ACCURACY_SEEDS=N overrides the seed count.)
"""

from __future__ import annotations

import csv
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import enable_compile_cache  # noqa: E402

REPO = Path(__file__).parent.parent
EPOCHS = 50
BATCH = 64
D_H = 300
N_SEEDS = int(os.environ.get("ACCURACY_SEEDS", 10))
AB_ARMS = os.environ.get("ACCURACY_AB", "0") == "1"


def load_csv(path, target_col):
    rows = list(csv.DictReader(open(path)))
    smis = [r["smiles"] for r in rows]
    ys = np.array(
        [[float(r[target_col]) if r[target_col] not in ("", None) else np.nan] for r in rows]
    )
    return smis, ys


def split(n, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_tr, n_va = int(0.8 * n), int(0.1 * n)
    return idx[:n_tr], idx[n_tr : n_tr + n_va], idx[n_tr + n_va :]


def featurize(smis):
    from chemprop_tpu.data import MoleculeDatapoint
    from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer

    feat = SimpleMoleculeMolGraphFeaturizer()
    return [feat(MoleculeDatapoint.from_smi(s, y=np.zeros(1)).mol) for s in smis]


class _OursRunner:
    """One model + trainer per task, reused across seeds/arms so the jitted
    train step compiles once (Trainer caches its jits across refits)."""

    def __init__(self, mgs, ys, task):
        import jax.numpy as jnp

        from chemprop_tpu.data.collate import PadSpec
        from chemprop_tpu.models import MPNN
        from chemprop_tpu.nn import (
            BinaryClassificationFFN,
            BondMessagePassing,
            MeanAggregation,
            RegressionFFN,
        )
        from chemprop_tpu.train import Trainer

        self.mgs, self.ys, self.task = mgs, ys, task
        predictor = RegressionFFN() if task == "regression" else BinaryClassificationFFN()
        self.model = MPNN(
            message_passing=BondMessagePassing(compute_dtype=jnp.bfloat16),
            agg=MeanAggregation(),
            predictor=predictor,
            batch_norm=False,
        )
        self.trainer = Trainer(self.model, max_epochs=EPOCHS, seed=0)
        # one dataset-wide pad spec -> one compiled shape for every batch
        self.pad = PadSpec.for_graphs(mgs, n_graphs=BATCH)

    def run(self, tr, te, seed=0, param_init="lecun"):
        from chemprop_tpu.data import DataLoader
        from chemprop_tpu.data.datasets import Datum

        mgs, ys = self.mgs, self.ys

        class GraphDS:
            def __init__(self, idxs, scale=None):
                self.idxs = list(idxs)
                self.scale = scale

            def __len__(self):
                return len(self.idxs)

            def __getitem__(self, k):
                i = self.idxs[k]
                y = ys[i]
                if self.scale is not None:
                    y = (y - self.scale[0]) / self.scale[1]
                return Datum(mgs[i], None, None, y, 1.0, None, None)

            @property
            def Y(self):
                return ys[self.idxs]

        scale = None
        if self.task == "regression":
            scale = (ys[tr].mean(0), ys[tr].std(0))
        t = self.trainer
        t.seed, t.param_init = seed, param_init
        t.state, t.best_variables, t.history = None, None, []
        loader = DataLoader(
            GraphDS(tr, scale), batch_size=BATCH, shuffle=True, seed=seed, pad_spec=self.pad
        )
        t.fit(loader)
        test_loader = DataLoader(GraphDS(te), batch_size=BATCH, pad_spec=self.pad)
        preds = t.predict(test_loader)[: len(te)]
        preds = np.asarray(preds, np.float64).reshape(len(te), -1)
        if self.task == "regression":
            preds = preds * scale[1] + scale[0]
        return preds


def train_torch_reference(mgs, ys, tr, te, task, seed=0, drop_partial=False):
    """The reference's training math in eager torch (base.py + model.py +
    schedulers.py semantics) on the same graphs/split. ``drop_partial=False``
    is the faithful setting (reference ``data/dataloader.py:77-85`` keeps the
    partial tail batch); ``True`` reproduces the r3 baseline."""
    import torch

    torch.manual_seed(seed)

    def to_batch(idxs):
        Vs, Es, srcs, dsts, revs, bat = [], [], [], [], [], []
        v = e = 0
        for gi, i in enumerate(idxs):
            mg = mgs[i]
            Vs.append(torch.tensor(np.asarray(mg.V, np.float32)))
            Es.append(torch.tensor(np.asarray(mg.E, np.float32)))
            srcs.append(torch.tensor(mg.edge_index[0].astype(np.int64)) + v)
            dsts.append(torch.tensor(mg.edge_index[1].astype(np.int64)) + v)
            revs.append(torch.tensor(mg.rev_edge_index.astype(np.int64)) + e)
            bat.extend([gi] * mg.V.shape[0])
            v += mg.V.shape[0]
            e += mg.E.shape[0]
        return (
            torch.cat(Vs), torch.cat(Es), torch.cat(srcs), torch.cat(dsts),
            torch.cat(revs), torch.tensor(bat), len(idxs),
        )

    d_v, d_e = mgs[0].V.shape[1], mgs[0].E.shape[1]
    W_i = torch.nn.Linear(d_v + d_e, D_H, bias=False)
    W_h = torch.nn.Linear(D_H, D_H, bias=False)
    W_o = torch.nn.Linear(d_v + D_H, D_H)
    f0 = torch.nn.Linear(D_H, D_H)
    f1 = torch.nn.Linear(D_H, 1)
    params = [*W_i.parameters(), *W_h.parameters(), *W_o.parameters(),
              *f0.parameters(), *f1.parameters()]
    opt = torch.optim.Adam(params, 1e-4)

    mu = sd = None
    ys_t = torch.tensor(ys, dtype=torch.float32)
    if task == "regression":
        mu = ys_t[tr].mean(0)
        sd = ys_t[tr].std(0)

    def forward(idxs):
        V, E, src, dst, rev, bat, ng = to_batch(idxs)
        nv = V.shape[0]
        H0 = W_i(torch.cat([V[src], E], 1))
        H = torch.relu(H0)
        for _ in range(1, 3):
            M = torch.zeros(nv, D_H).index_add_(0, dst, H)[src] - H[rev]
            H = torch.relu(H0 + W_h(M))
        Mv = torch.zeros(nv, D_H).index_add_(0, dst, H)
        Hv = torch.relu(W_o(torch.cat([V, Mv], 1)))
        counts = torch.zeros(ng).index_add_(0, bat, torch.ones(nv))
        agg = torch.zeros(ng, D_H).index_add_(0, bat, Hv) / counts[:, None]
        return f1(torch.relu(f0(agg)))

    # reference Noam-like schedule (schedulers.py:5-65); steps_per_epoch
    # matches the loader's batch count under the chosen tail policy
    if drop_partial:
        steps_per_epoch = max(1, len(tr) // BATCH)
    else:
        steps_per_epoch = -(-len(tr) // BATCH)
    warmup = 2 * steps_per_epoch
    total = EPOCHS * steps_per_epoch
    init_lr, max_lr, final_lr = 1e-4, 1e-3, 1e-4

    def lr_at(step):
        if step < warmup:
            return init_lr + (max_lr - init_lr) * step / warmup
        frac = (step - warmup) / max(1, total - warmup)
        return max_lr * (final_lr / max_lr) ** frac

    rng = np.random.default_rng(seed)
    step = 0
    stop = (len(tr) - BATCH + 1) if drop_partial else len(tr)
    for _ in range(EPOCHS):
        order = rng.permutation(len(tr))
        for k in range(0, stop, BATCH):
            idxs = tr[order[k : k + BATCH]]
            for g in opt.param_groups:
                g["lr"] = lr_at(step)
            opt.zero_grad()
            out = forward(idxs)
            y = ys_t[idxs]
            if task == "regression":
                loss = torch.mean(((out - (y - mu) / sd)) ** 2)
            else:
                loss = torch.nn.functional.binary_cross_entropy_with_logits(out, y)
            loss.backward()
            opt.step()
            step += 1
    with torch.no_grad():
        out = forward(te)
        if task == "regression":
            out = out * sd + mu
        else:
            out = torch.sigmoid(out)
    return out.numpy()


def rmse(p, y):
    return float(np.sqrt(np.mean((p.reshape(-1) - y.reshape(-1)) ** 2)))


def auc(p, y):
    p, y = p.reshape(-1), y.reshape(-1)
    order = np.argsort(p)
    ranks = np.empty(len(p))
    ranks[order] = np.arange(1, len(p) + 1)
    pos = y > 0.5
    n1, n0 = pos.sum(), (~pos).sum()
    return float((ranks[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0))


def _t975(df: int) -> float:
    """Two-sided 97.5% t quantile for the paired CI — exact for any df
    (the normal-quantile 1.96 fallback was anti-conservative for df
    outside a hardcoded table; code-review r5 finding)."""
    from scipy.stats import t as t_dist

    return float(t_dist.ppf(0.975, df))


def paired_ci(diffs: list[float]) -> dict:
    """Mean per-seed difference with its 95% t-CI (the parity quantity)."""
    d = np.asarray(diffs, np.float64)
    n = len(d)
    mean = float(d.mean())
    sd = float(d.std(ddof=1)) if n > 1 else float("nan")
    t = _t975(n - 1) if n > 1 else float("nan")
    half = t * sd / np.sqrt(n) if n > 1 else float("nan")
    return {
        "mean_diff": round(mean, 4),
        "sd_diff": round(sd, 4),
        "ci95": [round(mean - half, 4), round(mean + half, 4)],
        "contains_zero": bool(mean - half <= 0.0 <= mean + half),
    }


def run_task(name, smis, ys, task, metric_fn, metric_name, results):
    mgs = featurize(smis)
    ours = _OursRunner(mgs, ys, task)
    per_seed = []
    arms = {"ours_lecun": [], "reference_math": []}
    if AB_ARMS:
        arms.update({"ours_torch_init": [], "reference_math_drop_partial": []})
    t_ours = t_ref = 0.0
    for seed in range(N_SEEDS):
        tr, va, te = split(len(smis), seed=seed)
        y_te = ys[te]
        row = {"seed": seed}
        t0 = time.time()
        row["ours_lecun"] = round(metric_fn(ours.run(tr, te, seed, "lecun"), y_te), 4)
        if AB_ARMS:
            row["ours_torch_init"] = round(metric_fn(ours.run(tr, te, seed, "torch"), y_te), 4)
        t_ours += time.time() - t0
        t0 = time.time()
        row["reference_math"] = round(
            metric_fn(train_torch_reference(mgs, ys, tr, te, task, seed), y_te), 4
        )
        t_ref += time.time() - t0
        if AB_ARMS:
            row["reference_math_drop_partial"] = round(
                metric_fn(
                    train_torch_reference(mgs, ys, tr, te, task, seed, drop_partial=True), y_te
                ),
                4,
            )
        for k in arms:
            arms[k].append(row[k])
        per_seed.append(row)
        print(f"[{name}] {row}", flush=True)
    diffs = [a - b for a, b in zip(arms["ours_lecun"], arms["reference_math"])]
    results[name] = {
        "metric": metric_name,
        "n_test_per_seed": len(split(len(smis), 0)[2]),
        "per_seed": per_seed,
        "means": {k: round(float(np.mean(v)), 4) for k, v in arms.items()},
        "stds": {k: round(float(np.std(v)), 4) for k, v in arms.items()},
        # the parity claim itself: paired per-seed difference ours - reference
        "paired_diff_ours_minus_reference": paired_ci(diffs),
        "ours_train_s_total": round(t_ours, 1),
        "reference_train_s_total": round(t_ref, 1),
    }


def load_esol():
    """The 500-row ESOL (Delaney) set: ``regression/bounded.csv`` carries
    logSolubility values with synthetic inequality markers on 100 rows;
    stripping the markers recovers the plain numeric ESOL target (the
    north star's named regression dataset)."""
    rows = list(csv.DictReader(open(REPO / "tests/data/regression/bounded.csv")))
    smis = [r["smiles"] for r in rows]
    ys = np.array([[float(r["logSolubility"].lstrip("<>"))] for r in rows])
    return smis, ys


def main():
    enable_compile_cache()
    results = {}

    # regression, primary: 500-row ESOL (the north star's named dataset) —
    # 50-molecule test splits give the paired comparison real power
    smis, ys = load_esol()
    run_task("regression_esol", smis, ys, "regression", rmse, "rmse", results)

    # classification: 500-row Tox21-style NR-AhR
    smis, ys = load_csv(REPO / "tests/data/classification/mol.csv", "NR-AhR")
    keep = [i for i, row in enumerate(ys) if np.isfinite(row).all()]
    smis = [smis[i] for i in keep]
    ys = ys[keep]
    run_task("classification_nr_ahr", smis, ys, "classification", auc, "auc", results)

    # regression, continuity with r3/r4: 100-row lipophilicity
    smis, ys = load_csv(REPO / "tests/data/regression/mol/mol.csv", "lipo")
    run_task("regression_lipo", smis, ys, "regression", rmse, "rmse", results)

    results["config"] = {
        "epochs": EPOCHS, "batch": BATCH, "d_h": D_H, "depth": 3, "n_seeds": N_SEEDS,
        "split": "seeded 80/10/10", "ours_precision": "bf16 compute / f32 params",
        "reference": "eager torch f32, reference defaults (Adam + Noam 1e-4->1e-3->1e-4)",
        "arms": {
            "ours_lecun": "flax default init (lecun_normal weights, zero biases)",
            "reference_math": "faithful: keeps the partial tail batch (reference drop_last=False)",
        },
        "esol_note": (
            "regression_esol IS the north star's named dataset: "
            "tests/data/regression/bounded.csv is the 500-row Delaney ESOL set "
            "with synthetic bound markers stripped (r3/r4 substituted the "
            "100-row lipo set, kept here as regression_lipo for continuity)"
        ),
        "paired_analysis": (
            "paired_diff_ours_minus_reference: same split seed on both arms; "
            "95% t-CI of the mean per-seed difference (df = n_seeds-1)"
        ),
    }
    out = REPO / "ACCURACY_r05.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
