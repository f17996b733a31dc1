"""``chemprop-tpu serve`` — a minimal production inference server.

The reference framework stops at batch CLI prediction; serving is listed as
a first-class goal for this framework, so this subcommand exposes a warm,
pre-compiled model behind a stdlib HTTP endpoint (no extra dependencies):

* ``POST /predict``  body ``{"smiles": ["CCO", ...]}`` →
  ``{"preds": [[...], ...], "columns": [...]}`` (ensemble mean over
  ``--model-paths``; invalid SMILES rows come back as ``null`` with an
  ``errors`` map instead of failing the batch);
* ``GET /health`` → ``{"status": "ok", "model": ..., "requests": N}``.

TPU-shaped serving: requests are featurized on host threads, padded to the
SAME bucket ladder as training (``PadSpec``), and dispatched to a jitted
apply — so a handful of compiled programs (warmed at startup for the common
buckets) serve any request size without recompile storms.

Concurrent load COALESCES: requests enqueue their featurized graphs and a
single dispatcher thread drains whatever is pending into ONE padded device
dispatch (up to ``--max-batch`` molecules), then scatters the rows back to
the waiting requests — N small concurrent requests cost ~one dispatch
instead of N serialized ones. An idle server dispatches immediately
(no added latency); ``GET /health`` reports both ``requests`` and
``dispatches`` so the batching ratio is observable.
"""

from __future__ import annotations

import argparse
import json
import logging
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def add_serve_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    parser.add_argument("--model-paths", "--model-path", nargs="+", type=Path, required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=256, help="max molecules per request")
    parser.add_argument(
        "--warmup-buckets", type=int, nargs="+", default=[8, 64],
        help="request sizes to pre-compile at startup",
    )
    parser.add_argument("--keep-h", action="store_true")
    parser.add_argument("--add-h", action="store_true")
    parser.add_argument(
        "--multi-hot-atom-featurizer-mode", default="v2",
        choices=["v1", "v2", "organic", "rigr"],
    )
    return parser


class ModelService:
    """Warm jitted predictor over one or more checkpoints (ensemble mean)."""

    def __init__(self, model_paths, featurizer_mode="v2", keep_h=False, add_h=False):
        import jax

        from chemprop_tpu.models.serialize import load_model

        self.keep_h = keep_h
        self.add_h = add_h
        self.featurizer_mode = featurizer_mode
        self.models = []
        self.output_columns = None
        for p in model_paths:
            model, variables, extra = load_model(p)
            self.models.append((model, variables))
            self.output_columns = extra.get("output_columns") or self.output_columns
        self._apply_fns = [
            jax.jit(
                lambda v, bmg, model=model: model.apply(v, bmg, None, None, is_training=False)
            )
            for model, _ in self.models
        ]
        self.requests = 0
        self.dispatches = 0
        self.max_coalesce = 256
        # after the first request of a batch arrives, linger briefly so
        # concurrent requests pile into the same padded dispatch (the
        # dispatch itself costs ~ms, so a few-ms linger is free under load)
        self.coalesce_linger_s = 0.005
        self._queue: queue.Queue = queue.Queue()
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._dispatcher.start()

    def _featurize(self, smis):
        from chemprop_tpu.data import MoleculeDatapoint
        from chemprop_tpu.featurizers.atom import get_multi_hot_atom_featurizer
        from chemprop_tpu.featurizers.bond import MultiHotBondFeaturizer, RIGRBondFeaturizer
        from chemprop_tpu.featurizers.molgraph.molecule import SimpleMoleculeMolGraphFeaturizer

        atom_f = get_multi_hot_atom_featurizer(self.featurizer_mode)
        bond_f = (
            RIGRBondFeaturizer()
            if self.featurizer_mode == "rigr"
            else MultiHotBondFeaturizer()
        )
        feat = SimpleMoleculeMolGraphFeaturizer(atom_featurizer=atom_f, bond_featurizer=bond_f)
        graphs, errors = [], {}
        for i, smi in enumerate(smis):
            try:
                dp = MoleculeDatapoint.from_smi(
                    smi, keep_h=self.keep_h, add_h=self.add_h, y=np.zeros(1)
                )
                graphs.append(feat(dp.mol))
            except Exception as e:  # noqa: BLE001 — bad SMILES must not 500 the batch
                graphs.append(None)
                errors[i] = str(e)
        return graphs, errors

    def predict(self, smis: list[str]):
        graphs, errors = self._featurize(smis)
        ok = [g for g in graphs if g is not None]
        self.requests += 1
        if not ok:
            return [None] * len(smis), errors
        # enqueue for the coalescing dispatcher and wait for our rows
        item = {"graphs": ok, "event": threading.Event(), "result": None, "error": None}
        self._queue.put(item)
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        mean = item["result"]  # [len(ok), t]
        preds: list = []
        k = 0
        for g in graphs:
            if g is None:
                preds.append(None)
            else:
                preds.append(np.asarray(mean[k], np.float64).reshape(-1).tolist())
                k += 1
        return preds, errors

    def _dispatch_loop(self):
        """Single dispatcher: drain everything pending (up to max_coalesce
        molecules) into ONE padded device dispatch, scatter rows back."""
        from chemprop_tpu.data.collate import PadSpec, batch_mol_graphs

        while True:
            items = [self._queue.get()]
            total = len(items[0]["graphs"])
            deadline = time.monotonic() + self.coalesce_linger_s
            while total < self.max_coalesce:
                try:
                    nxt = self._queue.get(timeout=max(0.0, deadline - time.monotonic()))
                except queue.Empty:
                    break
                items.append(nxt)
                total += len(nxt["graphs"])
            try:
                allg = [g for it in items for g in it["graphs"]]
                # bucket-ladder padding: sizes collapse onto few compiles
                pad = PadSpec.for_graphs(allg, n_graphs=_bucket(len(allg)))
                bmg, _ = batch_mol_graphs(allg, pad, sort_edges=True, return_perm=True)
                self.dispatches += 1
                outs = [
                    np.asarray(fn(v, bmg))
                    for fn, (_, v) in zip(self._apply_fns, self.models)
                ]
                mean = np.mean(np.stack(outs), axis=0)[: len(allg)]
                k = 0
                for it in items:
                    n = len(it["graphs"])
                    it["result"] = mean[k : k + n]
                    k += n
            except Exception as e:  # noqa: BLE001 — fail the requests, not the server
                for it in items:
                    it["error"] = e
            finally:
                for it in items:
                    it["event"].set()


def _bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


def _make_handler(service: ModelService, max_batch: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to logging, not stderr
            logger.debug("serve: " + fmt, *args)

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(
                    200,
                    {
                        "status": "ok",
                        "models": len(service.models),
                        "columns": service.output_columns,
                        "requests": service.requests,
                        "dispatches": service.dispatches,
                    },
                )
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                smis = req.get("smiles")
                if not isinstance(smis, list) or not smis:
                    self._send(400, {"error": "body must be {'smiles': [..]}"})
                    return
                if len(smis) > max_batch:
                    self._send(413, {"error": f"max {max_batch} molecules per request"})
                    return
                preds, errors = service.predict([str(s) for s in smis])
                out = {"preds": preds, "columns": service.output_columns}
                if errors:
                    out["errors"] = {str(k): v for k, v in errors.items()}
                self._send(200, out)
            except Exception as e:  # noqa: BLE001
                logger.exception("predict failed")
                self._send(500, {"error": str(e)})

    return Handler


def make_server(args) -> tuple[ThreadingHTTPServer, ModelService]:
    service = ModelService(
        args.model_paths,
        featurizer_mode=args.multi_hot_atom_featurizer_mode,
        keep_h=args.keep_h,
        add_h=args.add_h,
    )
    # warm the common buckets so first requests don't pay the compile.
    # PadSpec buckets on node/edge totals, not just request size, so warm
    # with a drug-sized molecule mix (the tiny-molecule-only warmup left
    # every realistic node/edge bucket cold — r3 code review) — requests
    # whose totals exceed the warmed buckets still pay one compile each.
    warm = [
        "CC(=O)Oc1ccccc1C(=O)O",                     # aspirin (21 atoms)
        "CN1CCC[C@H]1c1cccnc1",                      # nicotine
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O",                # ibuprofen
        "COc1cc2c(cc1OC)CC[NH+](C)CC2",              # drug-like charged
    ]
    for n in args.warmup_buckets:
        service.predict((warm * ((n // len(warm)) + 1))[:n])
    # socketserver's default accept backlog (request_queue_size=5) resets
    # connections under bursts of >5 concurrent clients — exactly the load
    # the coalescing linger invites. Deepen the listen queue so bursts wait
    # instead of getting ECONNRESET.
    class _Server(ThreadingHTTPServer):
        request_queue_size = 128

    server = _Server((args.host, args.port), _make_handler(service, args.max_batch))
    return server, service


def main(args) -> int:
    server, service = make_server(args)
    logger.info(
        "serving %d model(s) on http://%s:%d (POST /predict, GET /health)",
        len(service.models), *server.server_address,
    )
    print(f"serving on http://{server.server_address[0]}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


class ServeSubcommand:
    COMMAND = "serve"
    HELP = "serve a trained model over HTTP (warm compiled inference)"

    @classmethod
    def add(cls, subparsers) -> argparse.ArgumentParser:
        parser = subparsers.add_parser(cls.COMMAND, help=cls.HELP)
        add_serve_args(parser)
        parser.set_defaults(func=main)
        return parser
