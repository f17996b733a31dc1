"""Serve a trained model over HTTP and query it: the ``serve`` subcommand
coalesces concurrent requests into single padded device dispatches. (No
reference-notebook counterpart — serving is a capability this framework
adds; see docs/predicting.md.)

Run: python examples/serving.py
"""

import json
import threading
import urllib.request
from types import SimpleNamespace

from _common import DATA, out_dir, run_cli


def main():
    out = out_dir("serving")
    run_cli([
        "train", "-i", DATA / "regression" / "mol" / "mol.csv",
        "--epochs", "2", "--batch-size", "64", "-o", out,
    ])

    from chemprop_tpu.cli.serve import make_server

    args = SimpleNamespace(
        model_paths=[next(out.rglob("best.ckpt"))],
        host="127.0.0.1", port=0, max_batch=64, warmup_buckets=[4],
        keep_h=False, add_h=False, multi_hot_atom_featurizer_mode="v2",
    )
    server, service = make_server(args)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"

    req = urllib.request.Request(
        url + "/predict",
        data=json.dumps({"smiles": ["CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O"]}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        body = json.loads(r.read())
    print("served predictions:", body["preds"])
    server.shutdown()
    server.server_close()
    assert len(body["preds"]) == 3


if __name__ == "__main__":
    main()
