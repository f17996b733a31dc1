"""On-device micro-benchmark: backward-pass variants of the fused D-MPNN
iteration kernel on the standard 123k-edge benchmark batch.

Run on the real TPU:  python experiments/bench_bwd_variants.py
Compares, per depth iteration:
  composed   — gz elementwise + transposed message kernel + 2 XLA GEMMs
  fused      — the all-in-one _iter_bwd_impl kernel (in-place-masked rings)

axon-platform timing rules (see bench.py): block_until_ready is not a
reliable sync and per-call dispatch costs ~1 ms, so each measurement runs N
device-side chained iterations inside one jitted lax.scan and ends with a
scalar fetch.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch, enable_compile_cache  # noqa: E402

N_ITERS = int(os.environ.get("BWD_BENCH_ITERS", 200))


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from chemprop_tpu.ops import fused_message as fm

    batch, n_real_edges = build_batch()
    bmg = batch.bmg
    E = bmg.edge_index.shape[1]
    d = 384
    print(f"edges (padded) = {E}, real = {n_real_edges}, d = {d}", file=sys.stderr)

    H = jax.random.normal(jax.random.PRNGKey(0), (E, d), jnp.bfloat16) * 0.1
    H0 = jax.random.normal(jax.random.PRNGKey(1), (E, d), jnp.bfloat16) * 0.1
    W = jax.random.normal(jax.random.PRNGKey(2), (d, d), jnp.bfloat16) * 0.05
    src = jnp.asarray(bmg.edge_index[0])
    dst = jnp.asarray(bmg.edge_index[1])
    rev = jnp.asarray(bmg.rev)
    n_nodes = int(bmg.V.shape[0])

    def it(H):
        return fm.fused_message_iter(H, H0, W, None, src, dst, rev, n_nodes, 2)

    def loss(H):
        return jnp.sum(it(H).astype(jnp.float32)) * 1e-6

    def timed(fn, x):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x, None, length=N_ITERS)
            return out

        out = run(x)
        float(jnp.sum(out.astype(jnp.float32)))  # reliable sync on axon
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        return best / N_ITERS * 1e3  # ms per iteration

    print(f"iter fwd:                 {timed(it, H):.3f} ms", file=sys.stderr)

    g1 = jax.grad(loss)
    for flag, name in (("0", "composed"), ("1", "fused")):
        os.environ["CHEMPROP_TPU_FUSED_BWD"] = flag
        jax.clear_caches()
        t = timed(lambda x: g1(x).astype(jnp.bfloat16) + x * 0, H)
        print(f"iter fwd+bwd ({name:8s}): {t:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
