"""Fine-grained surgery on the depth=0 'fixed cost' of the train step.

bench_step_breakdown.py isolates per-depth iteration cost (2.08 ms) vs the
fixed remainder (3.53 ms on the 123k-edge batch). This times the pieces of
the fixed part separately, each as a jitted fwd+bwd closure over the real
benchmark batch:

  featurize : H0 = W_i([V[src]; E])                (+ backward)
  finalize  : M_v = segsum(H); H_v = relu(W_o([V; M_v]))   (+ backward)
  readout   : agg -> FFN -> masked MSE             (+ backward)
  adam      : one optax.adam update on flagship-sized params

Run on the real TPU: python experiments/bench_fixed_breakdown.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import build_batch, enable_compile_cache  # noqa: E402

N_ITERS = 100


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from chemprop_tpu.ops.gather import gather_src
    from chemprop_tpu.ops.segment import segment_sum

    batch, n_real_edges = build_batch()
    bmg = batch.bmg
    E_pad = bmg.edge_index.shape[1]
    n_nodes = bmg.V.shape[0]
    d = 384
    dt = jnp.bfloat16
    print(f"edges={E_pad} nodes={n_nodes} graphs={bmg.n_graphs}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    V = jnp.asarray(bmg.V, dt)
    E = jnp.asarray(bmg.E, dt)
    src, dst, rev = (jnp.asarray(x) for x in (bmg.src, bmg.dst, bmg.rev))
    H = jax.random.normal(key, (E_pad, d), dt) * 0.1
    W_i = jax.random.normal(key, (V.shape[1] + E.shape[1], d), jnp.float32) * 0.05
    W_o = jax.random.normal(key, (V.shape[1] + d, d), jnp.float32) * 0.05
    batch_ids = jnp.asarray(bmg.batch)
    Y = jnp.asarray(batch.Y)
    f0 = jax.random.normal(key, (d, 300), jnp.float32) * 0.05
    f1 = jax.random.normal(key, (300, 1), jnp.float32) * 0.05

    def timed(fn, x0, label):
        """fn: x -> same-shape x (grad chained through the carry)."""

        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x, None, length=N_ITERS)
            return out

        out = run(x0)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x0)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:12s}: {best / N_ITERS * 1e3:.3f} ms", file=sys.stderr)

    # --- featurize: H0 = [V[src]; E] @ W_i (fwd+bwd, chained on W_i)
    def feat_grad(Wi):
        def loss(Wi):
            VE = jnp.concatenate([gather_src(V, rev, dst), E], axis=1)
            H0 = jax.lax.dot(VE, Wi.astype(dt), preferred_element_type=jnp.float32)
            return jnp.sum(H0) * 1e-6

        return jax.grad(loss)(Wi) * 0.999 + W_i * 1e-3

    timed(feat_grad, W_i, "featurize")

    # --- finalize: M_v = segsum(H); H_v = relu([V; M_v] @ W_o) (chained on H)
    def fin_grad(Hc):
        def loss(Hc):
            M_v = segment_sum(Hc, dst, n_nodes, sorted=True)
            VM = jnp.concatenate([V, M_v], axis=1)
            H_v = jax.nn.relu(jax.lax.dot(VM, W_o.astype(dt), preferred_element_type=jnp.float32))
            return jnp.sum(H_v) * 1e-6

        return jax.grad(loss)(Hc).astype(dt) * 0.999 + H * 1e-3

    timed(fin_grad, H, "finalize")

    # --- readout: agg (mean over graphs) -> 2-layer FFN -> masked MSE
    Hv = jax.random.normal(key, (n_nodes, d), jnp.float32) * 0.1

    def head_grad(Hv_):
        def loss(Hv_):
            ones = jnp.ones((n_nodes, 1), jnp.float32)
            counts = segment_sum(ones, batch_ids, bmg.n_graphs, sorted=False)
            agg = segment_sum(Hv_, batch_ids, bmg.n_graphs, sorted=False) / jnp.maximum(
                counts, 1.0
            )
            out = jax.nn.relu(agg @ f0) @ f1
            m = jnp.isfinite(Y)
            return jnp.sum(jnp.where(m, (out - jnp.nan_to_num(Y)) ** 2, 0.0)) / m.sum()

        return jax.grad(loss)(Hv_) * 0.999 + Hv * 1e-3

    timed(head_grad, Hv, "readout")

    # --- adam update on flagship-sized params
    params = {
        "W_i": W_i, "W_h": jax.random.normal(key, (d, d), jnp.float32),
        "W_o": W_o, "f0": f0, "f1": f1,
    }
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def adam_run(params, opt_state):
        def body(c, _):
            p, s = c
            g = jax.tree.map(lambda x: x * 1e-4, p)
            u, s = tx.update(g, s, p)
            return (optax.apply_updates(p, u), s), ()

        out, _ = jax.lax.scan(body, (params, opt_state), None, length=N_ITERS)
        return out

    out = adam_run(params, opt_state)
    float(jnp.sum(out[0]["W_h"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = adam_run(params, opt_state)
        float(jnp.sum(out[0]["W_h"]))
        best = min(best, time.perf_counter() - t0)
    print(f"{'adam':12s}: {best / N_ITERS * 1e3:.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
