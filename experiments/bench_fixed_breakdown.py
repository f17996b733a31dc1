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

    def timed(grad_fn, args, label):
        @jax.jit
        def run(args):
            def body(c, _):
                g = grad_fn(*c[1:], c[0])
                # chain the cotangent-ish output back in to serialize iterations
                return (g,) + c[1:], ()

            out, _ = jax.lax.scan(body, args, None, length=N_ITERS)
            return out[0]

        out = run(args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(args)
            float(jnp.sum(out.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f"{label:12s}: {best / N_ITERS * 1e3:.3f} ms", file=sys.stderr)

    # --- featurize: H0 = [V[src]; E] @ W_i, loss = sum(H0 * seed)
    def feat_grad(Wi, seed):
        def loss(Wi):
            VE = jnp.concatenate([gather_src(V, rev, dst), E], axis=1)
            H0 = jax.lax.dot(VE, Wi.astype(dt), preferred_element_type=jnp.float32)
            return jnp.sum(H0 * seed.astype(jnp.float32)) * 1e-6

        return jax.grad(loss)(Wi).astype(jnp.float32) + Wi * 0

    timed(lambda Wi, seed: feat_grad(Wi, seed), (W_i, H), "featurize")

    # --- finalize: M_v = segsum(H); H_v = relu([V; M_v] @ W_o)
    def fin_grad(Hc, _seed):
        def loss(Hc):
            M_v = segment_sum(Hc, dst, n_nodes, sorted=True)
            VM = jnp.concatenate([V, M_v], axis=1)
            H_v = jax.nn.relu(jax.lax.dot(VM, W_o.astype(dt), preferred_element_type=jnp.float32))
            return jnp.sum(H_v) * 1e-6

        return jax.grad(loss)(Hc).astype(dt) + Hc * 0

    timed(lambda Hc, seed: fin_grad(Hc, seed), (H, H), "finalize")

    # --- readout: agg (mean over graphs) -> 2-layer FFN -> masked MSE
    Hv = jax.random.normal(key, (n_nodes, d), jnp.float32) * 0.1

    def head_grad(Hv_, _seed):
        def loss(Hv_):
            ones = jnp.ones((n_nodes, 1), jnp.float32)
            counts = segment_sum(ones, batch_ids, bmg.n_graphs, sorted=False)
            agg = segment_sum(Hv_, batch_ids, bmg.n_graphs, sorted=False) / jnp.maximum(
                counts, 1.0
            )
            out = jax.nn.relu(agg @ f0) @ f1
            m = jnp.isfinite(Y)
            return jnp.sum(jnp.where(m, (out - jnp.nan_to_num(Y)) ** 2, 0.0)) / m.sum()

        return jax.grad(loss)(Hv_) + Hv_ * 0

    timed(lambda Hv_, seed: head_grad(Hv_, seed), (Hv, Hv), "readout")

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
