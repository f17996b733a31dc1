"""On-device micro-benchmark: the tall-skinny weight-gradient contraction
``dW = Xᵀ @ G`` ([E, dx]ᵀ @ [E, dg] with E ~ 123k) — XLA's windowed emitter
vs the Pallas streaming reduction kernel at several row-block sizes.

Run on the real TPU:  python experiments/bench_grad_weight.py
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from bench import enable_compile_cache  # noqa: E402

N_ITERS = int(os.environ.get("GW_BENCH_ITERS", 200))
E = int(os.environ.get("GW_BENCH_E", 122880))


def main():
    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from chemprop_tpu.ops import grad_weight as gw

    def timed(fn, *args):
        @jax.jit
        def run(*args):
            def body(c, _):
                # chain: fold the previous dW back into X so iterations serialize
                x, g = c
                out = fn(x, g)
                x = x + out[:1, :1].astype(x.dtype) * 0
                return (x, g), ()

            (x, g), _ = jax.lax.scan(body, args, (), length=N_ITERS)
            return x[0, 0]

        v = run(*args)
        float(v)
        t0 = time.perf_counter()
        v = run(*args)
        float(v)
        return (time.perf_counter() - t0) / N_ITERS * 1e3

    for dx, dg in [(384, 384), (128, 384)]:
        X = jax.random.normal(jax.random.PRNGKey(0), (E, dx), jnp.bfloat16) * 0.1
        G = jax.random.normal(jax.random.PRNGKey(1), (E, dg), jnp.bfloat16) * 0.1

        def xla(x, g):
            return jax.lax.dot_general(
                x, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

        t_xla = timed(xla, X, G)
        flops_ms = 2 * E * dx * dg / 197e12 * 1e3
        bytes_ms = E * (dx + dg) * 2 / 819e9 * 1e3
        print(f"[{E}x{dx}]T @ [{E}x{dg}]  bound: flops {flops_ms:.3f} ms, hbm {bytes_ms:.3f} ms")
        print(f"  xla: {t_xla:.3f} ms")
        for br in (512, 1024, 2048):
            gw.BLOCK_ROWS = br
            if not gw.grad_weight_usable(X, G):
                print(f"  pallas block={br}: not usable")
                continue
            t = timed(gw.grad_weight, X, G)
            print(f"  pallas block={br}: {t:.3f} ms")
        gw.BLOCK_ROWS = 512


if __name__ == "__main__":
    main()
