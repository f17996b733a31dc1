"""Edge-partition halo exchange (ops/edge_partition.py): a graph sharded
across the 8-device CPU mesh must reproduce the single-device message op /
node sums / full depth loop exactly — including the cross-shard boundary
accumulators and cross-cut reverse edges."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from chemprop_tpu.ops.edge_partition import (
    halo_message,
    halo_node_accumulators,
    partition_edges,
    shard_args,
)
from chemprop_tpu.ops.segment import segment_sum

try:  # jax >= 0.8
    from jax import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def shard_map(f, mesh, in_specs, out_specs):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def chain_graph(n_nodes: int, rng: np.random.Generator):
    """A polymer-like chain with random short-range extra bonds, dst-sorted."""
    bonds = [(i, i + 1) for i in range(n_nodes - 1)]
    for _ in range(n_nodes // 10):  # short-range cross-links (bounded bandwidth)
        i = int(rng.integers(0, n_nodes - 4))
        bonds.append((i, i + int(rng.integers(2, 4))))
    pairs = []
    for u, v in bonds:
        pairs.append((u, v))
        pairs.append((v, u))
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    rev = np.arange(len(pairs)).reshape(-1, 2)[:, ::-1].reshape(-1)
    order = np.argsort(dst, kind="stable")
    inv = np.argsort(order)
    return src[order], dst[order], rev[order], inv, order


def _inv_rev(rev, order, inv):
    return inv[rev]


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    n_nodes = 1200
    src, dst, rev, inv, order = chain_graph(n_nodes, rng)
    rev = _inv_rev(rev, order, inv)
    return n_nodes, src, dst, rev


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("shards",))


D = 16


def _run_sharded(mesh, plan, fn, *arrays):
    specs = (P("shards"),) * (len(arrays) + 6)
    out = shard_map(
        fn, mesh, in_specs=specs, out_specs=P("shards")
    )(*arrays, *shard_args(plan))
    return out


class TestHaloMessage:
    @pytest.mark.parametrize("n_shards", [1, 3, 8])
    @pytest.mark.parametrize("single_phase", [False, True])
    def test_matches_single_device(self, graph, mesh, n_shards, single_phase):
        n_nodes, src, dst, rev = graph
        E = len(dst)
        H = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (E, D), jnp.float32)
        )
        want = np.asarray(
            segment_sum(jnp.asarray(H), jnp.asarray(dst), n_nodes, sorted=True)[src]
            - H[rev]
        )

        plan = partition_edges(src, dst, rev, n_nodes, n_shards)
        if single_phase and n_shards > 1 and int(np.asarray(plan.n_owned).min()) < 2 * plan.HN:
            pytest.skip("single-phase halo requires every shard to own >= 2*HN nodes")
        Hs = np.zeros((n_shards, plan.P, D), np.float32)
        cuts = [round(s * E / n_shards) for s in range(n_shards + 1)]
        for s in range(n_shards):
            k = cuts[s + 1] - cuts[s]
            Hs[s, :k] = H[cuts[s] : cuts[s + 1]]

        sub_mesh = Mesh(np.array(jax.devices()[:n_shards]), ("shards",))

        def step(H_loc, src_e, dst_e, rev_e, mask, n_own, n_edg):
            return halo_message(
                H_loc[0],
                src_e[0],
                dst_e[0],
                rev_e[0],
                mask[0],
                n_own[0],
                n_edg[0],
                plan.N,
                plan.HN,
                plan.HE,
                "shards",
                n_shards,
                single_phase=single_phase,
            )[None]

        out = _run_sharded(sub_mesh, plan, step, jnp.asarray(Hs))
        got = np.concatenate(
            [np.asarray(out[s, : cuts[s + 1] - cuts[s]]) for s in range(n_shards)]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_node_sums_match(self, graph, mesh):
        n_nodes, src, dst, rev = graph
        E = len(dst)
        n_shards = 8
        H = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (E, D), jnp.float32))
        want = np.asarray(segment_sum(jnp.asarray(H), jnp.asarray(dst), n_nodes, sorted=True))

        plan = partition_edges(src, dst, rev, n_nodes, n_shards)
        cuts = [round(s * E / n_shards) for s in range(n_shards + 1)]
        Hs = np.zeros((n_shards, plan.P, D), np.float32)
        for s in range(n_shards):
            k = cuts[s + 1] - cuts[s]
            Hs[s, :k] = H[cuts[s] : cuts[s + 1]]

        def step(H_loc, src_e, dst_e, rev_e, mask, n_own, n_edg):
            return halo_node_accumulators(
                H_loc[0], dst_e[0], mask[0], n_own[0], plan.N, plan.HN,
                "shards", n_shards, with_halo=False,
            )[None]

        out = _run_sharded(mesh, plan, step, jnp.asarray(Hs))
        lo = np.asarray(plan.node_lo)
        own = np.asarray(plan.n_owned)
        got = np.concatenate([np.asarray(out[s, : own[s]]) for s in range(n_shards)])
        assert got.shape[0] == n_nodes
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert (lo[1:] == lo[:-1] + own[:-1]).all()

    @pytest.mark.parametrize("single_phase", [False, True])
    def test_depth_loop_matches(self, graph, mesh, single_phase):
        """Three D-MPNN iterations (message + W GEMM + residual ReLU) under
        shard_map equal the single-device loop — the end-to-end halo story,
        on both the two-phase and the overlapped single-phase exchange."""
        n_nodes, src, dst, rev = graph
        E = len(dst)
        n_shards = 8
        key = jax.random.PRNGKey(3)
        H0 = np.asarray(jax.random.normal(key, (E, D), jnp.float32)) * 0.3
        W = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (D, D), jnp.float32)) * 0.2

        def ref():
            H = jnp.maximum(jnp.asarray(H0), 0)
            for _ in range(3):
                M = (
                    segment_sum(H, jnp.asarray(dst), n_nodes, sorted=True)[
                        jnp.asarray(src)
                    ]
                    - H[jnp.asarray(rev)]
                )
                H = jnp.maximum(jnp.asarray(H0) + M @ W, 0)
            return np.asarray(H)

        plan = partition_edges(src, dst, rev, n_nodes, n_shards)
        if single_phase and int(np.asarray(plan.n_owned).min()) < 2 * plan.HN:
            pytest.skip("single-phase halo requires every shard to own >= 2*HN nodes")
        cuts = [round(s * E / n_shards) for s in range(n_shards + 1)]
        H0s = np.zeros((n_shards, plan.P, D), np.float32)
        for s in range(n_shards):
            H0s[s, : cuts[s + 1] - cuts[s]] = H0[cuts[s] : cuts[s + 1]]

        def step(H0_loc, src_e, dst_e, rev_e, mask, n_own, n_edg):
            H0_l = H0_loc[0]
            H = jnp.maximum(H0_l, 0)
            for _ in range(3):
                M = halo_message(
                    H, src_e[0], dst_e[0], rev_e[0], mask[0], n_own[0], n_edg[0],
                    plan.N, plan.HN, plan.HE, "shards", n_shards,
                    single_phase=single_phase,
                )
                H = jnp.maximum(H0_l + M @ W, 0)
            return H[None]

        out = _run_sharded(mesh, plan, step, jnp.asarray(H0s))
        got = np.concatenate(
            [np.asarray(out[s, : cuts[s + 1] - cuts[s]]) for s in range(n_shards)]
        )
        np.testing.assert_allclose(got, ref(), rtol=1e-4, atol=1e-4)


class TestPartitionValidation:
    def test_rejects_unsorted(self):
        with pytest.raises(ValueError, match="dst-sorted"):
            partition_edges(
                np.array([0, 1]), np.array([1, 0]), np.array([1, 0]), 2, 2
            )

    def test_rejects_excessive_bandwidth(self):
        # a star graph: every edge touches node 0 -> src span covers the
        # whole graph, far beyond any neighbor halo
        n = 400
        src = np.array([0] * (n - 1) + list(range(1, n)))
        dst = np.array(list(range(1, n)) + [0] * (n - 1))
        pairs = np.arange(2 * (n - 1)).reshape(2, -1)
        rev = np.concatenate([pairs[1], pairs[0]])
        order = np.argsort(dst, kind="stable")
        inv = np.argsort(order)
        with pytest.raises(ValueError, match="bandwidth|span"):
            partition_edges(src[order], dst[order], inv[rev][order], n, 8)
