#!/usr/bin/env python
"""100M-item row-sharded search at the BASELINE north-star scale (CPU mesh).

BASELINE.md target #3 names a row-sharded 100M-item index across a pod
slice; docs/DESIGN.md does the per-chip memory math (mp=8 v5e: int8 rows
fit with headroom). This script *executes* that configuration: a synthetic
100M-node fixed-degree graph + packed-int8 embedding rows, row-sharded over
an 8-device "mp" mesh (virtual CPU devices — the same mechanism the driver's
dryrun uses), searched by `make_distributed_searcher` with the production
ListBackend defaults.

Honesty notes:
  * the graph is RANDOM (no HNSW build at 100M on this 4-core host), so
    recall is meaningless here; this is an execution/memory/correctness
    proof at target scale, not a quality or perf claim — CPU timings are
    reported only to show the run is real.
  * correctness is anchored two ways: (a) a verify pass at --verify-items
    asserts the sharded program is bit-exact vs the local searcher on the
    same synthetic-graph construction, (b) the 100M results are checked for
    structural invariants (valid unique ids, finite monotone scores).

Reference context: the reference has no multi-host/sharded serving at all
(SURVEY.md §2.6); its scale story ends at one GPU's memory.

Usage: python scripts/scale_100m_sim.py [--items 100000000] [--shards 8]
"""

import argparse
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"   # explicitly a host-mesh simulation
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "jax" in sys.modules:
    # The axon sitecustomize imports jax at interpreter startup; platform
    # selection happens at first backend use (tests/conftest.py does the same)
    import jax
    jax.config.update("jax_platforms", "cpu")


def _ensure_host_devices(n: int):
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()


def synth_graph_index(n: int, n_ep: int, deg0: int, deg1: int, seed: int,
                      item_emb_dim: int):
    """Synthetic fixed-degree random graph + packed int8 rows, numpy-side.

    Embedding rows are generated directly in the packed layout of
    index/quantize.pack_quantized (int8 values + fp32 scale bytes) to avoid
    a 25 GB fp32 intermediate at n=100M.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    t0 = time.time()
    packed = np.empty((n, item_emb_dim + 4), np.int8)
    chunk = 8_000_000
    scale = np.full(chunk, np.float32(1.0 / 127.0))
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        packed[lo:hi, :item_emb_dim] = rng.integers(
            -127, 127, (hi - lo, item_emb_dim), dtype=np.int8, endpoint=True)
        packed[lo:hi, item_emb_dim:] = \
            scale[:hi - lo].view(np.int8).reshape(hi - lo, 4)
    print(f"# embeddings int8 [{n}, {item_emb_dim}+4] "
          f"({packed.nbytes / 2**30:.1f} GiB) in {time.time() - t0:.0f}s",
          flush=True)

    t0 = time.time()
    neighbors = {0: rng.integers(0, n, (n, deg0), dtype=np.int32),
                 1: rng.integers(0, n, (n, deg1), dtype=np.int32)}
    print(f"# neighbors deg {deg0}/{deg1} "
          f"({sum(v.nbytes for v in neighbors.values()) / 2**30:.1f} GiB) "
          f"in {time.time() - t0:.0f}s", flush=True)

    enter = np.unique(rng.integers(0, n, 2 * n_ep))
    enter = enter[rng.permutation(len(enter))[:n_ep]].astype(np.int32)
    item_ids = np.arange(1, n + 1, dtype=np.int32)
    return packed, item_ids, enter, neighbors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=100_000_000)
    ap.add_argument("--verify-items", type=int, default=1_000_000,
                    help="size of the sharded==local bit-exactness pass "
                         "(0 skips)")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--enter-points", type=int, default=3072,
                    help="~n/M^3 at n=100M, M=32 (HNSW level-3+ node count)")
    args = ap.parse_args()
    _ensure_host_devices(args.shards)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from nann_tpu.config import ModelConfig, SearchConfig
    from nann_tpu.models.scorer import init_scorer
    from nann_tpu.search.beam import SearchIndex, make_searcher
    from nann_tpu.search.distributed import make_distributed_searcher, \
        shard_index

    assert len(jax.devices()) >= args.shards, jax.devices()
    mesh = Mesh(np.array(jax.devices()[:args.shards]), ("mp",))
    scfg = SearchConfig()
    level_topn = jnp.asarray([100, 200, 400, 400, 400, 200], jnp.int32)
    rng = np.random.default_rng(7)

    def make_sharded(n, n_ep):
        mcfg = ModelConfig(num_item=n, num_cate=1000, emb_dim=32,
                           max_seq_length=50, compute_dtype="bfloat16")
        params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
        packed, ids, enter, neigh = synth_graph_index(
            n, n_ep, 64, 32, seed=3, item_emb_dim=mcfg.item_emb_dim)
        host_idx = SearchIndex(item_embs=packed, item_ids=ids,
                               enter_points=enter, neighbors=neigh)
        t0 = time.time()
        sidx = shard_index(mesh, host_idx)
        jax.block_until_ready(sidx.item_embs)
        gib = sum(np.prod(v.shape) * v.dtype.itemsize for v in
                  jax.tree_util.tree_leaves(sidx)) / 2**30
        print(f"# sharded placement: {gib:.1f} GiB total, "
              f"{gib / args.shards:.2f} GiB/shard in {time.time() - t0:.0f}s",
              flush=True)
        search = make_distributed_searcher(mcfg, scfg, mesh,
                                           batch=args.batch)
        return mcfg, params, state, host_idx, sidx, jax.jit(search), gib

    users = None

    if args.verify_items:
        n = args.verify_items
        assert n % args.shards == 0
        mcfg, params, state, host_idx, sidx, dsearch, _ = make_sharded(
            n, max(64, args.enter_points * n // args.items))
        users = jnp.asarray(rng.standard_normal(
            (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)),
            jnp.float32)
        local = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                                 in_axes=(None, None, None, 0, None)))
        lidx = SearchIndex(
            item_embs=jnp.asarray(host_idx.item_embs),
            item_ids=jnp.asarray(host_idx.item_ids),
            enter_points=jnp.asarray(host_idx.enter_points),
            neighbors={l: jnp.asarray(v)
                       for l, v in host_idx.neighbors.items()})
        ids_l, sc_l, nsc_l = jax.block_until_ready(
            local(params, state, lidx, users, level_topn))
        ids_d, sc_d, nsc_d = jax.block_until_ready(
            dsearch(params, state, sidx, users, level_topn))
        np.testing.assert_array_equal(np.asarray(ids_l), np.asarray(ids_d))
        np.testing.assert_array_equal(np.asarray(sc_l), np.asarray(sc_d))
        np.testing.assert_array_equal(np.asarray(nsc_l), np.asarray(nsc_d))
        print(f"# verify@{n}: sharded == local bit-exact "
              f"({np.asarray(nsc_d).mean():.0f} scored/query)", flush=True)
        del host_idx, sidx, lidx, dsearch

    n = args.items
    assert n % args.shards == 0
    mcfg, params, state, host_idx, sidx, dsearch, gib = make_sharded(
        n, args.enter_points)
    del host_idx  # free the numpy copies; the sharded placement stays
    if users is None:
        users = jnp.asarray(rng.standard_normal(
            (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)),
            jnp.float32)

    t0 = time.time()
    ids, scores, nsc = jax.block_until_ready(
        dsearch(params, state, sidx, users, level_topn))
    print(f"# compile+first batch: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    for _ in range(args.reps):
        ids, scores, nsc = dsearch(params, state, sidx, users, level_topn)
    jax.block_until_ready((ids, scores, nsc))
    dt = (time.time() - t0) / args.reps
    ids, scores, nsc = (np.asarray(ids), np.asarray(scores), np.asarray(nsc))

    # structural invariants at 100M (recall is meaningless on a random graph)
    k = int(level_topn[-1])
    assert ids.shape == (args.batch, k), ids.shape
    assert ((ids >= 1) & (ids <= n)).all(), "ids out of range"
    for row in ids:
        assert len(np.unique(row)) == k, "duplicate results"
    assert np.isfinite(scores).all()
    assert (np.diff(scores, axis=1) <= 1e-6).all(), "scores not sorted"

    print(f"SCALE100M_OK items={n} shards={args.shards} batch={args.batch} "
          f"scored/query={nsc.mean():.0f} "
          f"cpu_sim_s_per_batch={dt:.1f} "
          f"gib_per_shard={gib / args.shards:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
