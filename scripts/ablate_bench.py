"""Decompose the fused-search latency with real program ablations.

Micro-probes of isolated ops mislead (XLA rewrites around digests, relay
behavior shifts); this measures the actual search program with pieces
swapped out, all device-true via the chained-inside-one-program method:

  full           the production search (current default semantics)
  serving        the exported-graph semantics variant
  no_filter      visited filter + dedup + compaction replaced by raw
                 truncation (isolates the filter cost)
  no_score       scorer replaced by a row-sum (isolates the DNN cost)
  pallas         the Pallas frontier scorer instead of XLA-fused

Usage: python scripts/ablate_bench.py [--items 200000] [--chain 32]
                                      [--batch 16] [--variants ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "serving", "no_filter", "no_score"])
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    rng = np.random.default_rng(1)
    user1 = jnp.asarray(rng.standard_normal(
        (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))

    def variant_searcher(name):
        kw = {}
        if name == "serving":
            kw["semantics"] = "serving"
        elif name == "no_filter":
            kw["_filter"] = False
        elif name == "no_score":
            kw["_score"] = False
        elif name == "pallas":
            kw["use_pallas_scorer"] = True
        return make_searcher(mcfg, scfg, **kw), kw.get("semantics")

    def chained_single(searcher, ltn, N):
        @jax.jit
        def chained(params, state, sidx, user, ltn):
            def body(_i, carry):
                u = user + carry * 1e-12
                _items, scores, _ns = searcher(params, state, sidx, u, ltn)
                return scores[0]
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        t0 = time.time()
        jax.block_until_ready(chained(params, state, sidx, user1, ltn))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        outs = [chained(params, state, sidx, user1, ltn)
                for _ in range(args.reps)]
        jax.block_until_ready(outs)
        return (time.perf_counter() - t0) / (N * args.reps) * 1e3, compile_s

    def chained_batch(searcher, ltn, N):
        vs = jax.vmap(searcher, in_axes=(None, None, None, 0, None))

        @jax.jit
        def chained(params, state, sidx, users, ltn):
            def body(_i, carry):
                u = users + carry * 1e-12
                _items, scores, _ns = vs(params, state, sidx, u, ltn)
                return scores[0, 0]
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))
        jax.block_until_ready(chained(params, state, sidx, userB, ltn))
        t0 = time.perf_counter()
        outs = [chained(params, state, sidx, userB, ltn)
                for _ in range(args.reps)]
        jax.block_until_ready(outs)
        per_batch = (time.perf_counter() - t0) / (N * args.reps) * 1e3
        return per_batch / args.batch

    for name in args.variants:
        searcher, sem = variant_searcher(name)
        ltn = jnp.asarray(level_topn_default(scfg, sem))
        ms1, comp = chained_single(searcher, ltn, args.chain)
        msB = chained_batch(searcher, ltn, max(args.chain // 4, 4))
        print(f"{name:10s} single {ms1:7.3f} ms/q   batch{args.batch} "
              f"{msB:7.3f} ms/q ({args.batch/msB*1e3:7.1f} qps)  "
              f"[compile {comp:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
