"""Scale-ladder bench: qps + device-true latency at 200k/1M/4.2M/8M items
(VERDICT r2 item 3 — the ladder had holes at exactly the claims that matter:
no 4.2M point anywhere, 8M never re-measured after concat compaction).

For each (items, dtype) with a prebuilt .bench_cache index: batch-16 and
batch-64 pipelined qps, scored/query, and --chained device-true single-query
latency. Writes runs/ladder.json and prints a table row per point.

Usage: python scripts/ladder_bench.py [--points 200000 1000000 4200000 8000000]
       [--dtypes bf16 int8] [--chain 30]
"""

from __future__ import annotations

import argparse
import hashlib
import json
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
    ap.add_argument("--points", type=int, nargs="+",
                    default=[200_000, 1_000_000, 4_200_000, 8_000_000])
    ap.add_argument("--dtypes", nargs="+", default=["bf16", "int8"])
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--chain", type=int, default=30)
    ap.add_argument("--reorder", default=None, choices=[None, "bfs"])
    ap.add_argument("--out", default=os.path.join(REPO, "runs", "ladder.json"))
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.utils.trace import timed

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(1)
    # row-level resume: a watchdog restart (relay hang) skips finished rows
    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)
        if rows:
            print(f"# resuming: {[(r['items'], r['dtype']) for r in rows]} "
                  f"done", flush=True)
    done_keys = {(r["items"], r["dtype"]) for r in rows}
    for items in args.points:
        key = hashlib.md5(f"{items}-0-M32".encode()).hexdigest()[:12]
        if not os.path.exists(os.path.join(REPO, ".bench_cache", key,
                                           "enter_points.npy")):
            print(f"# {items}: no prebuilt index (scripts/"
                  f"prebuild_bench_index.py) — skipped", flush=True)
            continue
        for dtype in args.dtypes:
            if (items, dtype) in done_keys:
                continue
            t0 = time.time()
            print(f"# setup {items} {dtype} ...", flush=True)
            mcfg, scfg, params, state, sidx = build_setup(
                items, dtype="int8" if dtype == "int8" else jnp.bfloat16,
                reorder=args.reorder)
            print(f"# setup done {time.time() - t0:.0f}s", flush=True)
            searcher = make_searcher(mcfg, scfg)
            ltn = jnp.asarray(level_topn_default(scfg))
            row = {"items": items, "dtype": dtype,
                   # catalogue-aware cap (config.default_frontier_cap):
                   # 4.2M/8M rows run at 8192 — the at-scale quality setting
                   # — so qps is measured where the recall actually is
                   "frontier_cap": scfg.frontier_cap}
            if scfg.frontier_cap_per_hop:
                row["frontier_cap_per_hop"] = list(scfg.frontier_cap_per_hop)
            for b in (16, 64):
                userB = jnp.asarray(rng.standard_normal(
                    (b, mcfg.max_seq_length, mcfg.user_emb_dim)
                ).astype(np.float32))
                fB = jax.jit(jax.vmap(searcher,
                                      in_axes=(None, None, None, 0, None)))
                ms = timed(fB, params, state, sidx, userB, ltn,
                           reps=max(args.reps // (2 if b == 64 else 1), 5))
                row[f"qps_b{b}"] = round(b / ms * 1e3, 1)
                print(f"# b{b} dispatched {row[f'qps_b{b}']} qps "
                      f"({time.time() - t0:.0f}s)", flush=True)
                # device-true: chain the batched program on-chip — the
                # dispatch-pipelined number above is capped by the relay
                # tunnel's input bandwidth (~30-45 MB/s) at these batches
                N = max(args.chain // (2 if b == 64 else 1), 4)
                vsearch = jax.vmap(searcher,
                                   in_axes=(None, None, None, 0, None))

                @jax.jit
                def chB(params, state, sidx, users, ltn):
                    def body(_i, carry):
                        u = users + carry * 1e-12
                        _it, sc, _ns = vsearch(params, state, sidx, u, ltn)
                        return sc[:, 0].sum()
                    return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

                jax.block_until_ready(chB(params, state, sidx, userB, ltn))
                t1 = time.perf_counter()
                jax.block_until_ready(chB(params, state, sidx, userB, ltn))
                row[f"dev_qps_b{b}"] = round(
                    b * N / (time.perf_counter() - t1), 1)
                print(f"# b{b} device-true {row[f'dev_qps_b{b}']} qps "
                      f"({time.time() - t0:.0f}s)", flush=True)
                if b == 16:
                    out = fB(params, state, sidx, userB, ltn)
                    row["scored_per_query"] = int(
                        np.asarray(out[2]).mean())
            if args.chain:
                N = args.chain
                user1 = jnp.asarray(rng.standard_normal(
                    (mcfg.max_seq_length, mcfg.user_emb_dim)
                ).astype(np.float32))

                @jax.jit
                def chained(params, state, sidx, user, ltn):
                    def body(_i, carry):
                        u = user + carry * 1e-12
                        _it, sc, _n = searcher(params, state, sidx, u, ltn)
                        return sc[0]
                    return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

                jax.block_until_ready(chained(params, state, sidx, user1, ltn))
                t1 = time.perf_counter()
                jax.block_until_ready(chained(params, state, sidx, user1, ltn))
                row["device_ms_1q"] = round(
                    (time.perf_counter() - t1) / N * 1e3, 3)
            row["setup_s"] = round(time.time() - t0, 1)
            rows.append(row)
            with open(args.out, "w") as f:
                json.dump(rows, f, indent=1)
            print(f"{items:>9d} {dtype:>5s}: b16 {row['qps_b16']:7.1f} qps "
                  f"(dev {row.get('dev_qps_b16', 0):7.1f})  "
                  f"b64 {row.get('qps_b64', 0):7.1f} qps "
                  f"(dev {row.get('dev_qps_b64', 0):7.1f})  1q "
                  f"{row.get('device_ms_1q', float('nan')):6.3f} ms  scored "
                  f"{row.get('scored_per_query')}", flush=True)
            del params, state, sidx

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
