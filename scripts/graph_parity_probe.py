"""Per-checkpoint graph-parity probe on a subset index.

Round-5 forensics: the 4.2M cosine pipeline selected step 30001 by ORACLE
recall (68.4%) but the full-index graph search collapsed to 25.7% (parity
37% vs round-4's 85.6% with a constant-lr step-10001 checkpoint). Hypothesis:
graph parity DEGRADES as training progresses — a memorizing checkpoint still
ranks well (oracle) but its item-embedding space loses the neighborhood
structure HNSW routing depends on, so deploy-by-oracle ships a model whose
ceiling the graph cannot reach.

This probe measures, for each retained checkpoint: subset-oracle recall,
subset-graph recall (HNSW built on the FIRST --subset items of THIS
checkpoint's embeddings), and their ratio (parity). The subset keeps the
HNSW build minutes instead of hours; gt items outside the subset are missed
by oracle and graph alike, so the RATIO stays comparable across checkpoints.

Usage:
  python scripts/graph_parity_probe.py --output-root runs/ub_structured/out \
      --dataset-dir runs/ub_structured/data --steps 10001 30001 50000 \
      --subset 200000 --users 512
Writes runs/graph_parity_probe.json (one row per checkpoint, resumable).
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--dataset-dir", default="runs/ub_structured/data")
    ap.add_argument("--output-root", default="runs/ub_structured/out")
    ap.add_argument("--steps", type=int, nargs="+", default=None,
                    help="checkpoint steps (default: all retained)")
    ap.add_argument("--subset", type=int, default=200_000)
    ap.add_argument("--users", type=int, default=512)
    ap.add_argument("--ef-construction", type=int, default=100)
    ap.add_argument("--threads", type=int, default=3)
    ap.add_argument("--out", default="runs/graph_parity_probe.json")
    args = ap.parse_args()

    from nann_tpu import main as M
    from nann_tpu.config import SearchConfig, default_frontier_cap
    from nann_tpu.delivery import (extract_item_embeddings,
                                   extract_user_embeddings)
    from nann_tpu.index import load_index
    from nann_tpu.index.hnsw_build import build_and_save_index
    from nann_tpu.search import SearchIndex, make_searcher
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.train.loop import checkpoint_steps
    from nann_tpu.utils import calc_pr

    # reuse the CLI's config assembly so model/search params match the
    # pipeline exactly (meta-JSON merge included)
    cli = M.parse_opt(
        ["--job-type", "parity", "--dataset-dir", args.dataset_dir,
         "--output-root", args.output_root,
         "--num-test-batch", str(args.users)])
    mcfg, tcfg, _scfg = M.build_configs(cli)
    paths = M.Paths(cli.output_root)
    scfg = SearchConfig(frontier_cap=default_frontier_cap(args.subset))

    _train, test, feats = M.load_dataset(cli)
    steps = args.steps or checkpoint_steps(paths.model_save_dir)
    n_users = min(args.users, len(test["gt_item_id"]))

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out))
    done = {r["step"] for r in rows}

    # subset must COVER the eval users' gt items (item ids are not
    # popularity-ordered: a prefix subset had ~zero gt coverage): gt items
    # of the eval slice + the most popular items + random fill, deduped.
    # Same subset for every checkpoint, so the ratio stays comparable.
    gt = np.unique(np.concatenate(
        [np.atleast_1d(np.asarray(g)).ravel()
         for g in test["gt_item_id"][:n_users]]))
    ids_all = np.asarray(feats["item_id"]).astype(np.int64)  # 1-based ids;
    # row r of the embedding matrix holds item id ids_all[r]
    pop_ids = ids_all[np.argsort(-np.asarray(feats["weight_tag"]))]
    rng = np.random.default_rng(0)
    fill_ids = ids_all[rng.choice(len(ids_all), size=args.subset,
                                  replace=False)]
    # priority order: all gt, then popular, then random fill — first
    # occurrence wins, truncate to the target size, sort by id
    cand = np.concatenate([gt, pop_ids[:args.subset // 2], fill_ids])
    _, first = np.unique(cand, return_index=True)
    sub_ids = np.ascontiguousarray(
        np.sort(cand[np.sort(first)][:args.subset]).astype(np.int64))
    sub_rows = np.searchsorted(ids_all, sub_ids)
    assert (ids_all[sub_rows] == sub_ids).all()
    cov = np.isin(gt, sub_ids).mean()
    print(f"# subset {len(sub_ids)} items, gt coverage {cov:.1%}",
          flush=True)
    for step in steps:
        if step in done:
            print(f"# step {step}: cached", flush=True)
            continue
        t0 = time.time()
        state = M._restore(mcfg, tcfg, paths, step=step,
                           prefer_selected=False)
        _ids, embs = extract_item_embeddings(state.params, state.bn_state,
                                             mcfg, feats)
        sub = np.ascontiguousarray(embs[sub_rows])
        print(f"# step {step}: extracted ({time.time()-t0:.0f}s)", flush=True)

        idx_dir = f"runs/probe_idx_{step}"
        if not os.path.exists(os.path.join(idx_dir, "enter_points.npy")):
            build_and_save_index(sub, start_level=scfg.hnsw_start_level,
                                 num_neighbors=32,
                                 ef_construction=args.ef_construction,
                                 output_dir=idx_dir,
                                 num_threads=args.threads)
        print(f"# step {step}: index built ({time.time()-t0:.0f}s)",
              flush=True)

        # subset oracle (brute force over the same subset)
        oracle = M._oracle_recall(cli, mcfg, state, jnp.asarray(sub),
                                  sub_ids, test, quiet=True)

        # subset graph search
        art = load_index(idx_dir, scfg.hnsw_start_level, max_degree=64)
        sidx = SearchIndex.from_artifacts(art, sub, sub_ids,
                                          dtype=jnp.float32)
        search = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                                  in_axes=(None, None, None, 0, None)))
        ltn = jnp.asarray(level_topn_default(scfg))
        B = cli.search_batch
        rec = []
        for s in range(0, n_users, B):
            e = min(s + B, n_users)
            batch = {k: test[k][s:e] for k in test}
            user = extract_user_embeddings(state.params, batch)
            if e - s < B:
                user = np.concatenate(
                    [user, np.zeros((B - (e - s),) + user.shape[1:],
                                    np.float32)])
            top_items, _sc, _ns = search(state.params, state.bn_state, sidx,
                                         jnp.asarray(user), ltn)
            top_items = np.asarray(top_items)[:e - s]
            for u in range(e - s):
                got = top_items[u][top_items[u] >= 0]
                _p, r, _f = calc_pr(batch["gt_item_id"][u], got[:200])
                rec.append(r)
        graph = float(np.mean(rec))
        orc = oracle["recall@200"]
        row = {"step": step, "subset": args.subset,
               "oracle_recall@200": orc, "graph_recall@200": graph,
               "parity": graph / orc if orc else float("nan"),
               "elapsed_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"# step {step}: oracle {orc:.2%} graph {graph:.2%} "
              f"parity {row['parity']:.1%} ({row['elapsed_s']:.0f}s)",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        del state, embs, sub, sidx
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
