"""Per-checkpoint graph-parity probe on a gt-covering subset index.

Round-5 forensics: the 4.2M cosine pipeline selected step 30001 by ORACLE
recall (68.4%) but the full-index graph search collapsed to 25.7% (parity
37% vs round-4's 85.6%), and doubling the search budget recovered only
+1.3pp — not budget-bound. Measured curve (this script): subset-graph
parity 76.6% (step 10k) -> 18.2% (30k) -> 5.7% (50k) at flat oracle.
Core machinery now lives in nann_tpu/delivery/graph_select.py and powers
`--job-type select_checkpoint --select-metric graph`; this script is the
standalone forensic: it reports subset ORACLE recall too, so the
oracle-vs-graph divergence is visible per checkpoint.

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
    from nann_tpu.delivery import extract_item_embeddings
    from nann_tpu.delivery.graph_select import (gt_covering_subset,
                                                subset_graph_recall)
    from nann_tpu.train.loop import checkpoint_steps

    # reuse the CLI's config assembly so model/search params match the
    # pipeline exactly (meta-JSON merge included)
    cli = M.parse_opt(
        ["--job-type", "parity", "--dataset-dir", args.dataset_dir,
         "--output-root", args.output_root,
         "--num-test-batch", str(args.users)])
    mcfg, tcfg, scfg = M.build_configs(cli)
    paths = M.Paths(cli.output_root)

    _train, test, feats = M.load_dataset(cli)
    steps = args.steps or checkpoint_steps(paths.model_save_dir)
    n_users = min(args.users, len(test["gt_item_id"]))

    rows = []
    if os.path.exists(args.out):
        rows = json.load(open(args.out))
    done = {r["step"] for r in rows}

    sub_ids, sub_rows = gt_covering_subset(feats, test, n_users, args.subset)
    print(f"# subset {len(sub_ids)} items (gt-covering)", flush=True)

    for step in steps:
        if step in done:
            print(f"# step {step}: cached", flush=True)
            continue
        t0 = time.time()
        state = M._restore(mcfg, tcfg, paths, step=step,
                           prefer_selected=False)
        _ids, embs = extract_item_embeddings(state.params, state.bn_state,
                                             mcfg, feats)
        print(f"# step {step}: extracted ({time.time()-t0:.0f}s)", flush=True)
        sub = np.ascontiguousarray(embs[sub_rows])

        # subset oracle (brute force over the same subset) — the probe's
        # extra vs select_checkpoint: shows the ceiling stays flat while
        # graph recall moves
        oracle = M._oracle_recall(cli, mcfg, state, jnp.asarray(sub),
                                  sub_ids, test, quiet=True)
        orc = oracle[f"recall@{max(cli.topk_eval)}"]

        graph = subset_graph_recall(
            mcfg, scfg, state, embs, sub_ids, sub_rows, test, n_users,
            workdir=f"runs/probe_idx_{step}",
            ef_construction=args.ef_construction,
            num_threads=args.threads, search_batch=cli.search_batch,
            topk=max(cli.topk_eval), keep_index=True)
        row = {"step": step, "subset": int(len(sub_ids)),
               "oracle_recall@200": orc, "graph_recall@200": graph,
               "parity": graph / orc if orc else float("nan"),
               "elapsed_s": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"# step {step}: oracle {orc:.2%} graph {graph:.2%} "
              f"parity {row['parity']:.1%} ({row['elapsed_s']:.0f}s)",
              flush=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        del state, embs, sub
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
