"""Search-vs-oracle overlap diagnostic.

Measures |graph_topk ∩ oracle_topk| / k per user — the pure search-quality
metric (how much of the DNN's own ideal top-k the graph search recovers),
independent of whether the model ranks ground truth highly. This is the
bench's recall metric run on a real trained checkpoint.

Usage: python scripts/parity_overlap.py --output-root .pipe100k \
          [--index-dir .pipe100k/index_wide --start-level 1 \
           --num-scoring 3 1 --topk 400 400]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output-root", required=True)
    ap.add_argument("--index-dir", default=None)
    ap.add_argument("--start-level", type=int, default=2)
    ap.add_argument("--num-scoring", type=int, nargs="+", default=[3, 1, 1])
    ap.add_argument("--topk", type=int, nargs="+", default=[400, 200, 100])
    ap.add_argument("--frontier-cap", type=int, default=4096)
    ap.add_argument("--k", type=int, default=200)
    ap.add_argument("--users", type=int, default=16)
    ap.add_argument("--num-item", type=int, default=100000)
    ap.add_argument("--num-cate", type=int, default=200)
    ap.add_argument("--num-users-gen", type=int, default=3000)
    ap.add_argument("--seq-len", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nann_tpu.config import ModelConfig, SearchConfig, TrainConfig
    from nann_tpu.data import synthetic_dataset
    from nann_tpu.delivery import extract_user_embeddings
    from nann_tpu.index import load_index
    from nann_tpu.search import (SearchIndex, make_brute_force_scorer,
                                 make_searcher)
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.train import create_train_state
    from nann_tpu.train.dataclasses_io import restore_train_state
    from nann_tpu.train.loop import latest_checkpoint_step

    mcfg = ModelConfig(num_item=args.num_item, num_cate=args.num_cate,
                       emb_dim=32, max_seq_length=args.seq_len,
                       item_tower_dims=(64, 64, 64))
    scfg = SearchConfig(hnsw_start_level=args.start_level,
                        num_scoring_per_level=tuple(args.num_scoring),
                        top_k_per_level=tuple(args.topk),
                        topk_eval=(args.k,), frontier_cap=args.frontier_cap)

    state, _tx = create_train_state(jax.random.PRNGKey(0), mcfg, TrainConfig())
    ckpt_dir = os.path.join(args.output_root, "model")
    step = latest_checkpoint_step(ckpt_dir)
    state = restore_train_state(os.path.join(ckpt_dir, f"step_{step}"), state)

    item_embs = np.load(os.path.join(args.output_root,
                                     "embeddings/item_embs.npy"))
    item_ids = np.load(os.path.join(args.output_root,
                                    "embeddings/item_ids.npy"))
    index_dir = args.index_dir or os.path.join(args.output_root, "index")
    art = load_index(index_dir, args.start_level, max_degree=64)
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids,
                                      dtype=jnp.float32)

    _train, test, _feats = synthetic_dataset(
        num_item=args.num_item, num_cate=args.num_cate,
        num_users=args.num_users_gen, max_seq_length=args.seq_len, seed=0)
    users = extract_user_embeddings(state.params,
                                    {k: test[k][:args.users] for k in test})

    search = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                              in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn_default(scfg))
    top_items, _s, num_scoring = search(state.params, state.bn_state, sidx,
                                        jnp.asarray(users), ltn)

    oracle = make_brute_force_scorer(mcfg, chunk_size=8192, k=args.k)
    bf_idx, _ = oracle(state.params, state.bn_state, jnp.asarray(users),
                       jnp.asarray(item_embs))
    bf_items = item_ids[np.asarray(bf_idx)]

    overlaps = []
    for u in range(args.users):
        got = np.asarray(top_items[u])
        got = set(got[got >= 0].tolist())
        want = set(bf_items[u].tolist())
        overlaps.append(len(got & want) / len(want))
    ns = np.asarray(num_scoring)
    print(f"overlap@{args.k} vs oracle: mean {np.mean(overlaps):.3f} "
          f"min {np.min(overlaps):.3f} max {np.max(overlaps):.3f}")
    print(f"num_scoring: mean/query {ns.sum(-1).mean():.0f} "
          f"per hop {ns.mean(0).round(0)}")


if __name__ == "__main__":
    main()
