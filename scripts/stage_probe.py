"""Per-stage device timing of the staged search with REALISTIC inputs.

The full-vs-ablation gap (docs/DESIGN.md co-compilation pathology) could be
(a) a compilation effect — in which case separately-compiled stages should sum
to the ablation ceiling — or (b) a data effect: the ablation variants
(row-sum scorer / unfiltered frontier) collapse the set of DISTINCT rows the
gathers touch, making their HBM working set unrealistically cache-friendly.
Staged execution measured 1.43 ms/q at batch 64 (vs 1.27 fused), so (a) is
dead; this probe times each stage program on inputs captured from a real run
to locate where the time actually goes.

Usage: python scripts/stage_probe.py [--items 200000] [--batch 16]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--vis", default="bytemap",
                    choices=["bytemap", "list"])
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search.beam import _UNVISITED, level_topn_default
    from nann_tpu.search.staged import make_staged_searcher

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    scfg.vis_impl = args.vis
    rng = np.random.default_rng(1)
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))
    ltn = jnp.asarray(level_topn_default(scfg))

    # no-donation build: stage inputs must be reusable for timing loops
    fn = make_staged_searcher(mcfg, scfg, donate_vis=False)
    st = fn.stages
    B, n = args.batch, sidx.item_ids.shape[0]
    start = scfg.hnsw_start_level

    def timeit(name, f, *fargs, reps=args.reps):
        jax.block_until_ready(f(*fargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = f(*fargs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:22s} {ms:8.3f} ms/call  {ms/B*1e3:7.1f} us/q",
              flush=True)
        return ms

    total = 0.0
    total += timeit("prep", st["prep"], params, state, userB)
    folded, kpB, vB = st["prep"](params, state, userB)
    total += timeit("enter", st["enter"], folded, kpB, vB, sidx.item_embs,
                    sidx.enter_points, ltn[0])
    res_ids, res_scores = st["enter"](folded, kpB, vB, sidx.item_embs,
                                      sidx.enter_points, ltn[0])

    max_deg = max(v.shape[1] for v in sidx.neighbors.values())
    max_cand = max([scfg.top_k_per_level[start],
                    max(max(scfg.topk_eval), 1)] + list(scfg.top_k_per_level))
    if args.vis == "list":
        from nann_tpu.search.beam import ListBackend
        vis = jnp.full((B, 0), ListBackend.PAD, jnp.int32)
    else:
        vis = jnp.full((B, n + max_cand * max_deg), _UNVISITED, jnp.uint8)

    cand_ids, cand_scores = res_ids, res_scores
    t = 1
    hop_no = 1
    for level in range(start - 1, -1, -1):
        cand_ids, cand_scores = res_ids, res_scores
        for hop in range(scfg.num_scoring_per_level[level]):
            salt = jnp.int32((0x1F123BB5 * (hop_no + 1)) & 0x3FFFFFFF)
            jf = fn.stages["filter"][(level, hop == 0)]
            js = fn.stages["score"][level]
            total += timeit(f"filter L{level} hop{hop}", jf,
                            sidx.neighbors[level], vis, cand_ids, cand_scores,
                            res_ids, res_scores, salt)
            fresh, valid, vis, cnt = jf(sidx.neighbors[level], vis, cand_ids,
                                        cand_scores, res_ids, res_scores,
                                        salt)
            total += timeit(f"score  L{level} hop{hop}", js, folded, kpB, vB,
                            sidx.item_embs, fresh, valid, res_ids, res_scores,
                            ltn[t])
            res_ids, res_scores, cand_ids, cand_scores = js(
                folded, kpB, vB, sidx.item_embs, fresh, valid, res_ids,
                res_scores, ltn[t])
            hop_no += 1
        t += 1
    total += timeit("final", st["final"], res_ids, res_scores, sidx.item_ids,
                    ltn[-1])
    print(f"{'TOTAL (sum of stages)':22s} {total:8.3f} ms/call  "
          f"{total/B*1e3:7.1f} us/q", flush=True)


if __name__ == "__main__":
    main()
