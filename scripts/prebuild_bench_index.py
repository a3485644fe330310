"""Pre-build a bench-cache HNSW index (same contract as bench.build_setup)
with explicit thread/ef control, so multi-hour builds can run in the
background without saturating the box.

Usage: python scripts/prebuild_bench_index.py --items 16000000 --threads 3
"""
import argparse
import hashlib
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nann_tpu.index import build_and_save_index  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ef", type=int, default=100)
    ap.add_argument("--threads", type=int, default=3)
    args = ap.parse_args()

    key = hashlib.md5(f"{args.items}-{args.seed}-M32".encode()).hexdigest()[:12]
    out = os.path.join(REPO, ".bench_cache", key)
    if os.path.exists(os.path.join(out, "enter_points.npy")):
        print(f"already built: {out}")
        return
    if args.ef != 100:
        # the bench cache key does NOT encode ef (bench.py assumes ef=100),
        # so a non-default graph here would silently change every later
        # bench.py run at this item count — make that loud and traceable
        print(f"WARNING: ef={args.ef} != bench.py's assumed 100; bench runs "
              f"at --items {args.items} will use THIS graph. Recorded in "
              f"{out}/build_params.json.", file=sys.stderr)

    rng = np.random.default_rng(args.seed)
    # must match bench.build_setup: [n, item_emb_dim=64] standard normal
    t0 = time.time()
    embs = rng.standard_normal((args.items, 64)).astype(np.float32)
    print(f"embeddings generated: {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    build_and_save_index(embs, start_level=2, num_neighbors=32,
                         output_dir=out, ef_construction=args.ef,
                         seed=args.seed, num_threads=args.threads)
    import json
    with open(os.path.join(out, "build_params.json"), "w") as f:
        json.dump({"items": args.items, "seed": args.seed, "ef": args.ef,
                   "threads": args.threads,
                   "build_seconds": round(time.time() - t0, 1)}, f)
    print(f"build: {time.time() - t0:.0f}s -> {out}", flush=True)


if __name__ == "__main__":
    main()
