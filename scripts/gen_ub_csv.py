"""Generate a reference-scale synthetic UserBehavior.csv.

The real corpus (zero-egress env has no copy) is ~100M rows, ~1M users,
~4.2M items, ~9.4k categories: user_id,item_id,cate_id,behavior,timestamp.
This writes the same shape with Zipfian item popularity so the converter +
training pipeline can be proven at reference scale (VERDICT r1 item 5).

Usage: python scripts/gen_ub_csv.py --rows 100000000 --out /tmp/ub100m.csv
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000_000)
    ap.add_argument("--users", type=int, default=1_000_000)
    ap.add_argument("--items", type=int, default=4_200_000)
    ap.add_argument("--cates", type=int, default=9439)
    ap.add_argument("--out", default="/tmp/ub100m.csv")
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--structured", action="store_true",
                    help="give each user 1-3 preferred categories (hash-"
                         "derived) and draw their items Zipf-within-"
                         "category — next-item prediction becomes learnable, "
                         "so recall/parity at this scale is meaningful "
                         "(the default global-Zipf stream is information-"
                         "theoretically ~0%% recall at 4.2M items)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    behaviors = np.array([b"pv", b"cart", b"fav", b"buy"], dtype="S4")

    with open(args.out, "wb") as f:
        written = 0
        while written < args.rows:
            n = min(args.chunk, args.rows - written)
            users = rng.integers(0, args.users, n)
            # Zipf-ish item popularity via power-transformed uniform
            u = rng.random(n)
            if args.structured:
                # user's preference set: 1-3 categories derived from the
                # user id by multiplicative hashing (stable across chunks)
                n_pref = 1 + (users * 40503 % 3)
                which = rng.integers(0, 3, n) % n_pref
                cates = ((users + 1) * (2654435761 + which * 40503641)
                         % args.cates)
                # Zipf-within-category over the category's contiguous item
                # block (item -> cate must be a pure function of the item id
                # so the converter's cate column stays consistent)
                block = args.items // args.cates
                within = (block * u ** 3.0).astype(np.int64)
                items = cates * block + within
                cates = items // block      # exact inverse of the layout
            else:
                items = (args.items * u ** 3.0).astype(np.int64)
                cates = (items * 2654435761 % args.cates)  # item->cate hash
            beh = behaviors[rng.integers(0, 4, n)]
            ts = rng.integers(1_511_544_000, 1_512_316_799, n)  # UB window
            import pandas as pd
            df = pd.DataFrame({0: users, 1: items, 2: cates,
                               3: beh.astype(str), 4: ts})
            df.to_csv(f, header=False, index=False, mode="ab")
            written += n
            if written % 10_000_000 < args.chunk:
                rate = written / (time.time() - t0)
                print(f"  {written/1e6:.0f}M rows, {rate/1e6:.2f}M rows/s",
                      flush=True)
    print(f"GEN_DONE rows={args.rows} elapsed={time.time()-t0:.0f}s "
          f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
