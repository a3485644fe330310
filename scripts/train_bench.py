"""Training-throughput benchmark at the reference demo scale.

Measures samples/s of the full adversarial train step (UB-scale model: 4.2M
items, emb 32, seq 50, batch 800, 200 negatives, FGSM on) on the available
devices. Prints one JSON line.

Usage: python scripts/train_bench.py [--items 4200000] [--batch 800] [--dp N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=4_200_000)
    ap.add_argument("--batch", type=int, default=800)
    ap.add_argument("--num-neg", type=int, default=200)
    ap.add_argument("--seq-len", type=int, default=50)
    ap.add_argument("--dp", type=int, default=1)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nann_tpu.config import ModelConfig, TrainConfig
    from nann_tpu.parallel import make_mesh
    from nann_tpu.train import create_train_state, make_train_step

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg = ModelConfig(num_item=args.items, num_cate=10_000, emb_dim=32,
                       max_seq_length=args.seq_len)
    tcfg = TrainConfig(batch_size=args.batch, num_neg=args.num_neg,
                       adv_eps=3e-5, dp=args.dp)

    rng = np.random.default_rng(0)
    pop = rng.random(args.items).astype(np.float32)
    pop /= pop.sum()
    feats = {
        "item_id": jnp.arange(1, args.items + 1, dtype=jnp.int32),
        "cate_id": jnp.asarray(
            rng.integers(1, 10_000, args.items).astype(np.int32)),
        "weight_tag": jnp.asarray(pop),
    }
    mesh = make_mesh(dp=args.dp, mp=1) if args.dp > 1 else None
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx, feats, mesh=mesh)

    batch = {
        "item_ids": jnp.asarray(rng.integers(
            0, args.items, (args.batch, args.seq_len)).astype(np.int32)),
        "cate_ids": jnp.asarray(rng.integers(
            0, 10_000, (args.batch, args.seq_len)).astype(np.int32)),
        "gt_item_id": jnp.asarray(rng.integers(
            1, args.items, args.batch).astype(np.int32)),
        "gt_cate_id": jnp.asarray(rng.integers(
            1, 10_000, args.batch).astype(np.int32)),
        "weight_tag": jnp.asarray(pop[rng.integers(0, args.items, args.batch)]),
    }
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step(state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"# compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step(state, batch, key)
        if i and i % 2000 == 0:   # sustained-window progress (VERDICT #5)
            jax.block_until_ready(metrics["loss"])
            el = time.perf_counter() - t0
            print(f"# [{i}/{args.steps}] {args.batch * i / el:.0f} "
                  f"samples/s over {el/60:.1f} min", file=sys.stderr,
                  flush=True)
    jax.block_until_ready(metrics["loss"])
    wall = time.perf_counter() - t0
    step_ms = wall / args.steps * 1e3
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(args.batch * args.steps / wall, 1),
        "unit": "samples/s",
        "step_ms": round(step_ms, 2),
        "batch": args.batch,
        "num_neg": args.num_neg,
        "num_items": args.items,
        "dp": args.dp,
        "loss": float(metrics["loss"]),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
