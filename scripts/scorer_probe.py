"""Isolate the frontier-scorer cost: XLA chain vs Pallas kernel.

Round-2 ablations (docs/DESIGN.md forensics III) show the DNN scorer is now
the dominant search cost (no_filter 0.144 ms/q of full 0.291 at batch 16).
Hypothesis: the XLA chain is HBM-bound on inter-layer intermediates — each
matmul materializes [rows, 128] f32 (~33 MB at 65k rows), ~200 MB/hop of
round trips the MXU never needed. The Pallas kernel keeps a row-tile's whole
chain in VMEM; this probe times both IN ISOLATION on identical inputs
(chained inside one program so relay dispatch doesn't floor the numbers).

Usage: python scripts/scorer_probe.py [--rows 65536] [--reps 8] [--chain 20]
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
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--tiles", type=int, nargs="+", default=[1024, 2048, 4096])
    args = ap.parse_args()

    from nann_tpu.config import ModelConfig
    from nann_tpu.models import init_scorer
    from nann_tpu.experimental.pallas_scorer import \
        make_pallas_frontier_scorer
    from nann_tpu.ops.scorer_kernel import (fold_scorer, precompute_user,
                                            score_frontier_reference)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg = ModelConfig(num_item=1000, num_cate=100, emb_dim=32,
                       max_seq_length=50, compute_dtype="bfloat16")
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal(
        (args.rows, mcfg.item_emb_dim)).astype(np.float32), dt)
    user = jnp.asarray(rng.standard_normal(
        (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))

    folded0 = fold_scorer(params, state, mcfg)
    kp0, v0 = precompute_user(folded0, user, dt=dt)

    # args.chain DIFFERENT materialized inputs: every dispatch scores a
    # distinct array, so neither XLA loop tricks nor any transport-level
    # result reuse can skip work. Dispatches are pipelined; one final block.
    embs = [jnp.asarray(rng.standard_normal(
        (args.rows, mcfg.item_emb_dim)).astype(np.float32), dt)
        for _ in range(args.chain)]

    def timeit(name, score1):
        run = jax.jit(score1)
        w0 = time.perf_counter()
        first = jax.block_until_ready(run(folded0, kp0, v0, emb))
        warm_s = time.perf_counter() - w0
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.reps):
            outs = [run(folded0, kp0, v0, e) for e in embs]
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0
        print(f"# {name}: warm {warm_s*1e3:.1f} ms, timed wall "
              f"{wall*1e3:.1f} ms over {args.reps}x{args.chain} programs "
              f"(first {float(first.sum()):.3f})", file=sys.stderr, flush=True)
        ms = wall / (args.reps * args.chain) * 1e3
        per_row_ns = ms * 1e6 / args.rows
        flops = args.rows * 9.0e4  # ~90 kFLOP/row (q1+q2+att+head)
        print(f"{name:28s} {ms:8.3f} ms/call  {per_row_ns:6.2f} ns/row  "
              f"~{flops / (ms * 1e-3) / 1e12:5.1f} TF/s", flush=True)

    timeit("xla score_frontier",
           lambda f, kp, v, e: score_frontier_reference(f, kp, v, e, dt=dt))

    for tile in args.tiles:
        if args.rows % tile:
            continue
        pk = make_pallas_frontier_scorer(mcfg, tile=tile)
        timeit(f"pallas tile={tile}", pk)

    # ---- int8 frontier (VERDICT r2 item 6): fused dequant+score in VMEM vs
    # the XLA unpack->score chain, on identical quantized rows
    from nann_tpu.index.quantize import dequantize_rows, quantize_embeddings
    q_np, s_np = quantize_embeddings(np.asarray(embs[0], np.float32))
    qs = [(jnp.asarray(q_np), jnp.asarray(s_np))]
    for e in embs[1:]:
        q1, s1 = quantize_embeddings(np.asarray(e, np.float32))
        qs.append((jnp.asarray(q1), jnp.asarray(s1)))

    def timeit_q(name, score_q):
        run = jax.jit(score_q)
        w0 = time.perf_counter()
        first = jax.block_until_ready(run(folded0, kp0, v0, *qs[0]))
        warm_s = time.perf_counter() - w0
        t0 = time.perf_counter()
        outs = []
        for _ in range(args.reps):
            outs = [run(folded0, kp0, v0, q, s) for q, s in qs]
        jax.block_until_ready(outs)
        wall = time.perf_counter() - t0
        ms = wall / (args.reps * args.chain) * 1e3
        print(f"# {name}: warm {warm_s*1e3:.1f} ms "
              f"(first {float(first.sum()):.3f})", file=sys.stderr, flush=True)
        print(f"{name:28s} {ms:8.3f} ms/call  "
              f"{ms * 1e6 / args.rows:6.2f} ns/row", flush=True)

    timeit_q("xla int8 dequant+score",
             lambda f, kp, v, q, s: score_frontier_reference(
                 f, kp, v, dequantize_rows(q, s, dt), dt=dt))
    for tile in args.tiles:
        if args.rows % tile:
            continue
        pk8 = make_pallas_frontier_scorer(mcfg, tile=tile, packed_int8=True)
        timeit_q(f"pallas int8 tile={tile}",
                 lambda f, kp, v, q, s, _pk=pk8: _pk(f, kp, v, q, s[:, None]))


if __name__ == "__main__":
    main()
