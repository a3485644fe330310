"""Empirical probes that decide the round-2 per-hop kernel design.

Measures, on the real TPU, with ops CHAINED INSIDE one jitted program
(per-dispatch relay overhead ~0.7-0.9 ms floors naive per-call timing):
  1. XLA sort vs top_k cost at frontier-expansion size (12.8k, batch 16)
  2. XLA scatter cost under different annotation regimes
  3. gather cost (visited bytes, embedding rows)
  4. whether Mosaic (Pallas TPU) lowers vector gather / scatter / sort /
     top_k at all -- the feasibility gate for a fused per-hop kernel
  5. pallas frontier scorer throughput at 4k and 13k rows
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

N_ITEMS = 200_064        # multiple of 128 for pallas blocks
EXPAND = 12_800          # 400 cands x 32 deg
F_CAP = 4096
BATCH = 16
K_CHAIN = 50


def chained_ms(name, op, *args, k=K_CHAIN, reps=10):
    """Time `op` repeated k times inside ONE jitted program (data-dependent
    so XLA can't collapse the loop), the program dispatched `reps` times
    back-to-back with a single final sync — the ~30 ms relay sync amortizes
    over k*reps executions instead of k."""
    @jax.jit
    def run(*a):
        def body(i, carry):
            out = op(i, carry, *a)
            return out
        return jax.lax.fori_loop(0, k, body, jnp.int32(0))

    out = run(*args)
    jax.block_until_ready(out)          # compile + warm
    t0 = time.perf_counter()
    outs = [run(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / (k * reps)
    print(f"  {name}: {dt*1e3:.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N_ITEMS, size=(BATCH, EXPAND)),
                      jnp.int32)
    ids1 = ids[0]
    scores = jnp.asarray(rng.standard_normal((BATCH, EXPAND)), jnp.float32)
    vis = jnp.full((N_ITEMS + 1,), 255, jnp.uint8)
    embs = jnp.asarray(rng.standard_normal((N_ITEMS, 64)), jnp.bfloat16)
    fresh = jnp.asarray(
        np.sort(rng.choice(N_ITEMS, size=F_CAP, replace=False)), jnp.int32)
    fresh_uns = jnp.asarray(rng.permutation(np.asarray(fresh)), jnp.int32)

    # every op consumes the carry (an int32) and returns an int32 digest
    print("== sorts / top_k (chained x%d inside one program) ==" % K_CHAIN,
          flush=True)
    chained_ms("sort int32 [12800]",
               lambda i, c, x: jnp.sort(x ^ c)[0], ids1)
    chained_ms("sort int32 [16,12800]",
               lambda i, c, x: jnp.sort(x ^ c, axis=-1)[0, 0], ids)
    chained_ms("top_k f32 [12800]->4096",
               lambda i, c, s: jax.lax.top_k(
                   s + c.astype(jnp.float32), F_CAP)[1][0], scores[0])
    chained_ms("top_k f32 [16,12800]->4096",
               lambda i, c, s: jax.lax.top_k(
                   s + c.astype(jnp.float32), F_CAP)[1][0, 0], scores)
    chained_ms("top_k f32 [16,12800]->1024",
               lambda i, c, s: jax.lax.top_k(
                   s + c.astype(jnp.float32), 1024)[1][0, 0], scores)
    chained_ms("top_k f32 [16,12800]->400",
               lambda i, c, s: jax.lax.top_k(
                   s + c.astype(jnp.float32), 400)[1][0, 0], scores)
    chained_ms("sort_key_val f32 [16,12800]",
               lambda i, c, s, x: jax.lax.sort_key_val(
                   s + c.astype(jnp.float32), x)[1][0, 0], scores, ids)

    print("== scatters (mark 4096 into 200k uint8) ==", flush=True)
    chained_ms("scatter unique+sorted",
               lambda i, c, v, f: v.at[f].set(
                   (c % 250).astype(jnp.uint8), unique_indices=True,
                   indices_are_sorted=True)[0].astype(jnp.int32),
               vis, fresh)
    chained_ms("scatter unique only",
               lambda i, c, v, f: v.at[f].set(
                   (c % 250).astype(jnp.uint8),
                   unique_indices=True)[0].astype(jnp.int32),
               vis, fresh_uns)
    chained_ms("scatter no hints",
               lambda i, c, v, f: v.at[f].set(
                   (c % 250).astype(jnp.uint8))[0].astype(jnp.int32),
               vis, fresh_uns)
    chained_ms("scatter unique 12800 ids",
               lambda i, c, v, f: v.at[jnp.clip(f ^ c, 0, N_ITEMS)].set(
                   7, unique_indices=True)[0].astype(jnp.int32),
               vis, ids1)

    print("== gathers ==", flush=True)
    chained_ms("gather uint8 [12800] from 200k",
               lambda i, c, v, x: jnp.take(
                   v, jnp.clip(x ^ c, 0, N_ITEMS))[0].astype(jnp.int32),
               vis, ids1)
    chained_ms("gather uint8 [16,12800] from 200k",
               lambda i, c, v, x: jnp.take(
                   v, jnp.clip(x ^ c, 0, N_ITEMS))[0, 0].astype(jnp.int32),
               vis, ids)
    chained_ms("gather emb rows [4096,64]bf16",
               lambda i, c, e, x: jnp.take(
                   e, jnp.clip(x[:F_CAP] ^ c, 0, N_ITEMS - 1),
                   axis=0)[0, 0].astype(jnp.int32), embs, ids1)
    chained_ms("gather emb rows [12800,64]bf16",
               lambda i, c, e, x: jnp.take(
                   e, jnp.clip(x ^ c, 0, N_ITEMS - 1),
                   axis=0)[0, 0].astype(jnp.int32), embs, ids1)
    chained_ms("gather emb rows [16*12800,64]bf16",
               lambda i, c, e, x: jnp.take(
                   e, jnp.clip(x.reshape(-1) ^ c, 0, N_ITEMS - 1),
                   axis=0)[0, 0].astype(jnp.int32), embs, ids)
    chained_ms("cumsum int32 [12800]",
               lambda i, c, x: jnp.cumsum(x ^ c)[-1], ids1)
    chained_ms("cumsum int32 [16,12800]",
               lambda i, c, x: jnp.cumsum(x ^ c, axis=-1)[0, -1], ids)
    vis32 = jnp.zeros((N_ITEMS + 1,), jnp.int32)
    chained_ms("gather int32 [12800] from 200k-table",
               lambda i, c, v, x: jnp.take(
                   v, jnp.clip(x ^ c, 0, N_ITEMS))[0], vis32, ids1)
    chained_ms("gather int32 [16,12800] from 200k-table",
               lambda i, c, v, x: jnp.take(
                   v, jnp.clip(x ^ c, 0, N_ITEMS))[0, 0], vis32, ids)
    chained_ms("argsort int32 [16,12800]",
               lambda i, c, x: jnp.argsort(x ^ c, axis=-1)[0, 0], ids)
    chained_ms("noop baseline (x[0,0]^c)",
               lambda i, c, x: x[0, 0] ^ c, ids)

    print("== pallas lowering feasibility ==", flush=True)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_compile(name, build):
        try:
            f = jax.jit(build())
            out = f()
            jax.block_until_ready(out)
            print(f"  {name}: OK", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"  {name}: FAIL ({type(e).__name__}: {msg})", flush=True)
            return False

    tab = jnp.asarray(rng.integers(0, 250, size=(N_ITEMS,)), jnp.int32)
    tab2d = tab.reshape(-1, 128)
    idx = jnp.asarray(rng.integers(0, N_ITEMS, size=(EXPAND,)), jnp.int32)
    idx2d = idx.reshape(-1, 128)

    def build_gather_flat():
        def kern(tab_ref, idx_ref, out_ref):
            t = tab_ref[:].reshape(-1)
            i = idx_ref[:].reshape(-1)
            out_ref[:] = jnp.take(t, i).reshape(out_ref.shape)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2d, idx2d)

    def build_take_along():
        def kern(tab_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:] % 128,
                                             axis=1)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2d[:idx2d.shape[0]], idx2d)

    def build_scatter():
        def kern(tab_ref, idx_ref, out_ref):
            t = tab_ref[:].reshape(-1)
            i = idx_ref[:].reshape(-1)
            out_ref[:] = t.at[i].set(7, unique_indices=True).reshape(
                out_ref.shape)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(tab2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2d, idx2d)

    def build_sort():
        def kern(x_ref, out_ref):
            out_ref[:] = jnp.sort(x_ref[:], axis=-1)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2d)

    def build_topk():
        def kern(x_ref, out_ref):
            v, _ = jax.lax.top_k(x_ref[:].reshape(1, -1), 128)
            out_ref[:] = v
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx2d)

    def build_gather_rows():
        # gather ROWS of a 2D VMEM table by a vector of row indices —
        # the visited-test primitive if Mosaic lowers it
        def kern(tab_ref, idx_ref, out_ref):
            rows = idx_ref[:, 0] // 128
            out_ref[:] = jnp.take(tab_ref[:], rows, axis=0)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((idx2d.shape[0], 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2d, idx2d)

    def build_gather_2d():
        # "2D gather": jnp.take(table2d, idx2d) flattened-index form kept 2D
        def kern(tab_ref, idx_ref, out_ref):
            t = tab_ref[:]
            i = idx_ref[:]
            out_ref[:] = jnp.take_along_axis(
                jnp.take(t, i // 128, axis=0), (i % 128)[..., None].reshape(
                    i.shape[0], 128), axis=1)
        return lambda: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(idx2d.shape, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab2d, idx2d)

    ok_gather = try_compile("pallas vector gather (flat 200k table)",
                            build_gather_flat)
    try_compile("pallas take_along_axis lanes", build_take_along)
    ok_rows = try_compile("pallas 2D row gather (take axis=0)",
                          build_gather_rows)
    ok_2d = try_compile("pallas row+lane gather (full table lookup)",
                        build_gather_2d)
    ok_scatter = try_compile("pallas vector scatter (.at[].set)",
                             build_scatter)
    try_compile("pallas jnp.sort", build_sort)
    try_compile("pallas lax.top_k", build_topk)

    if ok_2d:
        g2 = build_gather_2d()
        want = np.asarray(tab)[np.asarray(idx)]
        got = np.asarray(jax.jit(g2)()).reshape(-1)
        print(f"  full-table lookup correctness: {np.array_equal(got, want)}",
              flush=True)

    if ok_gather:
        g = build_gather_flat()
        want = np.asarray(tab)[np.asarray(idx)]
        got = np.asarray(jax.jit(g)()).reshape(-1)
        print(f"  gather correctness: {np.array_equal(got, want)}",
              flush=True)

    print("== pallas scorer width scaling (chained) ==", flush=True)
    from nann_tpu.config import ModelConfig, TrainConfig
    from nann_tpu.experimental.pallas_scorer import \
        make_pallas_frontier_scorer
    from nann_tpu.ops.scorer_kernel import (fold_scorer, precompute_user,
                                            score_frontier_reference)
    from nann_tpu.train import create_train_state

    mcfg = ModelConfig(num_item=1000, num_cate=10, emb_dim=32,
                       max_seq_length=50, item_tower_dims=(64, 64, 64))
    state, _ = create_train_state(jax.random.PRNGKey(0), mcfg, TrainConfig())
    folded = fold_scorer(state.params, state.bn_state, mcfg)
    user = jnp.asarray(rng.standard_normal((50, 64)), jnp.float32)
    kp, v = precompute_user(folded, user)
    pal = make_pallas_frontier_scorer(mcfg, tile=1024)
    for F in (4096, 13312):
        emb = jnp.asarray(rng.standard_normal((F, 64)), jnp.bfloat16)
        chained_ms(f"pallas scorer F={F}",
                   lambda i, c, e: pal(
                       folded, kp, v,
                       e + c.astype(jnp.bfloat16))[0].astype(jnp.int32),
                   emb, k=50, reps=20)
        chained_ms(f"xla folded scorer F={F}",
                   lambda i, c, e: score_frontier_reference(
                       folded, kp, v,
                       e + c.astype(jnp.bfloat16))[0].astype(jnp.int32),
                   emb, k=50, reps=20)

    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
