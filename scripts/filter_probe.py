"""Decompose the per-hop FILTER cost piece by piece on realistic inputs.

stage_probe.py showed the filter stages dominate the staged search (≈1.4 of
1.8 ms/q at batch 16) and that their cost is data-dependent (L0 hop0 4.6 ms
vs hop1 8.3 ms per call at identical shapes). This probe times filter
variants with single pieces removed, all on the SAME captured mid-search
inputs, to attribute the microseconds.

Usage: python scripts/filter_probe.py [--items 200000] [--batch 16]
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
    ap.add_argument("--hop", type=int, default=1, help="L0 hop to capture")
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search.beam import (NEG_INF, _UNVISITED, LocalBackend,
                                      _pad_trash, level_topn_default)
    from nann_tpu.search.staged import make_staged_searcher

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    scfg.vis_impl = "bytemap"  # probes decompose the byte-map representation
    rng = np.random.default_rng(1)
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))
    ltn = jnp.asarray(level_topn_default(scfg))

    fn = make_staged_searcher(mcfg, scfg, donate_vis=False)
    st = fn.stages
    B, n = args.batch, sidx.item_ids.shape[0]
    start = scfg.hnsw_start_level

    # ---- drive the staged search up to L0 hop<hop>, capturing live inputs
    folded, kpB, vB = st["prep"](params, state, userB)
    res_ids, res_scores = st["enter"](folded, kpB, vB, sidx.item_embs,
                                      sidx.enter_points, ltn[0])
    max_deg = max(v.shape[1] for v in sidx.neighbors.values())
    max_cand = max([scfg.top_k_per_level[start],
                    max(max(scfg.topk_eval), 1)] + list(scfg.top_k_per_level))
    vis = jnp.full((B, n + max_cand * max_deg), _UNVISITED, jnp.uint8)
    captured = None
    t = 1
    hop_no = 1
    for level in range(start - 1, -1, -1):
        cand_ids, cand_scores = res_ids, res_scores
        for hop in range(scfg.num_scoring_per_level[level]):
            salt = jnp.int32((0x1F123BB5 * (hop_no + 1)) & 0x3FFFFFFF)
            if level == 0 and hop == args.hop:
                captured = (sidx.neighbors[level], vis, cand_ids, cand_scores,
                            salt)
                break
            jf = st["filter"][(level, hop == 0)]
            js = st["score"][level]
            fresh, valid, vis, cnt = jf(sidx.neighbors[level], vis, cand_ids,
                                        cand_scores, res_ids, res_scores,
                                        salt)
            res_ids, res_scores, cand_ids, cand_scores = js(
                folded, kpB, vB, sidx.item_embs, fresh, valid, res_ids,
                res_scores, ltn[t])
            hop_no += 1
        if captured:
            break
        t += 1
    neighbors_l, vis, cand_ids, cand_scores, salt = jax.block_until_ready(
        captured)
    epoch = jnp.uint8(0)
    be = LocalBackend()
    f_cap = scfg.frontier_cap

    # ---- filter variants (single query; vmapped below) ------------------
    def make_variant(gather=True, sort1=True, vischeck=True, mark=True,
                     sort2=True):
        def fv(neighbors_l, vis, cand_ids, cand_scores, salt):
            sentinel = n
            valid_cand = cand_scores > NEG_INF
            if gather:
                nb = be.take_rows(neighbors_l, cand_ids, n)
            else:  # fake rows: same shape, no HBM gather
                nb = (cand_ids[:, None] + jnp.arange(
                    neighbors_l.shape[1], dtype=jnp.int32)[None, :]) % n
            nb = jnp.where(valid_cand[:, None], nb, sentinel).reshape(-1)
            fc = min(f_cap, nb.shape[0])
            nb_sorted = jnp.sort(nb) if sort1 else nb
            first = jnp.concatenate(
                [jnp.ones((1,), bool), nb_sorted[1:] != nb_sorted[:-1]])
            if vischeck:
                unvisited = be.vis_unvisited(vis, nb_sorted, epoch, n)
            else:
                unvisited = nb_sorted != sentinel
            keep = first & unvisited & (nb_sorted < n)
            if mark:
                vis = be.vis_mark_sorted(vis, _pad_trash(nb_sorted, keep, n),
                                         epoch, n)
            imax = jnp.int32(2**31 - 1)
            key = jnp.where(keep, nb_sorted ^ salt, imax)
            if sort2:
                fresh_key = jnp.sort(key)[:fc]
            else:
                fresh_key = key[:fc]
            fresh_valid = fresh_key != imax
            fresh = jnp.where(fresh_valid, fresh_key ^ salt, sentinel)
            return fresh, fresh_valid, vis, jnp.sum(keep)
        return jax.jit(jax.vmap(fv, in_axes=(None, 0, 0, 0, None)))

    # ---- representation experiments for the visited map ------------------
    def make_dtype_variant(vdt, sorted_gather=False):
        """Same filter, visited map stored as `vdt` stamps; optionally use
        lax.gather with indices_are_sorted (ids ARE sorted here)."""
        def fv(neighbors_l, vis, cand_ids, cand_scores, salt):
            sentinel = n
            valid_cand = cand_scores > NEG_INF
            nb = be.take_rows(neighbors_l, cand_ids, n)
            nb = jnp.where(valid_cand[:, None], nb, sentinel).reshape(-1)
            fc = min(f_cap, nb.shape[0])
            nb_sorted = jnp.sort(nb)
            first = jnp.concatenate(
                [jnp.ones((1,), bool), nb_sorted[1:] != nb_sorted[:-1]])
            ids_c = jnp.clip(nb_sorted, 0, n)
            if sorted_gather:
                got = jax.lax.gather(
                    vis, ids_c[:, None],
                    jax.lax.GatherDimensionNumbers(
                        offset_dims=(), collapsed_slice_dims=(0,),
                        start_index_map=(0,)),
                    slice_sizes=(1,), indices_are_sorted=True,
                    mode=jax.lax.GatherScatterMode.CLIP)
            else:
                got = jnp.take(vis, ids_c)
            unvisited = got != jnp.asarray(0, vdt)
            keep = first & unvisited & (nb_sorted < n)
            vis = vis.at[_pad_trash(nb_sorted, keep, n)].set(
                jnp.asarray(0, vdt), unique_indices=True)
            imax = jnp.int32(2**31 - 1)
            key = jnp.where(keep, nb_sorted ^ salt, imax)
            fresh_key = jnp.sort(key)[:fc]
            fresh_valid = fresh_key != imax
            fresh = jnp.where(fresh_valid, fresh_key ^ salt, sentinel)
            return fresh, fresh_valid, vis, jnp.sum(keep)
        return jax.jit(jax.vmap(fv, in_axes=(None, 0, 0, 0, None)))

    variants = [
        ("full", {}),
        ("no_nb_gather", dict(gather=False)),
        ("no_sort1", dict(sort1=False)),
        ("no_vis_gather", dict(vischeck=False)),
        ("no_vis_scatter", dict(mark=False)),
        ("no_sort2", dict(sort2=False)),
        ("sorts_only", dict(gather=False, vischeck=False, mark=False)),
        ("bare (no pieces)", dict(gather=False, sort1=False, vischeck=False,
                                  mark=False, sort2=False)),
    ]
    dvariants = [
        ("vis_u8_sortedhint", jnp.uint8, True),
        ("vis_i32", jnp.int32, False),
        ("vis_i32_sortedhint", jnp.int32, True),
    ]
    for name, vdt, sg in dvariants:
        f = make_dtype_variant(vdt, sorted_gather=sg)
        visd = (vis if vdt == jnp.uint8
                else vis.astype(vdt))
        fargs = (neighbors_l, visd, cand_ids, cand_scores, salt)
        jax.block_until_ready(f(*fargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = f(*fargs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name:18s} {ms:8.3f} ms/call  {ms/B*1e3:7.1f} us/q",
              flush=True)

    for name, kw in variants:
        f = make_variant(**kw)
        fargs = (neighbors_l, vis, cand_ids, cand_scores, salt)
        jax.block_until_ready(f(*fargs))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.reps):
            out = f(*fargs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name:18s} {ms:8.3f} ms/call  {ms/B*1e3:7.1f} us/q",
              flush=True)


if __name__ == "__main__":
    main()
