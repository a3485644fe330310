#!/usr/bin/env python
"""nann_tpu benchmark: model-scored HNSW retrieval throughput on one chip.

Measures the serving compute path (the fused beam-search program) at the
reference demo's model scale (emb_dim 32, seq len 50, item emb 64; search
budget level_topn=[100,200,400,400,400,200] — NANN_impls/nann/benchmark/
gen_runmeta.py:24) over a synthetic item corpus, and prints ONE JSON line:

  {"metric": "search_qps_per_chip", "value": <batched QPS>,
   "unit": "queries/s", "vs_baseline": <ratio vs bench_baseline.json>, ...}

vs_baseline compares against the committed bench_baseline.json (the first
recorded TPU measurement — the reference repo publishes no numbers, see
BASELINE.md). Index build artifacts and XLA compilations are cached on disk
(.bench_cache/, .jax_cache/) so repeat runs measure steady state.

Usage: python bench.py [--quick] [--items N] [--batch B]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# persistent XLA compile cache (the reference's PTX/CUBIN-cache equivalent,
# SURVEY.md §1 L0)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nann_tpu.config import ModelConfig, SearchConfig  # noqa: E402
from nann_tpu.index import build_and_save_index, load_index  # noqa: E402
from nann_tpu.models import init_scorer  # noqa: E402
from nann_tpu.search import SearchIndex, make_searcher  # noqa: E402
from nann_tpu.search.beam import level_topn_default  # noqa: E402


def build_setup(num_items: int, seed: int = 0, reorder: str = None,
                dtype=None):
    mcfg = ModelConfig(num_item=num_items, num_cate=1000, emb_dim=32,
                       max_seq_length=50, compute_dtype="bfloat16")
    from nann_tpu.config import default_frontier_cap
    scfg = SearchConfig(  # reference defaults: levels (3,1,1), topk (400,200,100)
        vis_impl=os.environ.get("NANN_BENCH_VIS", "list"),
        mark_policy=os.environ.get("NANN_BENCH_MARK", "scored"),
        # catalogue-aware cap: 4096 <= 2M items, 8192 beyond — the bench
        # measures qps at the setting that actually delivers the recall
        frontier_cap=int(os.environ.get("NANN_BENCH_FCAP", 0))
        or default_frontier_cap(num_items),
        # per-hop capacities, e.g. NANN_BENCH_FCAP_HOPS=4096,8192,8192,8192
        frontier_cap_per_hop=tuple(
            int(x) for x in os.environ["NANN_BENCH_FCAP_HOPS"].split(","))
        if os.environ.get("NANN_BENCH_FCAP_HOPS") else None)
    params, state = init_scorer(jax.random.PRNGKey(seed), mcfg)

    rng = np.random.default_rng(seed)
    item_embs = rng.standard_normal((num_items, mcfg.item_emb_dim)).astype(
        np.float32)
    item_ids = np.arange(1, num_items + 1, dtype=np.int32)

    key = hashlib.md5(f"{num_items}-{seed}-M32".encode()).hexdigest()[:12]
    cache_dir = os.path.join(REPO, ".bench_cache", key)
    if not os.path.exists(os.path.join(cache_dir, "enter_points.npy")):
        t0 = time.time()
        build_and_save_index(item_embs, start_level=scfg.hnsw_start_level,
                             num_neighbors=32, output_dir=cache_dir,
                             ef_construction=100, seed=seed)
        print(f"# index build: {time.time() - t0:.1f}s", file=sys.stderr)
    art = load_index(cache_dir, start_level=scfg.hnsw_start_level,
                     max_degree=64)
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids,
                                      dtype=dtype or jnp.bfloat16,
                                      reorder=reorder)
    return mcfg, scfg, params, state, sidx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int,
                    default=int(os.environ.get("NANN_BENCH_ITEMS", 200_000)))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=150,
                    help="pipelined timing reps; the per-dispatch relay "
                         "overhead (~0.7 ms) amortizes over the window, so "
                         "more reps converge on steady-state device qps")
    ap.add_argument("--quick", action="store_true",
                    help="small corpus / few reps (smoke run)")
    ap.add_argument("--sweep", action="store_true",
                    help="also measure a batch-size sweep")
    ap.add_argument("--recall", action="store_true",
                    help="also measure recall@100 vs the brute-force oracle")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of the measured "
                         "section into DIR (tracing parity, SURVEY §5.1; "
                         "needs a directly-attached TPU)")
    ap.add_argument("--cost", action="store_true",
                    help="report the XLA cost analysis of the batched "
                         "program (FLOPs, HBM bytes, kernel census) — the "
                         "relay-safe profiling path (utils/trace.py)")
    ap.add_argument("--autotune-caps", action="store_true",
                    help="profile per-hop scored maxima on 64 probe queries "
                         "and re-compile the search with per-hop frontier "
                         "caps (search/autotune.py) — sheds the padding a "
                         "single scalar cap costs on the cheap hops")
    ap.add_argument("--reorder", default=None, choices=[None, "bfs"],
                    help="relabel nodes for gather locality (index/reorder.py)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"],
                    help="index embedding storage (int8 = packed symmetric "
                         "per-row quantization, index/quantize.py)")
    ap.add_argument("--chained", type=int, default=None, metavar="N",
                    help="also measure device-true single-query latency by "
                         "chaining N searches inside one program (immune to "
                         "host/relay dispatch overhead; costs one compile). "
                         "Default: 20 on a TPU backend, off on CPU — the "
                         "dispatch-pipelined qps is tunnel-bandwidth-capped "
                         "through a relay, so the driver artifact must carry "
                         "the device-true numbers (docs/DESIGN.md round 3)")
    args = ap.parse_args()
    if args.quick:
        args.items = min(args.items, 20_000)
        args.reps = 10

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    if args.chained is None:
        args.chained = 0 if (args.quick
                             or jax.devices()[0].platform == "cpu") else 20
    mcfg, scfg, params, state, sidx = build_setup(
        args.items, reorder=args.reorder,
        dtype="int8" if args.dtype == "int8" else jnp.bfloat16)

    if args.autotune_caps:
        from nann_tpu.search.autotune import autotune_hop_caps
        probe = np.random.default_rng(7).standard_normal(
            (64, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32)
        t0 = time.time()
        scfg = autotune_hop_caps(mcfg, scfg, params, state, sidx, probe)
        print(f"# autotuned per-hop caps: {scfg.frontier_cap_per_hop} "
              f"({time.time() - t0:.1f}s)", file=sys.stderr)

    searcher = make_searcher(mcfg, scfg)
    search1 = jax.jit(searcher)
    searchB = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))

    rng = np.random.default_rng(1)
    ltn = jnp.asarray(level_topn_default(scfg))
    user1 = jnp.asarray(rng.standard_normal(
        (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))

    # warmup / compile
    t0 = time.time()
    out = search1(params, state, sidx, user1, ltn)
    jax.block_until_ready(out)
    print(f"# single-query compile+first run: {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    outB = searchB(params, state, sidx, userB, ltn)
    jax.block_until_ready(outB)
    print(f"# batched compile+first run: {time.time() - t0:.1f}s",
          file=sys.stderr)

    # Per-call host sync over the axon relay costs ~30 ms regardless of the
    # program (a tunnel artifact — a trivial x+1 pays the same), so blocked
    # timing measures the harness, not the chip. Single-query latency is
    # therefore estimated from pipelined dispatch (launch reps back-to-back,
    # block once): wall/reps = device time per query, the number a local
    # (non-tunneled) deployment would see per request.
    sync0 = time.perf_counter()
    jax.block_until_ready(search1(params, state, sidx, user1, ltn))
    host_sync_ms = (time.perf_counter() - sync0) * 1e3

    # the pipelined timing discipline lives in utils/trace.py (shared with
    # the scripts/ probes — one copy, no drift)
    from nann_tpu.utils.trace import timed as _timed

    def pipelined_ms(fn, *fargs, reps=args.reps):
        return _timed(fn, *fargs, reps=reps)

    if args.profile:
        with jax.profiler.trace(args.profile):
            lat1_ms = pipelined_ms(search1, params, state, sidx, user1, ltn)
        print(f"# profiler trace written to {args.profile}", file=sys.stderr)
    else:
        lat1_ms = pipelined_ms(search1, params, state, sidx, user1, ltn)

    # batched throughput (back-to-back async dispatch)
    n_iters = max(args.reps, 10)
    jax.block_until_ready(searchB(params, state, sidx, userB, ltn))
    t0 = time.perf_counter()
    last = None
    for _ in range(n_iters):
        last = searchB(params, state, sidx, userB, ltn)
    jax.block_until_ready(last)
    wall = time.perf_counter() - t0
    qps = args.batch * n_iters / wall

    num_scoring = int(np.asarray(out[2]).sum())

    extras = {}
    if args.chained:
        # N data-dependent searches in ONE program: each iteration perturbs
        # the user embedding by a hash of the previous result, so XLA cannot
        # collapse the loop — wall/N is pure device time per query.
        N = args.chained

        @jax.jit
        def chained(params, state, sidx, user, ltn):
            def body(_i, carry):
                u = user + carry * 1e-12
                _items, scores, _ns = searcher(params, state, sidx, u, ltn)
                return scores[0]
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        jax.block_until_ready(chained(params, state, sidx, user1, ltn))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(params, state, sidx, user1, ltn))
        dev_ms = (time.perf_counter() - t0) / N * 1e3
        extras["device_latency_ms_per_query"] = round(dev_ms, 3)
        print(f"# chained device latency: {dev_ms:.3f} ms/query",
              file=sys.stderr)

        # device-true BATCHED throughput: chain the batched program on
        # device. The dispatch-pipelined qps above is capped by the relay
        # tunnel's ~30-45 MB/s input bandwidth at batch>=16 (each dispatch
        # ships batch x L x d x 4B of user embeddings) — this one ships ONE
        # batch and loops on-chip, so wall/N is what a locally-attached
        # deployment gets per batch.
        @jax.jit
        def chainedB(params, state, sidx, users, ltn):
            def body(_i, carry):
                u = users + carry * 1e-12
                _it, sc, _ns = searchB_inner(params, state, sidx, u, ltn)
                return sc[:, 0].sum()
            return jax.lax.fori_loop(0, N, body, jnp.float32(0.0))

        searchB_inner = jax.vmap(searcher,
                                 in_axes=(None, None, None, 0, None))
        jax.block_until_ready(chainedB(params, state, sidx, userB, ltn))
        t0 = time.perf_counter()
        jax.block_until_ready(chainedB(params, state, sidx, userB, ltn))
        devB_ms = (time.perf_counter() - t0) / N * 1e3
        extras[f"device_qps_at_batch_{args.batch}"] = round(
            args.batch / devB_ms * 1e3, 1)
        print(f"# chained batched: {devB_ms:.3f} ms/batch = "
              f"{extras[f'device_qps_at_batch_{args.batch}']} qps "
              f"device-true", file=sys.stderr)
        # tunnel input-bandwidth the dispatch-pipelined loop was pushing —
        # when this is near the tunnel's ceiling, `value` measures the
        # transport, not the chip (device_qps_* is the chip)
        inp_mb = userB.size * 4 / 1e6
        extras["dispatch_input_mbps"] = round(qps / args.batch * inp_mb, 1)

    if args.cost:
        from nann_tpu.utils.trace import compiled_cost
        ca = compiled_cost(searchB, params, state, sidx, userB, ltn)
        # compiled_cost omits keys the backend doesn't report (never NaN —
        # json.dumps would break the one-line driver contract)
        for k_src, k_dst in (("flops", "xla_flops_per_batch"),
                             ("bytes_accessed", "xla_bytes_per_batch"),
                             ("entry_ops", "xla_entry_ops")):
            if ca.get(k_src) is not None:
                extras[k_dst] = ca[k_src]
        if ca.get("bytes_accessed") and qps:
            extras["effective_hbm_gbps"] = round(
                ca["bytes_accessed"] * (qps / args.batch) / 1e9, 1)
        print(f"# cost: {ca}", file=sys.stderr)

    if not args.quick and args.batch != 64:
        # the throughput-optimal operating point (batch-16 stays the headline
        # `value` for baseline comparability; the reference bench harness is
        # likewise unbounded-batch throughput-oriented, gen_benchmark_conf.py)
        user64 = jnp.asarray(rng.standard_normal(
            (64, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
        f64 = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))
        t_ms = pipelined_ms(f64, params, state, sidx, user64, ltn,
                            reps=max(args.reps // 2, 5))
        extras["qps_at_batch_64"] = round(64 / t_ms * 1e3, 1)
        print(f"# batch-64 qps: {extras['qps_at_batch_64']}", file=sys.stderr)

    # reference demo scale (4.2M items, convert_UB_to_tfrecord.py): measured
    # whenever the prebuilt index cache exists so the driver artifact carries
    # qps at the scale the reference actually ships. int8 storage = the
    # at-scale default (halves index HBM; parity-tested, tests/test_quantize)
    ref_key = hashlib.md5("4200000-0-M32".encode()).hexdigest()[:12]
    if (not args.quick and args.items != 4_200_000
            and jax.devices()[0].platform != "cpu"  # meaningless + minutes-
            # slow on a CPU backend (the contract test runs bench.py on CPU)
            and os.path.exists(os.path.join(
                REPO, ".bench_cache", ref_key, "enter_points.npy"))):
        mcfg4, scfg4, params4, state4, sidx4 = build_setup(
            4_200_000, dtype="int8")
        f4 = jax.jit(jax.vmap(make_searcher(mcfg4, scfg4),
                              in_axes=(None, None, None, 0, None)))
        user4 = jnp.asarray(rng.standard_normal(
            (64, mcfg4.max_seq_length, mcfg4.user_emb_dim)).astype(np.float32))
        t_ms = pipelined_ms(f4, params4, state4, sidx4, user4, ltn,
                            reps=max(args.reps // 3, 5))
        extras["qps_at_reference_scale"] = round(64 / t_ms * 1e3, 1)
        extras["reference_scale_items"] = 4_200_000
        # the at-scale sub-bench runs its own catalogue-aware cap (8192
        # above 2M items since round 4 — the r3->r4 1,932->1,361 delta was
        # this, unannotated); carry it so the number is attributable
        extras["reference_scale_frontier_cap"] = scfg4.frontier_cap
        extras["reference_scale_dtype"] = "int8"
        print(f"# 4.2M-item int8 batch-64 qps: "
              f"{extras['qps_at_reference_scale']}", file=sys.stderr)
        del params4, state4, sidx4

    if args.sweep:
        for b in (4, 32):
            userS = jnp.asarray(rng.standard_normal(
                (b, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
            fS = jax.jit(jax.vmap(searcher,
                                  in_axes=(None, None, None, 0, None)))
            t_ms = pipelined_ms(fS, params, state, sidx, userS, ltn,
                                reps=max(args.reps // 2, 5))
            extras[f"qps_at_batch_{b}"] = round(b / t_ms * 1e3, 1)
        print(f"# sweep: {extras}", file=sys.stderr)

    if args.recall:
        from nann_tpu.search import brute_force_topk
        nq = 8
        userR = jnp.asarray(rng.standard_normal(
            (nq, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32))
        fR = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))
        top_items, _s, _n = fR(params, state, sidx, userR, ltn)
        bf_idx, _ = brute_force_topk(params, state, mcfg, userR,
                                     sidx.item_embs.astype(jnp.float32),
                                     k=100)
        bf_items = np.asarray(sidx.item_ids)[np.asarray(bf_idx)]
        recalls = []
        for u in range(nq):
            got = np.asarray(top_items[u])
            got = set(got[got >= 0].tolist())
            want = set(bf_items[u].tolist())
            recalls.append(len(got & want) / len(want))
        # NOTE: the bench uses a RANDOM scorer over a RANDOM corpus, so graph
        # proximity (L2) correlates weakly with DNN scores — this is a lower
        # bound. Trained checkpoints reach ~94% of the oracle (see the
        # `parity` job); this field only tracks bench-config regressions.
        extras["recall_at_100_vs_oracle_untrained"] = round(
            float(np.mean(recalls)), 4)
        print(f"# recall (untrained lower bound): "
              f"{extras['recall_at_100_vs_oracle_untrained']}",
              file=sys.stderr)

    # Real request-latency DISTRIBUTION through the serving engine (the
    # reference reports histograms, metrics.cc:24-61; a pipelined mean is not
    # a percentile). >= 200 per-request wall-clock samples at ~70% of the
    # measured throughput (a saturated queue would measure queueing policy,
    # not service latency). Includes host dispatch+sync — on the CI relay
    # that adds ~30 ms/request flat; host_sync_overhead_ms quantifies it.
    if not args.quick:
        from nann_tpu.serving import (Engine, EngineConfig, LoadGenConfig,
                                      run_load_test)
        # the ladder spans both the chip's program-level operating point
        # (64-128) and the transport optimum (16 through the relay); the
        # engine CALIBRATES which bucket serves — per-bucket pipelined qps
        # measured at startup, fastest wins (serving/engine.py _calibrate)
        buckets = tuple(sorted({1, args.batch, 64, 128}))
        eng = Engine(mcfg, scfg, params, state, sidx,
                     EngineConfig(batch_buckets=buckets, wait_ms=2.0,
                                  calibrate=True))
        extras["engine_calibration"] = eng.calibration_source

        def _drain(timeout=15.0):
            t_end = time.perf_counter() + timeout
            while eng.depth() and time.perf_counter() < t_end:
                time.sleep(0.01)

        # Validate the calibrated bucket with a paced run before accepting
        # it; on instability STEP DOWN to the next-fastest bucket instead of
        # re-pacing the same bucket toward zero (round-4 regression: the
        # re-pacing fallback accepted 534 qps at B=128 with p99 2.2 s while
        # B=16 could hold ~1,900). Each attempt paces at 70% of the
        # candidate's own calibrated capacity so percentiles measure service
        # latency, not queue growth.
        order = sorted(eng.bucket_qps, key=eng.bucket_qps.get, reverse=True)
        attempts = []
        accepted = None
        P99_BUDGET_MS = 200.0  # latency gate: a stable-throughput run whose
        # p99 exceeds this is queueing (70% of an M/D/1-ish server through a
        # 30 ms relay bursts); back off to 55% of capacity before accepting
        FRACS = (0.7, 0.55, 0.4)
        for serve_b in order[:3]:
            if eng.bucket_qps[serve_b] < 50 and attempts:
                continue  # not worth a paced attempt unless nothing ran yet
            for fi, frac in enumerate(FRACS):
                eng._serve_cap = serve_b
                target_qps = max(frac * eng.bucket_qps[serve_b], 20.0)
                # Match the micro-batch window to the paced rate: saturated
                # calibration forms full batches (deep queue), but at 70%
                # load a short window dispatches tiny batches whose per-batch
                # host sync (~31 ms through the CI relay) collapses capacity
                # below the paced rate. Half-bucket window at the target rate
                # keeps batches big enough to amortize the sync.
                eng.config.wait_ms = min(200.0, max(
                    2.0, 1e3 * serve_b / (2.0 * target_qps)))
                _drain()
                eng.metrics.latency_us = type(eng.metrics.latency_us)()
                # ^ drop calibration / prior-attempt samples
                res = run_load_test(
                    eng, LoadGenConfig(duration_s=8.0, qps=target_qps),
                    verbose=False)
                snap = (serve_b, target_qps, res,
                        eng.metrics.latency_us.snapshot())
                stable = res["qps"] >= 0.85 * target_qps
                if stable:
                    attempts.append(snap)
                    if snap[3]["p99"] / 1e3 <= P99_BUDGET_MS:
                        accepted = snap
                        break
                    print(f"# paced run stable at B={serve_b} but p99="
                          f"{snap[3]['p99']/1e3:.0f} ms > {P99_BUDGET_MS:.0f}"
                          f" — backing off pacing", file=sys.stderr)
                else:
                    attempts.append(snap)
                    # lower pacing CAN fix instability when the served rate
                    # already covers the next-lower target (the bottleneck is
                    # the pace, e.g. host-side feeder contention, not the
                    # engine) — seen live when a concurrent HNSW build starved
                    # the producer threads and all 3 buckets failed at 70%
                    nxt = FRACS[fi + 1] if fi + 1 < len(FRACS) else None
                    if (nxt is not None and res["qps"] >=
                            0.85 * nxt * eng.bucket_qps[serve_b]):
                        print(f"# paced run unstable at B={serve_b} (served "
                              f"{res['qps']:.0f} of {target_qps:.0f}) — "
                              f"served rate covers the {nxt:.0%} target; "
                              f"backing off pacing", file=sys.stderr)
                        continue
                    print(f"# paced run unstable at B={serve_b} (served "
                          f"{res['qps']:.0f} of {target_qps:.0f} target) — "
                          f"stepping down a bucket", file=sys.stderr)
                    break  # next bucket; lower pacing won't fix this one
            if accepted is not None:
                break
        if accepted is None and attempts:
            # prefer the best stable attempt (highest qps among those that
            # held ≥85% of target), even if its p99 missed the budget
            stable_attempts = [a for a in attempts
                               if a[2]["qps"] >= 0.85 * a[1]]
            if stable_attempts:
                accepted = max(stable_attempts, key=lambda a: a[2]["qps"])
        if accepted is None and attempts:
            # no candidate held 85% of its target: report the best-served
            # attempt LOUDLY flagged — its percentiles measure queue
            # residence under overload, not service latency (ADVICE r4)
            accepted = max(attempts, key=lambda a: a[2]["qps"])
            extras["engine_paced_unstable"] = True
        serve_b, target_qps, res, lat = accepted
        extras["engine_serve_bucket"] = serve_b
        extras["engine_paced_target_qps"] = round(target_qps, 1)
        # transport-window fingerprint: the calibration medians say whether a
        # cross-round engine_qps delta is the engine or the relay's mood
        extras["engine_calibration_qps"] = {
            str(b): round(q, 1) for b, q in sorted(eng.bucket_qps.items())}
        if lat["count"] and lat["p99"] / 1e3 > P99_BUDGET_MS:
            extras["engine_p99_over_budget_ms"] = P99_BUDGET_MS
        dev = eng.metrics.device_us.snapshot()
        eng.shutdown()
        if dev["count"] >= 10:
            # transport-independent per-batch device time (relay RTT paid
            # once per drain) — the regression-sensitive engine metric
            extras["engine_device_ms_p50_per_batch"] = round(dev["p50"] / 1e3, 3)
            extras["engine_device_ms_p99_per_batch"] = round(dev["p99"] / 1e3, 3)
        if lat["count"] >= 200:
            extras["latency_ms_p50"] = round(lat["p50"] / 1e3, 3)
            extras["latency_ms_p95"] = round(lat["p95"] / 1e3, 3)
            extras["latency_ms_p99"] = round(lat["p99"] / 1e3, 3)
            extras["latency_samples"] = int(lat["count"])
            extras["engine_qps"] = round(res["qps"], 1)
            print(f"# engine latency ({lat['count']} samples @ "
                  f"{res['qps']:.0f} qps): p50={lat['p50']/1e3:.2f} "
                  f"p95={lat['p95']/1e3:.2f} p99={lat['p99']/1e3:.2f} ms",
                  file=sys.stderr)
        else:
            print(f"# engine latency run too small ({lat['count']} samples) "
                  f"— omitting percentiles", file=sys.stderr)

    baseline_path = os.path.join(REPO, "bench_baseline.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = qps / base["value"]

    print(json.dumps({
        "metric": "search_qps_per_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(vs_baseline, 3),
        # pipelined device-time estimate (NOT a percentile; see
        # latency_ms_p50/p95/p99 for the measured distribution)
        "latency_ms_per_query": round(float(lat1_ms), 3),
        "host_sync_overhead_ms": round(float(host_sync_ms), 3),
        "batch": args.batch,
        "num_items": args.items,
        "num_scoring_per_query": num_scoring,
        "device": str(jax.devices()[0]),
        # config fingerprint: cross-round deltas must be attributable to
        # config vs perf at a glance (round-4 lesson: the catalogue-aware
        # frontier_cap default changed 4.2M qps with no annotation)
        "frontier_cap": scfg.frontier_cap,
        "frontier_cap_per_hop": list(scfg.frontier_cap_per_hop or ()) or None,
        "vis_impl": scfg.vis_impl,
        "mark_policy": scfg.mark_policy,
        "index_dtype": args.dtype,
        "checkpoint": "random-init (synthetic bench)",
        **extras,
    }))


if __name__ == "__main__":
    main()
