"""Multi-host simulation: N processes x M CPU devices = one global mesh.

Validates the DCN story (SURVEY.md §2.6: multi-host data parallel over DCN,
index sharded over ICI) without TPU pods: each process plays one host, the
jax.distributed runtime provides the cross-process collectives, and the same
train step / distributed search code runs unchanged on the global mesh.

Covers BOTH production paths cross-process:
  1. DP training step over the ("dp","mp") mesh (grad psum over DCN);
  2. distributed row-sharded SEARCH (mp = index shards within a host,
     dp = query-batch shards across hosts — the serving scale-out layout),
     verified equal to a single-process local search on the same inputs,
     plus a lockstep throughput number vs the 1-host mp-only mesh.

Usage (self-orchestrating — spawns the worker processes):
    python scripts/multihost_sim.py [--hosts 2] [--devices-per-host 4]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(host_idx: int, num_hosts: int, devices_per_host: int,
           port: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{devices_per_host}").strip()
    import jax

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_hosts,
                               process_id=host_idx)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from nann_tpu.config import ModelConfig, TrainConfig
    from nann_tpu.data import synthetic_dataset
    from nann_tpu.parallel import make_mesh
    from nann_tpu.train import create_train_state, make_train_step

    n_global = num_hosts * devices_per_host
    mesh = make_mesh(dp=n_global, mp=1)
    assert len(jax.devices()) == n_global, len(jax.devices())

    # --efficiency runs a compute-dominated shape (otherwise per-dispatch
    # overhead + localhost collective latency dominate and weak scaling
    # measures the harness, not the sharded search)
    scale = os.environ.get("NANN_MH_SCALE") == "1"
    num_item = 16001 if scale else 255
    mcfg = ModelConfig(num_item=num_item, num_cate=10, emb_dim=8,
                       max_seq_length=6, item_tower_dims=(16, 16, 16),
                       head_dims=(16, 8, 8, 1))
    tcfg = TrainConfig(batch_size=2 * n_global, num_neg=1, adv_eps=1e-4)
    train, _t, feats = synthetic_dataset(num_item=num_item, num_cate=10,
                                         num_users=4 * n_global,
                                         max_seq_length=6, seed=0)
    featsj = {k: jnp.asarray(v) for k, v in feats.items()}
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx, featsj, mesh=mesh)

    # every host feeds its shard of the global batch via make_array_from_process_local_data
    from jax.sharding import NamedSharding, PartitionSpec as P
    batch_np = {k: v[:tcfg.batch_size] for k, v in train.items()}
    batch = {}
    for k, v in batch_np.items():
        sharding = NamedSharding(mesh, P("dp", *([None] * (v.ndim - 1))))
        batch[k] = jax.make_array_from_process_local_data(sharding, v)

    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])

    # ---- cross-process distributed search (VERDICT r1 item 4) ----
    import tempfile
    import time

    from nann_tpu.config import SearchConfig
    from nann_tpu.delivery import extract_item_embeddings
    from nann_tpu.index import build_and_save_index, load_index
    from nann_tpu.search import SearchIndex, make_searcher
    from nann_tpu.search.beam import level_topn_default
    from nann_tpu.search.distributed import make_distributed_searcher
    from jax.sharding import NamedSharding

    scfg = SearchConfig(top_k_per_level=(200, 100, 50), topk_eval=(100,),
                        frontier_cap=1024) if scale else \
        SearchConfig(top_k_per_level=(32, 16, 8), topk_eval=(32,),
                     frontier_cap=128)
    # identical deterministic index on every host (same ckpt-free params)
    item_ids, item_embs = extract_item_embeddings(
        state.params, state.bn_state, mcfg, feats)
    pad = (-len(item_ids)) % n_global          # rows must divide mp
    if pad:
        item_ids = np.concatenate([item_ids, item_ids[:pad]])
        item_embs = np.concatenate([item_embs, item_embs[:pad]])
    idx_dir = os.path.join(
        tempfile.gettempdir(),
        f"nann_mh_idx_{num_hosts}x{devices_per_host}_{num_item}")
    # host 0 builds, then drops a sentinel LAST; the other hosts key on the
    # sentinel, not on any artifact file (enter_points.npy can land before
    # the level CSRs — keying on it raced a reader into a half-written dir)
    done_marker = os.path.join(idx_dir, "BUILD_DONE")
    if host_idx == 0 and not os.path.exists(done_marker):
        build_and_save_index(item_embs, scfg.hnsw_start_level, 8, idx_dir,
                             ef_construction=40, seed=0)
        with open(done_marker, "w") as f:
            f.write("ok")
    for _ in range(6000):   # the at-scale build takes tens of seconds
        if os.path.exists(done_marker):
            break
        time.sleep(0.1)
    art = load_index(idx_dir, scfg.hnsw_start_level, max_degree=16)
    sidx_local = SearchIndex.from_artifacts(art, item_embs, item_ids)

    B = (32 if scale else 2) * n_global   # per-host batch constant (weak scaling)
    rng = np.random.default_rng(7)
    users = rng.standard_normal(
        (B, mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float32)
    ltn = np.asarray(level_topn_default(scfg))

    # single-device local reference (deterministic, same on every host)
    local = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                             in_axes=(None, None, None, 0, None)))
    ref_items, ref_scores, _ = local(state.params, state.bn_state, sidx_local,
                                     jnp.asarray(users), jnp.asarray(ltn))
    ref_items = np.asarray(ref_items)

    # the serving mesh: dp = hosts (queries over DCN), mp = per-host devices
    # (index shards over "ICI")
    mesh2 = make_mesh(dp=num_hosts, mp=devices_per_host)

    # global placement: index row-sharded over mp, queries sharded over dp
    def put_global(x, spec):
        sh = NamedSharding(mesh2, spec)
        return jax.make_array_from_callback(x.shape, sh, lambda i: x[i])

    from jax.sharding import PartitionSpec as P
    sidx_g = SearchIndex(
        item_embs=put_global(np.asarray(sidx_local.item_embs), P("mp", None)),
        item_ids=put_global(np.asarray(sidx_local.item_ids), P("mp")),
        enter_points=put_global(np.asarray(sidx_local.enter_points), P()),
        neighbors={l: put_global(np.asarray(v), P("mp", None))
                   for l, v in sidx_local.neighbors.items()})
    users_g = put_global(users, P("dp", None, None))

    dist = jax.jit(make_distributed_searcher(
        mcfg, scfg, mesh2, axis="mp", batch=B, batch_axis="dp"))
    got = dist(state.params, state.bn_state, sidx_g, users_g,
               jnp.asarray(ltn))
    # each process validates the dp slices it owns; together the asserts
    # cover the full batch (no cross-process gather needed)
    search_ok = True
    checked = 0
    for shard in got[0].addressable_shards:
        want = ref_items[shard.index]
        search_ok &= np.array_equal(np.asarray(shard.data), want)
        checked += shard.data.shape[0]
    assert checked >= B // num_hosts, checked

    # lockstep throughput (every process dispatches the same program)
    reps = 10
    jax.block_until_ready(dist(state.params, state.bn_state, sidx_g, users_g,
                               jnp.asarray(ltn)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = dist(state.params, state.bn_state, sidx_g, users_g,
                   jnp.asarray(ltn))
    jax.block_until_ready(out)
    qps = B * reps / (time.perf_counter() - t0)

    if host_idx == 0:
        print(f"MULTIHOST_OK hosts={num_hosts} global_devices={n_global} "
              f"loss={loss:.4f} search_parity={'ok' if search_ok else 'FAIL'} "
              f"mesh=dp{num_hosts}xmp{devices_per_host} "
              f"search_qps={qps:.1f} batch={B}", flush=True)
        out_json = os.environ.get("NANN_MH_JSON")
        if out_json:
            import json
            with open(out_json, "w") as f:
                json.dump({"hosts": num_hosts,
                           "devices_per_host": devices_per_host,
                           "global_devices": n_global, "batch": B,
                           "search_qps": round(qps, 1),
                           "search_parity": bool(search_ok)}, f)
    assert search_ok, "distributed search != local reference"
    jax.distributed.shutdown()


def _run(hosts: int, devices_per_host: int, port: int,
         json_out: str = "") -> None:
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    if json_out:
        env["NANN_MH_JSON"] = json_out
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--hosts", str(hosts),
         "--devices-per-host", str(devices_per_host),
         "--port", str(port), "--worker", str(i)],
        env=env) for i in range(hosts)]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f"worker failures: {codes}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--port", type=int, default=29517)
    ap.add_argument("--efficiency", action="store_true",
                    help="measure WEAK-scaling efficiency of the row-sharded "
                         "serving search: per-host batch constant, "
                         "eff = qps(N hosts) / (N * qps(1 host)). Writes "
                         "runs/multihost_eff.json (BASELINE target #3).")
    ap.add_argument("--hosts-list", type=int, nargs="+", default=None,
                    help="--efficiency: host counts to ladder (default: "
                         "1 and --hosts)")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.hosts, args.devices_per_host, args.port)
        return

    if args.efficiency:
        import json
        import multiprocessing
        import tempfile
        hosts_list = args.hosts_list or [1, args.hosts]
        rows = []
        for h in hosts_list:
            out = os.path.join(tempfile.gettempdir(), f"nann_mh_{h}.json")
            if os.path.exists(out):
                os.remove(out)
            os.environ["NANN_MH_SCALE"] = "1"
            _run(h, args.devices_per_host, args.port + h, json_out=out)
            with open(out) as f:
                rows.append(json.load(f))
        q1 = rows[0]["search_qps"]
        effs = {r["hosts"]: round(r["search_qps"] / (r["hosts"] * q1), 3)
                for r in rows}
        result = {"rows": rows, "hosts_list": hosts_list,
                  "weak_scaling_efficiency": effs,
                  "physical_cores": multiprocessing.cpu_count(),
                  "note": "CPU-process simulation: hosts are processes on "
                          "one box sharing its cores, collectives ride "
                          "jax.distributed over localhost — a DCN-semantics "
                          "check with contention noise, not ICI hardware. "
                          "Rows where hosts*devices_per_host exceeds the "
                          "physical cores are bounded by core "
                          "oversubscription, not by the sharded search."}
        # committed evidence, not runs/ (the gitignore swallowed round-4's
        # copy and left DESIGN citing a file that wasn't in the tree)
        out_dir = os.path.join(REPO, "docs", "measurements")
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "multihost_eff.json"), "w") as f:
            json.dump(result, f, indent=1)
        print(f"MULTIHOST_EFF hosts={hosts_list} "
              f"qps={[r['search_qps'] for r in rows]} "
              f"efficiency={effs}", flush=True)
        return

    _run(args.hosts, args.devices_per_host, args.port)


if __name__ == "__main__":
    main()
