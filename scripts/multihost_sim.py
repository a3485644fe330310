"""Multi-host simulation: N processes x M CPU devices = one global mesh.

Validates the DCN story (SURVEY.md §2.6: multi-host data parallel over DCN,
index sharded over ICI) without TPU pods: each process plays one host, the
jax.distributed runtime provides the cross-process collectives, and the same
train step / distributed search code runs unchanged on the global mesh.

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

    num_item = 255
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
    if host_idx == 0:
        print(f"MULTIHOST_OK hosts={num_hosts} global_devices={n_global} "
              f"loss={loss:.4f}", flush=True)
    jax.distributed.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--port", type=int, default=29517)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.hosts, args.devices_per_host, args.port)
        return

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS",)}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--hosts", str(args.hosts),
         "--devices-per-host", str(args.devices_per_host),
         "--port", str(args.port), "--worker", str(i)],
        env=env) for i in range(args.hosts)]
    codes = [p.wait(timeout=300) for p in procs]
    if any(codes):
        raise SystemExit(f"worker failures: {codes}")


if __name__ == "__main__":
    main()
