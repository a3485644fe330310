"""Training loop: meters, checkpointing, auto-resume.

Equivalent of the reference driver's train path (NANN_impls/main.py:34-77,
289-301): periodic checkpoint save (every `save_freq` steps and at the end),
auto-resume from the latest checkpoint, moving-average loss/acc meters and
periodic logging. Checkpoints are orbax (the TPU-native Saver), storing params,
batch-norm state, optimizer state, and the step counter.

Runnable on synthetic data:
    python -m nann_tpu.train.loop --steps 200 --out /tmp/nann_run
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..utils import AverageMeter, get_logger
from .dataclasses_io import restore_train_state, save_train_state
from .step import TrainState, create_train_state, make_train_step

logger = get_logger("nann_tpu.train")


def _prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Keep only the newest `keep` checkpoints (tf.train.Saver max_to_keep)."""
    import shutil
    steps = sorted(int(d.split("_")[-1]) for d in os.listdir(ckpt_dir)
                   if d.startswith("step_") and d.split("_")[-1].isdigit())
    for s in steps[:-keep] if len(steps) > keep else []:
        path = os.path.join(ckpt_dir, f"step_{s}")
        shutil.rmtree(path, ignore_errors=True)
        if os.path.exists(path):
            logger.info(f"could not prune checkpoint {path}")


def checkpoint_steps(ckpt_dir: str) -> list:
    """All retained checkpoint steps, ascending (deploy-candidate set for
    select_checkpoint — the reference keeps max_to_keep=50 for the same
    test_all-then-deploy reason, NANN_impls/main.py:289-301)."""
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(int(d.split("_")[-1]) for d in os.listdir(ckpt_dir)
                  if d.startswith("step_") and d.split("_")[-1].isdigit())


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    steps = checkpoint_steps(ckpt_dir)
    return max(steps) if steps else None


def train_loop(mcfg: ModelConfig, tcfg: TrainConfig,
               train_data: Dict[str, np.ndarray],
               item_features: Dict[str, np.ndarray],
               ckpt_dir: Optional[str] = None,
               num_steps: Optional[int] = None,
               mesh=None,
               metrics_path: Optional[str] = None
               ) -> Tuple[TrainState, Dict[str, float]]:
    """Run training; returns (final_state, final_metrics).

    metrics_path: optional JSONL sink for step metrics — the TensorBoard
    scalar summaries of the reference trainer (main.py:69-77) as a flat file
    any dashboard can tail.
    """
    from ..data import BatchIterator

    feats = {k: jnp.asarray(v) for k, v in item_features.items()}
    it = BatchIterator(train_data, tcfg.batch_size, epochs=tcfg.train_epochs,
                       drop_remainder=True, seed=tcfg.seed, mesh=mesh)
    # num_steps is the TOTAL global-step budget; it doubles as the cosine
    # decay horizon (lr_schedule_fn) unless tcfg.lr_total_steps pins one
    total = len(it) if num_steps is None else num_steps
    state, tx = create_train_state(jax.random.PRNGKey(tcfg.seed), mcfg, tcfg,
                                   total_steps=total)
    step_fn = make_train_step(mcfg, tcfg, tx, feats, mesh=mesh)

    start_step = 0
    if ckpt_dir:
        resume = latest_checkpoint_step(ckpt_dir)
        if resume is not None:
            logger.info(f"auto-resuming from {ckpt_dir}/step_{resume}")
            state = restore_train_state(os.path.join(ckpt_dir, f"step_{resume}"),
                                        state)
            start_step = resume

    # a resumed run completes the REMAINING schedule from where it stopped
    # (data position fast-forwarded, not replayed; the optimizer step count —
    # and with it the lr schedule — restores from opt_state)
    if start_step >= total:
        logger.info(f"resume step {start_step} >= budget {total}; nothing to do")
        return state, {}

    meters = {k: AverageMeter(k, ":.4f", moving_average=True)
              for k in ("loss", "loss_xe", "loss_adv", "acc", "acc_origin")}
    bt = AverageMeter("batch_time", ":.3f", moving_average=True)
    data_rng = jax.random.PRNGKey(tcfg.seed + 1)

    tic = time.time()
    metrics_host: Dict[str, float] = {}
    step_idx = start_step
    stepped = False   # did at least one optimizer step run?
    for step_idx, batch in enumerate(it.iter_from(start_step % len(it)),
                                     start=start_step):
        if step_idx >= total:
            break
        stepped = True
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step_fn(state, batch, data_rng)

        if step_idx % tcfg.print_freq == 0 or step_idx + 1 == total:
            metrics_host = {k: float(v) for k, v in metrics.items()}
            for k, m in meters.items():
                m.update(metrics_host[k])
            bt.update(time.time() - tic)
            logger.info(f"[{step_idx}/{total}] " +
                        ", ".join(str(m) for m in meters.values()) +
                        f", {bt}")
            if metrics_path:
                import json
                with open(metrics_path, "a") as f:
                    f.write(json.dumps({"step": step_idx,
                                        "batch_time": bt.val,
                                        **metrics_host}) + "\n")
        tic = time.time()

        if ckpt_dir and (step_idx % tcfg.save_freq == 0
                         or step_idx + 1 == total):
            path = os.path.join(ckpt_dir, f"step_{step_idx + 1}")
            save_train_state(path, state)
            _prune_checkpoints(ckpt_dir, keep=tcfg.max_to_keep)

    # end-of-training save (reference main.py:292). The in-loop condition
    # `step_idx + 1 == total` never fires when the data iterator exhausts
    # BEFORE the step budget (epochs * samples < num_steps), which silently
    # dropped the final — usually best — checkpoint.
    if ckpt_dir and stepped:
        # state.step is the count of executed optimizer steps — correct both
        # when the loop broke on the budget (step_idx overshot by 1) and when
        # the iterator exhausted early
        final = os.path.join(ckpt_dir, f"step_{int(state.step)}")
        if not os.path.exists(final):
            save_train_state(final, state)
            _prune_checkpoints(ckpt_dir, keep=tcfg.max_to_keep)

    if not metrics_host:
        metrics_host = {k: float("nan") for k in meters}
    return state, metrics_host


def _main():
    import argparse

    from ..data import synthetic_dataset

    p = argparse.ArgumentParser("nann_tpu synthetic training demo")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--num-item", type=int, default=2000)
    p.add_argument("--num-neg", type=int, default=20)
    args = p.parse_args()

    train, _test, feats = synthetic_dataset(num_item=args.num_item,
                                            num_users=800, max_seq_length=20)
    mcfg = ModelConfig(num_item=args.num_item, num_cate=50,
                       max_seq_length=20)
    tcfg = TrainConfig(batch_size=args.batch_size, num_neg=args.num_neg,
                       train_epochs=50, print_freq=10, save_freq=max(args.steps // 2, 1))
    state, metrics = train_loop(mcfg, tcfg, train, feats,
                                ckpt_dir=args.out, num_steps=args.steps)
    logger.info(f"final metrics: {metrics}")


if __name__ == "__main__":
    _main()
