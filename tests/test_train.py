"""Training-step tests: loss decreases, FGSM is active, DP sharding matches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, TrainConfig
from nann_tpu.data import BatchIterator, synthetic_dataset
from nann_tpu.train import create_train_state, make_train_step
from nann_tpu.train.objective import build_targets, nann_loss


@pytest.fixture(scope="module")
def setup():
    mcfg = ModelConfig(num_item=300, num_cate=20, emb_dim=8,
                       max_seq_length=10,
                       item_tower_dims=(16, 16, 16), head_dims=(32, 16, 8, 1))
    tcfg = TrainConfig(batch_size=32, num_neg=8, learning_rate=1e-3,
                       adv_eps=1e-3)
    train, test, feats = synthetic_dataset(num_item=300, num_cate=20,
                                           num_users=100, max_seq_length=10,
                                           samples_per_user=3)
    feats = {k: jnp.asarray(v) for k, v in feats.items()}
    return mcfg, tcfg, train, feats


def _first_batch(train, n=32):
    return {k: jnp.asarray(v[:n]) for k, v in train.items()}


def test_loss_finite_and_metrics(setup):
    mcfg, tcfg, train, feats = setup
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx, feats)
    batch = _first_batch(train)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss", "loss_xe", "loss_adv", "acc", "acc_origin"):
        assert np.isfinite(float(metrics[k])), k
    assert float(metrics["loss_adv"]) >= 0.0  # KL is nonnegative


def test_loss_decreases_over_steps(setup):
    mcfg, tcfg, train, feats = setup
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    step = make_train_step(mcfg, tcfg, tx, feats)
    it = BatchIterator(train, batch_size=32, epochs=20, seed=0)
    losses = []
    for i, batch in enumerate(it):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss_xe"]))
        if i >= 60:
            break
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.9, (first, last)


def test_fgsm_changes_gradient(setup):
    """adv_eps>0 must change the effective loss (the adversarial KL term)."""
    mcfg, tcfg, train, feats = setup
    state, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    batch = _first_batch(train)
    log_probs = jnp.log(1e-20 + feats["weight_tag"])
    targets = build_targets(jax.random.PRNGKey(3), batch,
                            feats["item_id"], feats["cate_id"],
                            log_probs, feats["weight_tag"], tcfg.num_neg)
    import dataclasses
    tcfg_off = dataclasses.replace(tcfg, adv_eps=0.0)
    loss_on, (_, m_on) = nann_loss(state.params, state.bn_state, mcfg, tcfg,
                                   batch, targets)
    loss_off, (_, m_off) = nann_loss(state.params, state.bn_state, mcfg,
                                     tcfg_off, batch, targets)
    assert float(m_on["loss_adv"]) > 0.0
    assert float(m_off["loss_adv"]) == 0.0
    np.testing.assert_allclose(float(m_on["loss_xe"]), float(m_off["loss_xe"]),
                               rtol=1e-5)


def test_dp_sharded_step_matches_single_device(setup):
    """The pjit DP step over an 8-device mesh must produce (numerically) the
    same update as the single-device step — virtual-device parity testing per
    SURVEY.md §4.5."""
    mcfg, tcfg, train, feats = setup
    from jax.sharding import Mesh
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("dp",))

    state1, tx = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)
    state2, _ = create_train_state(jax.random.PRNGKey(0), mcfg, tcfg)

    step_single = make_train_step(mcfg, tcfg, tx, feats)
    step_dp = make_train_step(mcfg, tcfg, tx, feats, mesh=mesh)

    batch = _first_batch(train, 32)
    s1, m1 = step_single(state1, batch, jax.random.PRNGKey(9))
    s2, m2 = step_dp(state2, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = np.asarray(s1.params["head"][0]["dense"]["kernel"])
    l2 = np.asarray(s2.params["head"][0]["dense"]["kernel"])
    np.testing.assert_allclose(l1, l2, rtol=1e-3, atol=1e-6)


def test_batch_iterator_mesh_sharding(setup):
    """With a mesh, batches come back device_put with dp sharding."""
    from jax.sharding import Mesh, PartitionSpec as P
    mcfg, tcfg, train, feats = setup
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8, 1), ("dp", "mp"))
    it = BatchIterator(train, batch_size=32, epochs=1, mesh=mesh)
    batch = next(iter(it))
    assert batch["item_ids"].sharding.spec == P("dp", None)
    assert batch["gt_item_id"].sharding.spec == P("dp")


def test_batch_iterator_epochs_and_shuffling(setup):
    _, _, train, _ = setup
    it = BatchIterator(train, batch_size=64, epochs=2, seed=1)
    batches = list(it)
    assert len(batches) == len(it)
    assert batches[0]["item_ids"].shape == (64, 10)
    # different epochs see different orderings
    assert not np.array_equal(batches[0]["gt_item_id"],
                              batches[len(batches) // 2]["gt_item_id"])


def test_batch_iterator_resume_fast_forward(setup):
    """iter_from(k) yields exactly the batches a fresh iteration yields from
    global batch k on — the resume contract (no replayed data)."""
    _, _, train, _ = setup
    it = BatchIterator(train, batch_size=64, epochs=3, seed=1)
    full = list(it)
    for k in (0, 1, len(full) // 2, len(full) - 1):
        resumed = list(it.iter_from(k))
        assert len(resumed) == len(full) - k
        for a, b in zip(resumed, full[k:]):
            assert np.array_equal(a["gt_item_id"], b["gt_item_id"])


def test_batch_iterator_prefetch_matches_sync(setup):
    """The prefetch thread changes timing, not contents: same batches in the
    same order as prefetch=0, and abandoning the iterator mid-epoch leaves no
    stuck producer (the worker observes the stop flag and exits)."""
    import threading

    _, _, train, _ = setup
    sync = list(BatchIterator(train, batch_size=64, epochs=2, seed=3,
                              prefetch=0))
    pre = list(BatchIterator(train, batch_size=64, epochs=2, seed=3,
                             prefetch=3))
    assert len(pre) == len(sync)
    for a, b in zip(pre, sync):
        assert np.array_equal(a["gt_item_id"], b["gt_item_id"])

    it = iter(BatchIterator(train, batch_size=64, epochs=50, seed=3,
                            prefetch=2))
    next(it)
    it.close()  # abandon mid-stream
    deadline = 50  # 5s
    while deadline and any(t.name == "batch-prefetch" and t.is_alive()
                           for t in threading.enumerate()):
        import time
        time.sleep(0.1)
        deadline -= 1
    assert deadline, "prefetch worker did not exit after abandonment"


def test_lr_schedule_fn_values():
    """Cosine: warmup 0->peak, then decay to peak*final_ratio at the horizon;
    constant stays a plain float (no schedule state)."""
    from nann_tpu.train.step import lr_schedule_fn
    tcfg = TrainConfig(learning_rate=3e-3)
    assert float(lr_schedule_fn(tcfg)(0)) == pytest.approx(3e-3)

    tcfg = TrainConfig(learning_rate=3e-3, lr_schedule="cosine",
                       warmup_steps=10, lr_final_ratio=0.01)
    sched = lr_schedule_fn(tcfg, total_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(3e-3)
    assert float(sched(100)) == pytest.approx(3e-5, rel=1e-3)

    with pytest.raises(ValueError):
        lr_schedule_fn(TrainConfig(lr_schedule="cosine"))  # no horizon
    with pytest.raises(ValueError):
        lr_schedule_fn(TrainConfig(lr_schedule="nope"), total_steps=10)


def test_cosine_schedule_trains_and_resumes(setup, tmp_path):
    """train_loop with lr_schedule='cosine' runs, checkpoints, and a resumed
    run continues the schedule (optimizer count restores from opt_state)."""
    from nann_tpu.train.loop import train_loop

    mcfg, _tcfg, train, feats = setup
    feats_np = {k: np.asarray(v) for k, v in feats.items()}
    tcfg = TrainConfig(batch_size=32, num_neg=8, learning_rate=1e-3,
                       lr_schedule="cosine", warmup_steps=2, adv_eps=1e-3,
                       save_freq=4, print_freq=100)
    ckpt = str(tmp_path / "ckpt")
    state, _ = train_loop(mcfg, tcfg, train, feats_np, ckpt_dir=ckpt,
                          num_steps=6)
    assert int(state.step) == 6
    # the optimizer count (schedule position) is checkpointed
    state2, _ = train_loop(mcfg, tcfg, train, feats_np, ckpt_dir=ckpt,
                           num_steps=10)
    assert int(state2.step) == 10
    assert int(state2.opt_state[0].count) == 10  # ScaleByAdamState.count
