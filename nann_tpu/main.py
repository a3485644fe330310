"""nann_tpu job driver — CLI parity with the reference's main.py.

Jobs (reference NANN_impls/main.py:240-323 + delivery scripts):
  train            adversarial training with checkpointing/auto-resume
  extract_feature  item tower over the catalogue -> item_ids.npy/item_embs.npy
  build_index      HNSW over item_embs -> npy artifact contract
  test             HNSW+DNN retrieval eval: P/R/F1@topk vs ground truth,
                   num_scoring efficiency metric
  test_all         brute-force oracle eval (the recall ceiling)
  export           delivery export (serving artifacts)
  serve_bench      load-test the serving engine on the exported artifacts
  all              the full pipeline in order (synthetic data by default)

Examples:
  python -m nann_tpu.main --job-type all --synthetic --num-item 5000
  python -m nann_tpu.main --job-type train --dataset-dir data/ --output-root out/
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

from .config import (Config, ModelConfig, SearchConfig, TrainConfig,
                     default_frontier_cap)
from .utils import AverageMeter, calc_pr, get_logger

logger = get_logger("nann_tpu.main")


def parse_opt(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        "nann_tpu driver", formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--job-type", default="train",
                   choices=["train", "extract_feature", "build_index", "test",
                            "test_all", "select_checkpoint", "export",
                            "serve", "serve_bench", "verify_export",
                            "parity", "build_tree", "test_tree", "all"])
    p.add_argument("--tree-branch", type=int, default=16,
                   help="k-ary branch factor for the TDM tree index")
    p.add_argument("--tree-beam", type=int, default=200,
                   help="beam width for tree search")
    p.add_argument("--port", type=int, default=8501)
    p.add_argument("--grpc-port", type=int, default=8500,
                   help="TF-Serving-compatible gRPC Predict port for "
                        "--job-type serve (-1 disables; reference smoke "
                        "test, README.md:205-218)")
    p.add_argument("--output-root", default="./output")
    p.add_argument("--index-dir", default=None,
                   help="override <output-root>/index (index variants built "
                        "at different graph-quality knobs over one checkpoint)")
    p.add_argument("--dataset-dir", default="./data")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset generator instead of a "
                        "converted UserBehavior corpus")
    # model / train (reference defaults, nann/config.py:22-42)
    p.add_argument("--batch-size", type=int, default=800)
    p.add_argument("--train-epochs", type=int, default=5)
    p.add_argument("--emb-dim", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="cosine decays to lr*lr-final-ratio over --max-steps "
                        "(measured fix for the at-scale late-training ceiling "
                        "degradation, docs/DESIGN.md round 4)")
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--lr-total-steps", type=int, default=0,
                   help="pin the cosine decay horizon independently of "
                        "--max-steps (0 = track max-steps); set this when a "
                        "resumed run passes a different step budget so the "
                        "schedule stays the one the run started with")
    p.add_argument("--lr-final-ratio", type=float, default=0.01)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--adv-eps", type=float, default=3e-5)
    p.add_argument("--adv-weight", type=float, default=1.0)
    p.add_argument("--num-neg", type=int, default=200)
    p.add_argument("--save-freq", type=int, default=5000)
    p.add_argument("--print-freq", type=int, default=50)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--dp", type=int, default=1, help="data-parallel shards")
    # synthetic scale
    p.add_argument("--num-item", type=int, default=5000)
    p.add_argument("--num-cate", type=int, default=50)
    p.add_argument("--num-users", type=int, default=500)
    p.add_argument("--max-seq-length", type=int, default=20)
    # search (reference nann/config.py:50-57)
    p.add_argument("--hnsw-start-level", type=int, default=2)
    p.add_argument("--num-scoring-per-level", type=int, nargs="+",
                   default=[3, 1, 1])
    p.add_argument("--top-k-per-level", type=int, nargs="+",
                   default=[400, 200, 100])
    p.add_argument("--topk-eval", type=int, nargs="+", default=[200])
    p.add_argument("--num-test-batch", type=int, default=10000)
    p.add_argument("--select-steps", type=int, nargs="+", default=None,
                   help="checkpoint steps select_checkpoint evaluates "
                        "(default: every retained checkpoint)")
    p.add_argument("--select-metric", choices=["oracle", "graph"],
                   default="oracle",
                   help="select_checkpoint criterion. oracle = brute-force "
                        "ceiling (the reference's test_all-then-deploy flow)"
                        "; graph = end-to-end graph recall on a small "
                        "gt-covering subset index built per checkpoint — "
                        "the SHIPPING metric. At 4.2M the oracle curve is "
                        "flat while graph recall collapses 4x with training "
                        "progress (docs/DESIGN.md round 5), so oracle-only "
                        "selection can ship an unroutable model")
    p.add_argument("--select-subset", type=int, default=200_000,
                   help="subset catalogue size for --select-metric graph")
    p.add_argument("--frontier-cap", type=int, default=None,
                   help="static per-hop frontier capacity; default is "
                        "catalogue-aware (config.default_frontier_cap: 4096 "
                        "up to 2M items, 8192 beyond — the measured at-scale "
                        "setting, round-3 gap analysis)")
    p.add_argument("--frontier-cap-per-hop", type=int, nargs="+",
                   default=None,
                   help="per-expansion-hop frontier capacities (one per hop "
                        "in search order; see SearchConfig). The measured "
                        "hop profile is non-uniform at scale, so this cuts "
                        "padded scorer work vs one global cap")
    p.add_argument("--hnsw-num-neighbors", type=int, default=32)
    p.add_argument("--ef-construction", type=int, default=200)
    p.add_argument("--search-batch", type=int, default=16)
    p.add_argument("--autotune-caps", action="store_true",
                   help="export: probe per-hop scored maxima on held-out "
                        "users and bake tuned frontier_cap_per_hop into the "
                        "bundle signature (search/autotune.py)")
    p.add_argument("--batch-buckets", type=int, nargs="+", default=None,
                   help="engine batch-bucket ladder for serve/serve_bench "
                        "(default: EngineConfig ladder up to the chip's "
                        "measured operating point, 1 4 16 64 128)")
    p.add_argument("--calibration-file", default=None,
                   help="persist/reuse the engine's per-bucket calibration "
                        "profile (default: <output-root>/calibration.json). "
                        "With a matching cached profile, serve starts "
                        "WITHOUT the saturated self-load-test; delete the "
                        "file or pass a new path to force a re-measure")
    p.add_argument("--search-semantics", default="eval",
                   choices=["serving", "eval"],
                   help="eval (default) = the reference test-job algorithm "
                        "(threshold candidates; equal recall at ~12%% less "
                        "scored work); serving = the reference's exported-"
                        "graph loop, kept for contract parity")
    p.add_argument("--vis-impl", default="list",
                   choices=["list", "bytemap"],
                   help="visited-set representation (list = sort-merged id "
                        "list, the fast default; bytemap = the direct "
                        "BitmapRefDifference analogue)")
    p.add_argument("--mark-policy", default="scored",
                   choices=["all", "scored"],
                   help="scored (default) = mark only scored nodes, "
                        "truncated ones stay reachable (+20pp recall under "
                        "a static frontier cap); all = literal reference op "
                        "semantics incl. truncated-unscored nodes")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 scorer compute")
    return p.parse_args(argv)


def build_configs(args) -> Tuple[ModelConfig, TrainConfig, SearchConfig]:
    meta_path = os.path.join(args.dataset_dir, "ub_meta.json")
    if not args.synthetic and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        num_item, num_cate = meta["num_item"], meta["num_cate"]
        max_len = meta["max_length"]
    else:
        num_item, num_cate, max_len = (args.num_item, args.num_cate,
                                       args.max_seq_length)
    mcfg = ModelConfig(
        num_item=num_item, num_cate=num_cate, emb_dim=args.emb_dim,
        max_seq_length=max_len,
        item_tower_dims=(2 * args.emb_dim,) * 3,
        compute_dtype="bfloat16" if args.bf16 else "float32")
    tcfg = TrainConfig(
        batch_size=args.batch_size, train_epochs=args.train_epochs,
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup_steps,
        lr_final_ratio=args.lr_final_ratio,
        lr_total_steps=args.lr_total_steps,
        adv_eps=args.adv_eps, adv_weight=args.adv_weight,
        num_neg=min(args.num_neg, max(num_item // args.batch_size, 1)),
        save_freq=args.save_freq, print_freq=args.print_freq, dp=args.dp)
    k = args.hnsw_start_level
    scfg = SearchConfig(
        hnsw_start_level=k,
        num_scoring_per_level=tuple(args.num_scoring_per_level),
        top_k_per_level=tuple(min(t, num_item) for t in args.top_k_per_level),
        topk_eval=tuple(min(t, num_item) for t in args.topk_eval),
        frontier_cap=args.frontier_cap or default_frontier_cap(num_item),
        frontier_cap_per_hop=tuple(args.frontier_cap_per_hop)
        if args.frontier_cap_per_hop else None,
        semantics=args.search_semantics,
        vis_impl=args.vis_impl, mark_policy=args.mark_policy)
    return mcfg, tcfg, scfg


def load_dataset(args) -> Tuple[Dict, Dict, Dict]:
    """Returns (train, test, item_features) dict-of-arrays."""
    if args.synthetic:
        from .data import synthetic_dataset

        # cache the generated corpus per config so multi-job workflows don't
        # regenerate it for every job
        key = (f"synth_{args.num_item}_{args.num_cate}_{args.num_users}_"
               f"{args.max_seq_length}")
        cache = os.path.join(args.output_root, f"{key}.npz")
        if os.path.exists(cache):
            z = np.load(cache)
            unpack = lambda pre: {k[len(pre):]: z[k] for k in z.files
                                  if k.startswith(pre)}
            return unpack("train_"), unpack("test_"), unpack("feat_")
        train, test, feats = synthetic_dataset(
            num_item=args.num_item, num_cate=args.num_cate,
            num_users=args.num_users, max_seq_length=args.max_seq_length,
            seed=0)
        os.makedirs(args.output_root, exist_ok=True)
        np.savez(cache,
                 **{f"train_{k}": v for k, v in train.items()},
                 **{f"test_{k}": v for k, v in test.items()},
                 **{f"feat_{k}": v for k, v in feats.items()})
        return train, test, feats
    def load_npz(name):
        return dict(np.load(os.path.join(args.dataset_dir, name)))
    if os.path.exists(os.path.join(args.dataset_dir, "ub_train_packed.npz")):
        # at-scale packed train split: lazy prefix materialisation
        from .data.user_behavior import PackedUB
        train = PackedUB(args.dataset_dir)
    else:
        train = load_npz("ub_train.npz")
    return train, load_npz("ub_test.npz"), load_npz("ub_items.npz")


class Paths:
    def __init__(self, root):
        def mk(p):
            os.makedirs(p, exist_ok=True)
            return p
        self.model_save_dir = mk(os.path.join(root, "model"))
        emb = mk(os.path.join(root, "embeddings"))
        self.item_ids_file = os.path.join(emb, "item_ids.npy")
        self.item_embs_file = os.path.join(emb, "item_embs.npy")
        self.index_dir = mk(os.path.join(root, "index"))
        self.export_dir = mk(os.path.join(root, "export"))


def _selected_step(paths) -> Optional[int]:
    """The checkpoint select_checkpoint picked (model/selected_step.json),
    or None if selection never ran."""
    sel = os.path.join(paths.model_save_dir, "selected_step.json")
    if os.path.exists(sel):
        with open(sel) as f:
            return int(json.load(f)["step"])
    return None


def _restore(mcfg, tcfg, paths, step: Optional[int] = None,
             prefer_selected: bool = True):
    """Restore a checkpoint: explicit `step` > the select_checkpoint winner
    (deploy-by-oracle, reference main.py:194-237 flow) > the latest."""
    import dataclasses

    import jax
    from .train import create_train_state
    from .train.dataclasses_io import restore_train_state
    from .train.loop import latest_checkpoint_step

    # restore-only skeleton: the lr schedule is irrelevant (no optimizer
    # steps run) and opt_state structure is schedule-invariant
    # (train/step.py lr_schedule_fn), so a constant-lr skeleton restores
    # checkpoints trained under any schedule without needing the horizon
    skel_tcfg = dataclasses.replace(tcfg, lr_schedule="constant")
    state, tx = create_train_state(jax.random.PRNGKey(tcfg.seed), mcfg,
                                   skel_tcfg)
    how = "requested"
    if step is None and prefer_selected:
        step = _selected_step(paths)
        how = "selected (deploy-by-oracle)"
    if step is None:
        step = latest_checkpoint_step(paths.model_save_dir)
        how = "latest"
    if step is not None:
        logger.info(f"restoring {how} checkpoint step_{step}")
        state = restore_train_state(
            os.path.join(paths.model_save_dir, f"step_{step}"), state)
    else:
        logger.info("no checkpoint found; using fresh init")
    return state


def job_train(args, mcfg, tcfg, scfg, paths):
    from .parallel import make_mesh
    from .train.loop import train_loop

    train, _test, feats = load_dataset(args)
    mesh = make_mesh(dp=tcfg.dp, mp=1) if tcfg.dp > 1 else None
    state, metrics = train_loop(
        mcfg, tcfg, train, feats,
        ckpt_dir=paths.model_save_dir,
        num_steps=args.max_steps, mesh=mesh,
        metrics_path=os.path.join(args.output_root, "train_metrics.jsonl"))
    logger.info(f"train done: {metrics}")
    return state


def job_extract(args, mcfg, tcfg, scfg, paths):
    from .delivery import extract_item_embeddings

    _train, _test, feats = load_dataset(args)
    state = _restore(mcfg, tcfg, paths)
    item_ids, item_embs = extract_item_embeddings(
        state.params, state.bn_state, mcfg, feats)
    np.save(paths.item_ids_file, item_ids)
    np.save(paths.item_embs_file, item_embs)
    logger.info(f"saved {item_embs.shape} embeddings to {paths.item_embs_file}")


def job_build_index(args, mcfg, tcfg, scfg, paths):
    from .index import build_and_save_index

    item_embs = np.load(paths.item_embs_file)
    build_and_save_index(item_embs, scfg.hnsw_start_level,
                         args.hnsw_num_neighbors, paths.index_dir,
                         ef_construction=args.ef_construction)


def _load_search_index(args, mcfg, scfg, paths):
    import jax.numpy as jnp
    from .index import load_index
    from .search import SearchIndex

    item_embs = np.load(paths.item_embs_file)
    item_ids = np.load(paths.item_ids_file)
    art = load_index(paths.index_dir, scfg.hnsw_start_level,
                     max_degree=2 * args.hnsw_num_neighbors)
    dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else jnp.float32
    return SearchIndex.from_artifacts(art, item_embs, item_ids, dtype=dtype)


def job_test(args, mcfg, tcfg, scfg, paths):
    """HNSW+DNN retrieval eval (reference test(), main.py:144-188)."""
    import jax
    import jax.numpy as jnp
    from .delivery import extract_user_embeddings
    from .search import make_searcher
    from .search.beam import level_topn_default

    _train, test, _feats = load_dataset(args)
    state = _restore(mcfg, tcfg, paths)
    sidx = _load_search_index(args, mcfg, scfg, paths)

    n_users = min(args.num_test_batch, len(test["gt_item_id"]))
    search = jax.jit(jax.vmap(
        make_searcher(mcfg, scfg),
        in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn_default(scfg))

    meters = {k: {t: AverageMeter(n, ":.2%") for t in args.topk_eval}
              for k, n in (("prec", "prec"), ("recall", "recall"), ("f1", "f1"))}
    bt = AverageMeter("batch_time", ":.2f", moving_average=True)
    all_scoring = []
    B = args.search_batch
    tic = time.time()
    for start in range(0, n_users, B):
        end = min(start + B, n_users)
        batch = {k: test[k][start:end] for k in test}
        user = extract_user_embeddings(state.params, batch)
        pad = B - (end - start)
        if pad:
            user = np.concatenate([user, np.zeros((pad,) + user.shape[1:],
                                                  np.float32)])
        top_items, _scores, num_scoring = search(
            state.params, state.bn_state, sidx, jnp.asarray(user), ltn)
        top_items = np.asarray(top_items)[:end - start]
        all_scoring.append(np.asarray(num_scoring)[:end - start])
        bt.update(time.time() - tic)
        tic = time.time()
        for u in range(end - start):
            got = top_items[u][top_items[u] >= 0]
            for topk in args.topk_eval:
                prec, recall, f1 = calc_pr(batch["gt_item_id"][u], got[:topk])
                meters["prec"][topk].update(prec)
                meters["recall"][topk].update(recall)
                meters["f1"][topk].update(f1)
        if (start // B) % max(args.print_freq // B, 1) == 0:
            t0 = args.topk_eval[0]
            logger.info(f"[{end}/{n_users}] {meters['recall'][t0]} "
                        f"{meters['prec'][t0]} {bt}")
    ns = np.concatenate(all_scoring)
    for topk in args.topk_eval:
        logger.info(f"Test Recall@{topk} {meters['recall'][topk].avg:.2%}, "
                    f"num_scoring {ns.sum(-1).mean():.0f}")
    logger.info(f"num scoring per hop: mean {ns.mean(0)}, max {ns.max(0)}")
    # frontier-cap saturation check — the exact signal that exposed the
    # round-3 scale leak (cap 4096 binding every ground hop at 4.2M items
    # cost 13pp parity). A hop whose MEAN scored count sits at the cap is
    # truncating real expansion, not padding.
    hop_means = ns.mean(0)
    if hop_means.max() >= 0.98 * scfg.frontier_cap:
        logger.warning(
            f"frontier_cap={scfg.frontier_cap} SATURATED: per-hop scored "
            f"means {np.round(hop_means).astype(int).tolist()} — the cap is "
            f"truncating the neighbor expansion and costing recall. "
            f"Raise --frontier-cap (catalogue-aware default: "
            f"{default_frontier_cap(mcfg.num_item)} for "
            f"{mcfg.num_item} items).")
    return {f"recall@{t}": meters["recall"][t].avg for t in args.topk_eval}


def _oracle_recall(args, mcfg, state, item_embs, item_ids, test,
                   quiet: bool = False) -> Dict[str, float]:
    """Brute-force oracle recall over a held-out user slice — the inner loop
    of test_all, reusable against any (state, embeddings) pair."""
    import jax.numpy as jnp
    from .delivery import extract_user_embeddings
    from .search import make_brute_force_scorer

    n_users = min(args.num_test_batch, len(test["gt_item_id"]))
    k = max(args.topk_eval)
    oracle = make_brute_force_scorer(mcfg, chunk_size=8192, k=k)
    meters = {t: AverageMeter("recall", ":.2%") for t in args.topk_eval}
    B = args.search_batch
    for start in range(0, n_users, B):
        end = min(start + B, n_users)
        batch = {key: test[key][start:end] for key in test}
        user = extract_user_embeddings(state.params, batch)
        idx, _ = oracle(state.params, state.bn_state, jnp.asarray(user),
                        item_embs)
        retrieved = item_ids[np.asarray(idx)]
        for u in range(end - start):
            for topk in args.topk_eval:
                _p, recall, _f = calc_pr(batch["gt_item_id"][u],
                                         retrieved[u][:topk])
                meters[topk].update(recall)
        if not quiet and (start // B) % max(args.print_freq // B, 1) == 0:
            t0 = args.topk_eval[0]
            logger.info(f"[{end}/{n_users}] {meters[t0]}")
    return {f"recall@{t}": meters[t].avg for t in args.topk_eval}


def job_test_all(args, mcfg, tcfg, scfg, paths):
    """Brute-force oracle eval (reference test_all(), main.py:194-237)."""
    import jax.numpy as jnp

    _train, test, _feats = load_dataset(args)
    state = _restore(mcfg, tcfg, paths)
    item_embs = jnp.asarray(np.load(paths.item_embs_file))
    item_ids = np.load(paths.item_ids_file)
    res = _oracle_recall(args, mcfg, state, item_embs, item_ids, test)
    for topk in args.topk_eval:
        logger.info(f"Test-all Recall@{topk} {res[f'recall@{topk}']:.2%}")
    return res


def job_select_checkpoint(args, mcfg, tcfg, scfg, paths):
    """Deploy-by-oracle checkpoint selection (VERDICT r3 item 1).

    The reference's deploy flow runs test_all and deploys the checkpoint
    with the best oracle recall (NANN_impls/main.py:194-237); exporting
    whatever checkpoint is newest shipped a degraded model at 4.2M scale
    (step-30000 oracle 57.4% vs step-10001's 67.3%, docs/DESIGN.md round 3).
    This job evaluates every retained checkpoint (or --select-steps) on a
    held-out slice, writes the winner to model/selected_step.json, and every
    downstream job (extract_feature, test, test_all, export, parity)
    restores the SELECTED checkpoint. Two criteria (--select-metric):
    oracle = brute-force ceiling (the reference flow); graph = end-to-end
    recall through a per-checkpoint subset HNSW (delivery/graph_select.py)
    — the shipping metric. Round-5 forensics: at 4.2M the oracle curve is
    flat across checkpoints while graph recall collapses 76.6% -> 5.7%
    (subset parity, steps 10k -> 50k), so oracle-only selection shipped a
    37%-parity model; graph selection is the fix.
    """
    import jax.numpy as jnp
    from .delivery import extract_item_embeddings
    from .train.loop import checkpoint_steps

    _train, test, feats = load_dataset(args)
    steps = args.select_steps or checkpoint_steps(paths.model_save_dir)
    if not steps:
        raise SystemExit(f"no checkpoints in {paths.model_save_dir}")
    graph_mode = args.select_metric == "graph"
    k = max(args.topk_eval)
    key = f"graph_recall@{k}" if graph_mode else f"recall@{k}"
    n_users = min(args.num_test_batch, len(test["gt_item_id"]))
    if graph_mode:
        from .delivery.graph_select import (gt_covering_subset,
                                            subset_graph_recall)
        sub_ids, sub_rows = gt_covering_subset(
            feats, test, n_users, min(args.select_subset, mcfg.num_item))
        logger.info(f"graph selection: {len(sub_ids)}-item gt-covering "
                    f"subset index per checkpoint")
    # per-checkpoint evals are minutes each at 4.2M scale and the relay can
    # drop mid-job (babysit.sh restarts the whole command) — cache each
    # finished eval so a restart skips straight to the unfinished ones.
    # Keyed by (users, dtype): a different slice or numerics is a new screen.
    cache_path = os.path.join(
        paths.model_save_dir,
        f"select_cache{'_graph' if graph_mode else ''}"
        f"_u{n_users}_{mcfg.compute_dtype}.json")
    results = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            results = {int(k): v for k, v in json.load(f).items()}
        logger.info(f"resuming selection: {sorted(results)} cached")
    for step in steps:
        if step in results:
            logger.info(f"checkpoint step_{step}: cached {key} "
                        f"{results[step][key]:.2%}")
            continue
        t0 = time.time()
        state = _restore(mcfg, tcfg, paths, step=step)
        item_ids, item_embs = extract_item_embeddings(
            state.params, state.bn_state, mcfg, feats)
        if graph_mode:
            res = {key: subset_graph_recall(
                mcfg, scfg, state, item_embs, sub_ids, sub_rows, test,
                n_users,
                workdir=os.path.join(paths.model_save_dir,
                                     f"select_idx_{step}"),
                search_batch=args.search_batch, topk=k)}
        else:
            # quiet=False: the per-slice progress lines double as the
            # liveness signal for the babysit.sh log-silence watchdog
            res = _oracle_recall(args, mcfg, state, jnp.asarray(item_embs),
                                 item_ids, test)
        results[step] = res
        logger.info(f"checkpoint step_{step}: oracle {key} "
                    f"{res[key]:.2%} ({time.time() - t0:.0f}s)")
        with open(cache_path, "w") as f:
            json.dump({str(s): r for s, r in results.items()}, f)
        del state, item_embs
    best = max(results, key=lambda s: results[s][key])
    sel = {"step": best, "metric": key, "scores": results[best],
           "num_users": min(args.num_test_batch, len(test["gt_item_id"])),
           "evaluated": {str(s): results[s][key] for s in results}}
    if not graph_mode:
        sel["oracle"] = results[best]  # historical field name
    sel_path = os.path.join(paths.model_save_dir, "selected_step.json")
    with open(sel_path, "w") as f:
        json.dump(sel, f, indent=1)
    logger.info(f"SELECTED step_{best} ({key} {results[best][key]:.2%}) "
                f"-> {sel_path}")
    return sel


def job_export(args, mcfg, tcfg, scfg, paths):
    from .delivery import export_model

    state = _restore(mcfg, tcfg, paths)
    item_ids = np.load(paths.item_ids_file) if \
        os.path.exists(paths.item_ids_file) else None
    item_embs = np.load(paths.item_embs_file) if \
        os.path.exists(paths.item_embs_file) else None
    # index artifacts are copied inside export_model so the VERSION marker
    # lands only after the FULL bundle (scorer + index) is on disk
    has_index = os.path.exists(os.path.join(paths.index_dir,
                                            "enter_points.npy"))
    if args.autotune_caps and has_index:
        # bake data-derived per-hop frontier caps into the bundle: probe the
        # search on real held-out users, cap each hop just above its measured
        # expansion (search/autotune.py). signature.json round-trips the full
        # SearchConfig, so serving hosts compile the tuned widths directly.
        from .delivery import extract_user_embeddings
        from .search.autotune import autotune_hop_caps
        _train, test, _feats = load_dataset(args)
        n_probe = min(args.num_test_batch, len(test["gt_item_id"]), 256)
        users = extract_user_embeddings(
            state.params, {k: test[k][:n_probe] for k in test})
        sidx = _load_search_index(args, mcfg, scfg, paths)
        autotune_report = {}
        scfg = autotune_hop_caps(mcfg, scfg, state.params, state.bn_state,
                                 sidx, np.asarray(users, np.float32),
                                 report=autotune_report)
        logger.info(f"autotuned per-hop frontier caps ({n_probe} probes): "
                    f"{scfg.frontier_cap_per_hop} ({autotune_report})")
    else:
        autotune_report = None
    export_model(paths.export_dir, state.params, state.bn_state, mcfg, scfg,
                 item_ids, item_embs,
                 index_dir=paths.index_dir if has_index else None,
                 checkpoint_step=int(state.step),
                 autotune_report=autotune_report)


def job_serve_bench(args, mcfg, tcfg, scfg, paths):
    from .serving import Engine, EngineConfig, LoadGenConfig, run_load_test

    state = _restore(mcfg, tcfg, paths)
    sidx = _load_search_index(args, mcfg, scfg, paths)
    buckets = tuple(args.batch_buckets) if args.batch_buckets else \
        EngineConfig.batch_buckets
    cal = args.calibration_file or os.path.join(args.output_root,
                                                "calibration.json")
    engine = Engine(mcfg, scfg, state.params, state.bn_state, sidx,
                    EngineConfig(batch_buckets=buckets, calibrate=True,
                                 calibration_file=cal))
    # bench conf JSON (gen_benchmark_conf.py parity): LoadGenConfig fields
    lg = LoadGenConfig(duration_s=10.0, qps=-1)
    conf_path = os.path.join(args.output_root, "benchmark_conf.json")
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            lg = LoadGenConfig(**json.load(f))
        logger.info(f"loaded bench conf from {conf_path}: {lg}")
    else:
        import dataclasses as _dc
        with open(conf_path, "w") as f:
            json.dump(_dc.asdict(lg), f, indent=1)
    res = run_load_test(engine, lg)
    engine.shutdown()
    logger.info(f"serve_bench: {res}")
    return res


def job_serve(args, mcfg, tcfg, scfg, paths):
    """Run the HTTP serving shim on the export bundle with hot reload."""
    from .delivery.verify_export import load_serving_bundle
    from .serving import Engine, EngineConfig, NannServer
    from .serving.selector import ModelReloader

    params, state, mcfg, sidx = load_serving_bundle(paths.export_dir, scfg)
    buckets = tuple(args.batch_buckets) if args.batch_buckets else \
        EngineConfig.batch_buckets
    # cached calibration (fingerprint-keyed): a warm restart serves
    # immediately instead of re-running the saturated self-load-test
    cal = args.calibration_file or os.path.join(args.output_root,
                                                "calibration.json")
    engine = Engine(mcfg, scfg, params, state, sidx,
                    EngineConfig(batch_buckets=buckets, calibrate=True,
                                 calibration_file=cal))
    reloader = ModelReloader(engine, paths.export_dir, scfg)
    reloader.start()
    server = NannServer(engine, port=args.port)
    server.start()
    grpc_server = None
    if args.grpc_port >= 0:
        from .serving.grpc_server import NannGrpcServer
        grpc_server = NannGrpcServer(engine, port=args.grpc_port)
        grpc_server.start()
    logger.info(f"serving export bundle on :{server.port} (REST)"
                + (f" / :{grpc_server.port} (gRPC Predict)" if grpc_server
                   else "") + "; ctrl-c to stop")
    try:
        import signal
        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        server.stop()
        if grpc_server:
            grpc_server.stop()
        reloader.stop()
        engine.shutdown()


def job_verify_export(args, mcfg, tcfg, scfg, paths):
    from .delivery.verify_export import verify_export
    from .train.loop import latest_checkpoint_step

    # cross-check the bundle against the live checkpoint when one exists
    ref = None
    if latest_checkpoint_step(paths.model_save_dir) is not None:
        state = _restore(mcfg, tcfg, paths)
        ref = (state.params, state.bn_state)
    return verify_export(paths.export_dir, scfg, reference_state=ref)


def job_build_tree(args, mcfg, tcfg, scfg, paths):
    """Build the TDM-style tree index over the extracted item embeddings
    (the alternative retrieval family; index/tree_build.py)."""
    from .index import build_tree, save_tree

    item_embs = np.load(paths.item_embs_file)
    tree = build_tree(item_embs, branch=args.tree_branch)
    tree_dir = os.path.join(args.output_root, "tree_index")
    save_tree(tree, tree_dir)
    logger.info(f"tree index: {tree.num_levels} levels, branch "
                f"{args.tree_branch} -> {tree_dir}")


def job_test_tree(args, mcfg, tcfg, scfg, paths):
    """Tree-retrieval eval: top-down DNN beam search vs ground truth."""
    import jax
    import jax.numpy as jnp
    from .delivery import extract_user_embeddings
    from .index import load_tree
    from .search import DeviceTree, make_tree_searcher

    _train, test, _feats = load_dataset(args)
    state = _restore(mcfg, tcfg, paths)
    tree = load_tree(os.path.join(args.output_root, "tree_index"))
    item_ids = np.load(paths.item_ids_file)
    dtree = DeviceTree.from_tree(tree, item_ids)

    topk = max(args.topk_eval)
    search = jax.jit(jax.vmap(
        make_tree_searcher(mcfg, beam_width=args.tree_beam, topk=topk),
        in_axes=(None, None, None, 0)))
    n_users = min(args.num_test_batch, len(test["gt_item_id"]))
    meters = {t: AverageMeter("recall", ":.2%") for t in args.topk_eval}
    B = args.search_batch
    for start in range(0, n_users, B):
        end = min(start + B, n_users)
        batch = {k: test[k][start:end] for k in test}
        user = extract_user_embeddings(state.params, batch)
        pad = B - (end - start)
        if pad:
            user = np.concatenate([user, np.zeros((pad,) + user.shape[1:],
                                                  np.float32)])
        items, _scores = search(state.params, state.bn_state, dtree,
                                jnp.asarray(user))
        items = np.asarray(items)[:end - start]
        for u in range(end - start):
            got = items[u][items[u] >= 0]
            for t in args.topk_eval:
                _p, recall, _f = calc_pr(batch["gt_item_id"][u], got[:t])
                meters[t].update(recall)
    for t in args.topk_eval:
        logger.info(f"Tree Recall@{t} {meters[t].avg:.2%} "
                    f"(beam {args.tree_beam})")
    return {f"recall@{t}": meters[t].avg for t in args.topk_eval}


def job_parity(args, mcfg, tcfg, scfg, paths):
    """The north-star check in one command: graph-search recall vs the
    brute-force ceiling on the same checkpoint (reference oracle pattern,
    SURVEY.md §4.2)."""
    oracle = job_test_all(args, mcfg, tcfg, scfg, paths)
    graph = job_test(args, mcfg, tcfg, scfg, paths)
    report = {}
    for topk in args.topk_eval:
        ceiling = oracle[f"recall@{topk}"]
        got = graph[f"recall@{topk}"]
        ratio = got / ceiling if ceiling > 0 else float("nan")
        report[f"parity@{topk}"] = ratio
        report[f"graph_recall@{topk}"] = got
        report[f"oracle_recall@{topk}"] = ceiling
        logger.info(f"PARITY@{topk}: graph {got:.2%} / oracle {ceiling:.2%} "
                    f"= {ratio:.1%}")
    # machine-readable artifact next to the checkpoints (round-4 advisor:
    # harness scripts were tail-ing the log line into "parity.json" files
    # that weren't JSON; the job now writes the real thing)
    report["num_users"] = int(args.num_test_batch)
    report["checkpoint_step"] = _selected_step(paths)
    out = os.path.join(args.output_root, "parity_result.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    logger.info(f"parity report -> {out}")
    return report


JOBS = {
    "train": job_train,
    "extract_feature": job_extract,
    "build_index": job_build_index,
    "test": job_test,
    "test_all": job_test_all,
    "select_checkpoint": job_select_checkpoint,
    "export": job_export,
    "serve": job_serve,
    "serve_bench": job_serve_bench,
    "verify_export": job_verify_export,
    "parity": job_parity,
    "build_tree": job_build_tree,
    "test_tree": job_test_tree,
}


def main(argv=None):
    args = parse_opt(argv)
    # persistent XLA compile cache (the reference's PTX/CUBIN cache
    # equivalent); must be set before jax initialises — jobs import jax lazily
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "nann_tpu_xla"))
    mcfg, tcfg, scfg, = build_configs(args)
    paths = Paths(args.output_root)
    if args.index_dir:
        os.makedirs(args.index_dir, exist_ok=True)
        paths.index_dir = args.index_dir
    logger.info(f"job={args.job_type} model={mcfg} train={tcfg} search={scfg}")
    if args.job_type == "all":
        # select_checkpoint between train and the index/eval/export stages:
        # everything downstream runs on the deploy-by-oracle winner
        for name in ("train", "select_checkpoint", "extract_feature",
                     "build_index", "test_all", "test", "export",
                     "verify_export"):
            logger.info(f"=== {name} ===")
            JOBS[name](args, mcfg, tcfg, scfg, paths)
    else:
        JOBS[args.job_type](args, mcfg, tcfg, scfg, paths)


if __name__ == "__main__":
    main()
