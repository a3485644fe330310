"""Export-bundle verifier — the NANN_inference_demo equivalent.

The reference verifies its delivery artifacts by running the exported exec.pb
on random fp16 requests (NANN_impls/nann/delivery/NANN_inference_demo.py).
This does the same for our bundle: load the export directory cold (params,
BN state, config, fp16 item embeddings, index artifacts), rebuild the serving
program, fire random requests, and check the output contract — plus one check
the reference can't do: with `reference_state` (the live training state),
the loaded bundle's results must match a searcher built from the in-memory
weights (the CLI verify_export job passes the restored checkpoint).

Runnable:  python -m nann_tpu.delivery.verify_export --export-dir out/export
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import numpy as np

from ..config import ModelConfig, SearchConfig
from ..utils import get_logger

logger = get_logger("nann_tpu.verify_export")


def load_serving_bundle(export_dir: str, scfg: SearchConfig,
                        max_degree=None, dtype=None):
    """Cold-load an export bundle -> (params, state, mcfg, SearchIndex)."""
    import jax
    import jax.numpy as jnp

    from ..index import load_index
    from ..models import init_scorer
    from ..search import SearchIndex
    from .export import load_exported

    with open(os.path.join(export_dir, "model_config.json")) as f:
        mcfg = ModelConfig(**json.load(f))
    template_p, template_s = init_scorer(jax.random.PRNGKey(0), mcfg)
    params, state, mcfg = load_exported(export_dir, template_p, template_s)

    item_ids = np.load(os.path.join(export_dir, "item_ids.npy"))
    item_embs = np.load(os.path.join(export_dir, "item_embs.npy")).astype(
        np.float32)
    art = load_index(os.path.join(export_dir, "index"),
                     scfg.hnsw_start_level, max_degree=max_degree)
    if dtype is None:
        dtype = jnp.bfloat16 if mcfg.compute_dtype == "bfloat16" else \
            jnp.float32
    sidx = SearchIndex.from_artifacts(art, item_embs, item_ids, dtype=dtype)
    return params, state, mcfg, sidx


def verify_export(export_dir: str, scfg: Optional[SearchConfig] = None,
                  num_requests: int = 10, seed: int = 0,
                  reference_state: Optional[Tuple] = None,
                  min_overlap: float = 0.9) -> dict:
    """Run random requests through the cold-loaded bundle; returns a report.

    Contract checks per request: non-empty, unique, score-sorted, finite.

    reference_state: optional (params, bn_state) from the LIVE training
    state. When given, the same requests are also run through a searcher
    built from those in-memory weights over the bundle's index, and the
    retrieved sets must agree (>= min_overlap Jaccard-style overlap; fp16
    on-disk embeddings make bit-exactness too strict near score ties). This
    is the loaded-bundle == in-memory-state cross-check the reference's
    demo cannot do (it has no live state at verification time).

    Raises AssertionError on contract violations.
    """
    import jax
    import jax.numpy as jnp

    from ..search import make_searcher
    from ..search.beam import level_topn_default

    if scfg is None:
        # prefer the exporter's own recorded config (signature.json)
        from .export import load_search_config
        scfg = load_search_config(export_dir)
    params, state, mcfg, sidx = load_serving_bundle(export_dir, scfg)
    # clamp the budget to the catalogue (tiny test exports)
    n = int(sidx.num_items)
    import dataclasses
    scfg = dataclasses.replace(
        scfg,
        top_k_per_level=tuple(min(k, n) for k in scfg.top_k_per_level),
        topk_eval=tuple(min(k, n) for k in scfg.topk_eval))

    search = jax.jit(make_searcher(mcfg, scfg))
    ltn = jnp.asarray(level_topn_default(scfg))
    rng = np.random.default_rng(seed)
    k_final = max(scfg.topk_eval)

    overlaps = []
    for i in range(num_requests):
        # fp16 request payload, like the exported signature's comm_seq
        comm_seq = rng.standard_normal(
            (mcfg.max_seq_length, mcfg.user_emb_dim)).astype(np.float16)
        user = jnp.asarray(comm_seq, jnp.float32)
        items, scores, num_scoring = search(params, state, sidx, user, ltn)
        items = np.asarray(items)
        got = items[items >= 0]
        assert len(got) > 0, "empty retrieval"
        assert len(np.unique(got)) == len(got), "duplicate items"
        s = np.asarray(scores)[items >= 0]
        assert np.all(np.diff(s) <= 1e-6), "scores not sorted"
        assert np.isfinite(s).all(), "non-finite scores"

        if reference_state is not None:
            live_params, live_state = reference_state
            live_items, _ls, _ln = search(live_params, live_state, sidx,
                                          user, ltn)
            live_items = np.asarray(live_items)
            live = set(live_items[live_items >= 0].tolist())
            ov = len(live & set(got.tolist())) / max(len(live), 1)
            overlaps.append(ov)
            assert ov >= min_overlap, (
                f"bundle/in-memory retrieval diverged: overlap {ov:.2f} "
                f"< {min_overlap} on request {i}")
    report = {
        "export_dir": export_dir,
        "num_items": n,
        "requests_verified": num_requests,
        "k_final": int(k_final),
    }
    if overlaps:
        report["in_memory_cross_check_overlap"] = float(np.mean(overlaps))
    logger.info(f"export verified: {report}")
    return report


def _main():
    import argparse

    p = argparse.ArgumentParser("verify an export bundle")
    p.add_argument("--export-dir", required=True)
    p.add_argument("--num-requests", type=int, default=10)
    args = p.parse_args()
    verify_export(args.export_dir, num_requests=args.num_requests)


if __name__ == "__main__":
    _main()
