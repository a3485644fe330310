"""Delivery export/import: trained checkpoint -> serving artifacts.

The TPU analogue of the reference delivery pipeline (freeze + convert +
SavedModel, NANN_impls/nann/delivery/convert_meta.py + pb_to_saved_model.py):

  export_dir/
    scorer_params.npz   flattened scorer params (serving needs att/head/tower;
                        tables included for user-embedding service)
    bn_state.npz        folded eval-mode batch-norm statistics
    model_config.json   architecture config (the frozen graph's shape contract)
    item_ids.npy, item_embs.npy          catalogue + embeddings (fp16 on disk,
                                         like convert_meta's float->half pass)
    index/...                            HNSW npy artifact contract
    signature.json      request schema: comm_seq [1, L*d] fp16 + level_topn
                        int32 -> top_k (README.md smoke-test contract)

Everything is flat npy/json — no graph serialisation is needed because the
"graph" is re-traced from code + config at load (JAX's jit replaces the
frozen GraphDef).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SearchConfig
from ..models.layers import Params, State
from ..utils import get_logger

logger = get_logger("nann_tpu.delivery")


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return type(template)(_unflatten_into(v, flat, f"{prefix}{i}/")
                              for i, v in enumerate(template))
    return jnp.asarray(flat[prefix.rstrip("/")])


def export_model(export_dir: str, params: Params, state: State,
                 mcfg: ModelConfig, scfg: SearchConfig,
                 item_ids: np.ndarray = None, item_embs: np.ndarray = None,
                 index_dir: str = None, checkpoint_step: int = None,
                 autotune_report: dict = None) -> None:
    """Write the serving bundle; the VERSION marker is written LAST so a
    reloader polling mid-export never cold-loads a mixed old/new bundle
    (reference ModelReloader keys on an explicit version, model.cc:384-437).
    index_dir: optional HNSW artifact dir copied into the bundle before the
    marker lands."""
    os.makedirs(export_dir, exist_ok=True)
    np.savez(os.path.join(export_dir, "scorer_params.npz"), **_flatten(params))
    np.savez(os.path.join(export_dir, "bn_state.npz"), **_flatten(state))
    with open(os.path.join(export_dir, "model_config.json"), "w") as f:
        json.dump(dataclasses.asdict(mcfg), f)
    with open(os.path.join(export_dir, "signature.json"), "w") as f:
        json.dump({
            "semantics": scfg.semantics,
            # which training checkpoint this bundle froze (the deploy-by-
            # oracle winner when select_checkpoint ran) — deploy forensics
            "checkpoint_step": checkpoint_step,
            # full search config so a serving host reproduces the exporter's
            # budgets/caps/policies exactly (load via load_search_config)
            "search_config": dataclasses.asdict(scfg),
            # how per-hop caps were derived (probe maxima + margin): a query
            # whose hop expansion exceeds a tuned cap truncates silently at
            # serve time, so the derivation must be auditable from the bundle
            "frontier_cap_autotune": autotune_report,
            "inputs": {
                "comm_seq": {"dtype": "float16",
                             "shape": [1, mcfg.max_seq_length * mcfg.user_emb_dim]},
                "level_topn": {"dtype": "int32",
                               "shape": [len_level_topn(scfg)]},
            },
            "outputs": {"top_k": {"dtype": "int32",
                                  "shape": [1, max(scfg.topk_eval)]}},
        }, f)
    if item_ids is not None:
        np.save(os.path.join(export_dir, "item_ids.npy"), item_ids)
    if item_embs is not None:
        # fp16 on disk like the reference's convert_feed_input_float2half
        np.save(os.path.join(export_dir, "item_embs.npy"),
                item_embs.astype(np.float16))
    if index_dir is not None and os.path.isdir(index_dir):
        import shutil
        dst = os.path.join(export_dir, "index")
        os.makedirs(dst, exist_ok=True)
        for f in os.listdir(index_dir):
            shutil.copy(os.path.join(index_dir, f), dst)
    # version marker LAST: the bundle is complete iff this file exists and
    # its content is newer than what the reloader last saw
    version = f"{time.time_ns()}"
    tmp = os.path.join(export_dir, ".VERSION.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(export_dir, "VERSION"))
    logger.info(f"exported model to {export_dir} (version {version})")


def read_version(export_dir: str) -> str:
    """The bundle's version marker; '' if the bundle is incomplete."""
    try:
        with open(os.path.join(export_dir, "VERSION")) as f:
            return f.read().strip()
    except OSError:
        return ""


def len_level_topn(scfg: SearchConfig) -> int:
    """Length of the level_topn request vector under the bundle's search
    semantics (see beam.level_topn_default for the layouts)."""
    if scfg.semantics == "serving":
        return (1 + (scfg.hnsw_start_level - 1)
                + scfg.num_scoring_per_level[0] + 1)
    return 1 + scfg.hnsw_start_level + 1


def load_search_config(export_dir: str) -> SearchConfig:
    """The exporter's full SearchConfig from signature.json, so serving
    reproduces its budgets/caps/policies; falls back to defaults for
    pre-round-2 bundles that only recorded `semantics`."""
    with open(os.path.join(export_dir, "signature.json")) as f:
        sig = json.load(f)
    if "search_config" in sig:
        d = dict(sig["search_config"])
        for k in ("num_scoring_per_level", "top_k_per_level", "topk_eval"):
            d[k] = tuple(d[k])
        if d.get("frontier_cap_per_hop") is not None:
            d["frontier_cap_per_hop"] = tuple(d["frontier_cap_per_hop"])
        return SearchConfig(**d)
    return SearchConfig(semantics=sig.get("semantics", "eval"))


def load_exported(export_dir: str, template_params: Params,
                  template_state: State) -> Tuple[Params, State, ModelConfig]:
    with open(os.path.join(export_dir, "model_config.json")) as f:
        mcfg = ModelConfig(**json.load(f))
    pz = dict(np.load(os.path.join(export_dir, "scorer_params.npz")))
    sz = dict(np.load(os.path.join(export_dir, "bn_state.npz")))
    params = _unflatten_into(template_params, pz)
    state = _unflatten_into(template_state, sz)
    return params, state, mcfg
