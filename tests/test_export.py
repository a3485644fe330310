"""Export bundle round-trip + cold-load verifier tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.delivery import export_model, load_exported
from nann_tpu.delivery.verify_export import load_serving_bundle, verify_export
from nann_tpu.index import build_and_save_index
from nann_tpu.models import init_scorer, scorer
from nann_tpu.search import make_searcher
from nann_tpu.search.beam import level_topn_default


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    mcfg = ModelConfig(num_item=600, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(50, 25, 12), topk_eval=(50,),
                        frontier_cap=256)
    params, state = init_scorer(jax.random.PRNGKey(3), mcfg)
    rng = np.random.default_rng(0)
    item_embs = rng.standard_normal((600, 16)).astype(np.float32)
    item_ids = np.arange(1, 601, dtype=np.int32)

    d = tmp_path_factory.mktemp("export")
    export_model(str(d), params, state, mcfg, scfg, item_ids, item_embs)
    build_and_save_index(item_embs, 2, 8, str(d / "index"),
                         ef_construction=30)
    return str(d), mcfg, scfg, params, state, item_embs


def test_load_exported_roundtrip(export_dir):
    d, mcfg, scfg, params, state, item_embs = export_dir
    tp, ts = init_scorer(jax.random.PRNGKey(99), mcfg)
    lp, ls, lmcfg = load_exported(d, tp, ts)
    np.testing.assert_array_equal(np.asarray(lp["ht_item"]),
                                  np.asarray(params["ht_item"]))
    np.testing.assert_array_equal(
        np.asarray(ls["head"][0]["bn"]["mean"]),
        np.asarray(state["head"][0]["bn"]["mean"]))
    assert lmcfg.num_item == mcfg.num_item


def test_cold_load_matches_warm_scorer(export_dir):
    """Scores from the cold-loaded bundle must equal the training-state
    scorer up to the fp16 item-embedding quantisation."""
    d, mcfg, scfg, params, state, item_embs = export_dir
    lp, ls, lmcfg, sidx = load_serving_bundle(d, scfg)
    user = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 6, 16)).astype(np.float32))
    warm, _ = scorer.scorer_forward(params, state, mcfg, user,
                                    jnp.asarray(item_embs[None, :64]), False)
    cold, _ = scorer.scorer_forward(lp, ls, lmcfg, user,
                                    sidx.item_embs[None, :64].astype(
                                        jnp.float32), False)
    np.testing.assert_allclose(np.asarray(cold), np.asarray(warm),
                               rtol=5e-3, atol=5e-3)


def test_verify_export_passes(export_dir):
    d, mcfg, scfg, *_ = export_dir
    report = verify_export(d, scfg, num_requests=5)
    assert report["requests_verified"] == 5
    assert report["num_items"] == 600


def test_search_config_round_trips_through_bundle(export_dir):
    # the exporter's full SearchConfig is recorded in signature.json so a
    # serving host reproduces its budgets/caps/policies exactly
    from nann_tpu.delivery.export import load_search_config
    d, _mcfg, scfg, *_ = export_dir
    loaded = load_search_config(d)
    assert loaded == scfg


def test_search_config_falls_back_for_old_bundles(tmp_path):
    import json
    (tmp_path / "signature.json").write_text(
        json.dumps({"semantics": "serving"}))
    from nann_tpu.delivery.export import load_search_config
    loaded = load_search_config(str(tmp_path))
    assert loaded.semantics == "serving"
