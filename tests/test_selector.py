"""ModelReloader / ModelSelector tests."""

import os
import time

import jax
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.delivery import export_model
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex
from nann_tpu.serving import Engine, EngineConfig
from nann_tpu.serving.selector import ModelReloader, ModelSelector


@pytest.fixture(scope="module")
def parts(tmp_path_factory):
    mcfg = ModelConfig(num_item=400, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(30, 15, 8), topk_eval=(30,),
                        frontier_cap=128)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((400, 16)).astype(np.float32)
    ids = np.arange(1, 401, dtype=np.int32)
    idx_dir = tmp_path_factory.mktemp("selidx")
    build_and_save_index(embs, 2, 8, str(idx_dir), ef_construction=25)
    sidx = SearchIndex.from_artifacts(load_index(str(idx_dir), 2, 16),
                                      embs, ids)
    return mcfg, scfg, params, state, sidx, embs, ids, idx_dir


def _make_engine(parts):
    mcfg, scfg, params, state, sidx, *_ = parts
    return Engine(mcfg, scfg, params, state, sidx,
                  EngineConfig(batch_buckets=(1, 2), wait_ms=1.0,
                               warmup=False))


def test_reloader_detects_bundle_change(parts, tmp_path):
    mcfg, scfg, params, state, sidx, embs, ids, idx_dir = parts
    export_dir = str(tmp_path / "export")
    export_model(export_dir, params, state, mcfg, scfg, ids, embs)
    import shutil
    shutil.copytree(str(idx_dir), os.path.join(export_dir, "index"))

    eng = _make_engine(parts)
    try:
        rng = np.random.default_rng(1)
        user = rng.standard_normal((6, 16)).astype(np.float32)
        before, _ = eng.search_sync(user)

        reloader = ModelReloader(eng, export_dir, scfg, poll_interval_s=0.1)
        assert not reloader.check_once()          # unchanged -> no reload

        # write a new model into the bundle
        params2, state2 = init_scorer(jax.random.PRNGKey(42), mcfg)
        time.sleep(0.05)
        export_model(export_dir, params2, state2, mcfg, scfg, ids, embs)
        assert reloader.check_once()              # change -> hot swap
        after, _ = eng.search_sync(user)
        assert reloader.reload_count == 1
        assert not np.array_equal(before, after)
    finally:
        eng.shutdown()


def test_selector_switching(parts):
    eng_a = _make_engine(parts)
    eng_b = _make_engine(parts)
    try:
        sel = ModelSelector({"a": eng_a, "b": eng_b})
        assert sel.active_name == "a"
        sel.select("b")
        assert sel.active is eng_b
        with pytest.raises(KeyError):
            sel.select("missing")

        sel.select("a")
        sel.start_switching(0.05, cold_switching=True)
        time.sleep(0.18)
        sel.stop()
        # it cycled at least once
        assert sel.active_name in ("a", "b")
        rng = np.random.default_rng(2)
        out = sel.submit(rng.standard_normal((6, 16)).astype(np.float32))
        items, _ = out.result(timeout=30)
        assert len(items) > 0
    finally:
        eng_a.shutdown()
        eng_b.shutdown()
