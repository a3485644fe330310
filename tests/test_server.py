"""HTTP serving shim tests (the reference's TF-Serving smoke-test shape)."""

import json
import urllib.request

import jax
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex
from nann_tpu.serving import Engine, EngineConfig
from nann_tpu.serving.server import NannServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    mcfg = ModelConfig(num_item=500, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(40, 20, 10), topk_eval=(40,),
                        frontier_cap=256)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((500, 16)).astype(np.float32)
    d = tmp_path_factory.mktemp("sidx")
    build_and_save_index(embs, 2, 8, str(d), ef_construction=30)
    sidx = SearchIndex.from_artifacts(load_index(str(d), 2, 16), embs,
                                      np.arange(1, 501, dtype=np.int32))
    engine = Engine(mcfg, scfg, params, state, sidx,
                    EngineConfig(batch_buckets=(1, 4), wait_ms=1.0))
    srv = NannServer(engine, port=0)
    srv.start()
    yield srv
    srv.stop()
    engine.shutdown()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_predict_contract(server):
    rng = np.random.default_rng(1)
    comm_seq = rng.standard_normal((1, 6 * 16)).astype(np.float32)
    # eval-semantics budget layout: [k_start, k_level1, k_level0, k_final];
    # k_final <= the ground-level k (the eval result pool, model.py:339-362)
    status, resp = _post(server.port, "/v1/models/nann:predict",
                         {"inputs": {"comm_seq": comm_seq.tolist(),
                                     "level_topn": [40, 20, 10, 8]}})
    assert status == 200, resp
    top_k = resp["outputs"]["top_k"][0]
    assert len(top_k) == 8
    assert len(set(top_k)) == 8  # unique items
    assert all(1 <= i <= 500 for i in top_k)


def test_predict_default_budget(server):
    rng = np.random.default_rng(2)
    comm_seq = rng.standard_normal((6, 16)).astype(np.float32)
    status, resp = _post(server.port, "/v1/models/nann:predict",
                         {"inputs": {"comm_seq": comm_seq.tolist()}})
    assert status == 200
    assert len(resp["outputs"]["top_k"][0]) == 40


def test_bad_request(server):
    status, resp = _post(server.port, "/v1/models/nann:predict",
                         {"inputs": {"level_topn": [1, 2, 3]}})
    assert status == 400
    assert "comm_seq" in resp["error"] or "bad inputs" in resp["error"]


def test_wrong_shape(server):
    status, resp = _post(server.port, "/v1/models/nann:predict",
                         {"inputs": {"comm_seq": [[1.0, 2.0]]}})
    assert status == 400


def test_reload_endpoint(server, tmp_path):
    """POST :reload with a fresh export bundle hot-swaps the model."""
    import shutil
    import jax as _jax
    from nann_tpu.delivery import export_model
    from nann_tpu.index import build_and_save_index as _build
    from nann_tpu.models import init_scorer as _init

    eng = server.engine
    mcfg, scfg = eng.mcfg, eng.scfg
    rng = np.random.default_rng(9)
    user = rng.standard_normal((6, 16)).astype(np.float32)
    before, _ = eng.search_sync(user)

    params2, state2 = _init(_jax.random.PRNGKey(77), mcfg)
    embs = rng.standard_normal((500, 16)).astype(np.float32)
    export_dir = str(tmp_path / "bundle")
    export_model(export_dir, params2, state2, mcfg, scfg,
                 np.arange(1, 501, dtype=np.int32), embs)
    _build(embs, 2, 8, export_dir + "/index", ef_construction=25)

    status, resp = _post(server.port, "/v1/models/nann:reload",
                         {"export_dir": export_dir})
    assert status == 200, resp
    after, _ = eng.search_sync(user)
    assert not np.array_equal(before, after)

    status, resp = _post(server.port, "/v1/models/nann:reload", {})
    assert status == 400


def test_model_status(server):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/v1/models/nann", timeout=10) as r:
        assert r.status == 200
        assert json.loads(r.read())["model_version_status"][0]["state"] == \
            "AVAILABLE"
