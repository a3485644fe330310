"""Int8 embedding quantization: round trip and end-to-end search recall."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.index.quantize import (QuantizedTable, dequantize_rows,
                                     pack_quantized, quantize_embeddings,
                                     unpack_rows)
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex, make_searcher
from nann_tpu.search.beam import level_topn_default


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((100, 32)).astype(np.float32) * 3
    q, scales = quantize_embeddings(embs)
    deq = np.asarray(dequantize_rows(jnp.asarray(q), jnp.asarray(scales),
                                     jnp.float32))
    err = np.abs(deq - embs).max() / np.abs(embs).max()
    assert err < 0.01, err


def test_zero_row_safe():
    embs = np.zeros((3, 8), np.float32)
    q, scales = quantize_embeddings(embs)
    assert np.all(q == 0)
    deq = np.asarray(dequantize_rows(jnp.asarray(q), jnp.asarray(scales)))
    assert np.all(deq == 0)


def test_packed_table_take():
    rng = np.random.default_rng(1)
    embs = rng.standard_normal((50, 16)).astype(np.float32)
    table = QuantizedTable(embs)
    assert table.packed.shape == (50, 20)
    ids = jnp.asarray([0, 7, 49])
    rows = np.asarray(table.take(ids, jnp.float32))
    np.testing.assert_allclose(rows, embs[[0, 7, 49]], atol=0.03, rtol=0.05)


def test_unpack_matches_take():
    rng = np.random.default_rng(2)
    embs = rng.standard_normal((20, 8)).astype(np.float32)
    packed = pack_quantized(embs)
    rows = jnp.take(packed, jnp.asarray([3, 5]), axis=0)
    out = np.asarray(unpack_rows(rows, 8, jnp.float32))
    np.testing.assert_allclose(out, embs[[3, 5]], atol=0.03, rtol=0.05)


def test_search_with_int8_index_close_to_fp32(tmp_path):
    mcfg = ModelConfig(num_item=800, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(60, 30, 15), topk_eval=(60,),
                        frontier_cap=256)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((800, 16)).astype(np.float32)
    build_and_save_index(embs, 2, 8, str(tmp_path), ef_construction=30)
    art = load_index(str(tmp_path), 2, 16)
    ids = np.arange(1, 801, dtype=np.int32)

    s32 = SearchIndex.from_artifacts(art, embs, ids, dtype=jnp.float32)
    s8 = SearchIndex.from_artifacts(art, embs, ids, dtype="int8")
    assert s8.item_embs.dtype == jnp.int8

    search = jax.jit(make_searcher(mcfg, scfg))
    user = jnp.asarray(rng.standard_normal((6, 16)).astype(np.float32))
    ltn = jnp.asarray(level_topn_default(scfg))
    out32 = search(params, state, s32, user, ltn)
    out8 = search(params, state, s8, user, ltn)
    a = np.asarray(out32[0]); a = a[a >= 0]
    b = np.asarray(out8[0]); b = b[b >= 0]
    overlap = len(set(a.tolist()) & set(b.tolist())) / len(a)
    assert overlap > 0.85, overlap
