"""gRPC PredictionService parity tests.

Covers the reference's TF-Serving smoke-test shape over real gRPC
(README.md:205-218) and cross-validates the hand-coded TensorProto wire
codec against tensorflow's own generated tensor_pb2.
"""

import jax
import numpy as np
import pytest

from nann_tpu.config import ModelConfig, SearchConfig
from nann_tpu.index import build_and_save_index, load_index
from nann_tpu.models import init_scorer
from nann_tpu.search import SearchIndex
from nann_tpu.serving import Engine, EngineConfig
from nann_tpu.serving import tfs_proto

grpc = pytest.importorskip("grpc")


# ------------------------------------------------------------ codec alone


def test_tensor_roundtrip_dtypes():
    rng = np.random.default_rng(0)
    for arr in [
        rng.standard_normal((3, 5)).astype(np.float32),
        rng.standard_normal((2, 2, 2)).astype(np.float16),
        rng.integers(-5, 5, (7,)).astype(np.int32),
        rng.integers(0, 2, (4, 1)).astype(bool),
        rng.integers(-9, 9, (1, 6)).astype(np.int64),
    ]:
        out = tfs_proto.decode_tensor(tfs_proto.encode_tensor(arr))
        assert out.dtype == arr.dtype and out.shape == arr.shape
        np.testing.assert_array_equal(out, arr)


def test_predict_request_roundtrip():
    rng = np.random.default_rng(1)
    inputs = {"comm_seq": rng.standard_normal((1, 96)).astype(np.float16),
              "level_topn": np.array([40, 20, 10, 8], np.int32)}
    buf = tfs_proto.encode_predict_request(inputs, "nann", "serving_default")
    spec, got = tfs_proto.decode_predict_request(buf)
    assert spec == {"name": "nann", "signature_name": "serving_default"}
    assert set(got) == {"comm_seq", "level_topn"}
    np.testing.assert_array_equal(got["comm_seq"], inputs["comm_seq"])
    np.testing.assert_array_equal(got["level_topn"], inputs["level_topn"])


def test_tensor_wire_matches_tensorflow():
    """Byte-level cross-check against TF's generated TensorProto — both
    directions, including the *_val (non-content) layout tf.make_tensor_proto
    emits for python scalars/lists."""
    tensor_pb2 = pytest.importorskip("tensorflow.core.framework.tensor_pb2")
    from tensorflow.core.framework import tensor_shape_pb2  # noqa: F401

    rng = np.random.default_rng(2)
    for arr in [rng.standard_normal((2, 160)).astype(np.float16),
                np.array([40, 20, 10], np.int32),
                rng.standard_normal((5,)).astype(np.float32)]:
        # ours -> TF parse
        tp = tensor_pb2.TensorProto.FromString(tfs_proto.encode_tensor(arr))
        assert tp.dtype == tfs_proto._NP_TO_DT[arr.dtype]
        assert [d.size for d in tp.tensor_shape.dim] == list(arr.shape)
        assert tp.tensor_content == arr.tobytes()
        # TF emit (tensor_content form) -> our parse
        back = tfs_proto.decode_tensor(tp.SerializeToString())
        np.testing.assert_array_equal(back, arr)

    # *_val fallback layouts (what make_tensor_proto does for py lists)
    tp = tensor_pb2.TensorProto(dtype=3)  # DT_INT32
    tp.tensor_shape.dim.add().size = 3
    tp.int_val.extend([40, -20, 10])
    got = tfs_proto.decode_tensor(tp.SerializeToString())
    np.testing.assert_array_equal(got, np.array([40, -20, 10], np.int32))

    tp = tensor_pb2.TensorProto(dtype=1)  # DT_FLOAT
    tp.tensor_shape.dim.add().size = 2
    tp.float_val.extend([1.5, -2.5])
    got = tfs_proto.decode_tensor(tp.SerializeToString())
    np.testing.assert_array_equal(got, np.array([1.5, -2.5], np.float32))

    tp = tensor_pb2.TensorProto(dtype=19)  # DT_HALF: bit patterns in int32
    tp.tensor_shape.dim.add().size = 2
    half = np.array([0.5, -3.0], np.float16)
    tp.half_val.extend(half.view(np.uint16).tolist())
    got = tfs_proto.decode_tensor(tp.SerializeToString())
    np.testing.assert_array_equal(got, half)


# ------------------------------------------------------- live gRPC predict


@pytest.fixture(scope="module")
def grpc_server(tmp_path_factory):
    from nann_tpu.serving.grpc_server import NannGrpcServer

    mcfg = ModelConfig(num_item=500, num_cate=10, emb_dim=8, max_seq_length=6,
                       item_tower_dims=(16, 16, 16), head_dims=(16, 8, 8, 1))
    scfg = SearchConfig(top_k_per_level=(40, 20, 10), topk_eval=(40,),
                        frontier_cap=256)
    params, state = init_scorer(jax.random.PRNGKey(0), mcfg)
    rng = np.random.default_rng(0)
    embs = rng.standard_normal((500, 16)).astype(np.float32)
    d = str(tmp_path_factory.mktemp("sidx"))
    build_and_save_index(embs, 2, 8, d, ef_construction=30)
    sidx = SearchIndex.from_artifacts(load_index(d, 2, 16), embs,
                                      np.arange(1, 501, dtype=np.int32))
    engine = Engine(mcfg, scfg, params, state, sidx,
                    EngineConfig(batch_buckets=(1, 4), wait_ms=1.0))
    srv = NannGrpcServer(engine, port=0)
    srv.start()
    yield srv
    srv.stop()
    engine.shutdown()


def test_grpc_predict_smoke_shape(grpc_server):
    """The reference README's smoke request verbatim: fp16 [1, L*d]
    comm_seq + int32 level_topn over a real grpc channel."""
    from nann_tpu.serving.grpc_server import make_client_call

    rng = np.random.default_rng(3)
    comm = rng.standard_normal((1, 6 * 16)).astype(np.float16)
    with grpc.insecure_channel(f"127.0.0.1:{grpc_server.port}") as ch:
        call = make_client_call(ch)
        out = call({"comm_seq": comm,
                    "level_topn": np.array([40, 20, 10, 8], np.int32)})
    assert set(out) == {"top_k", "scores"}
    assert out["top_k"].shape[0] == 1 and out["top_k"].dtype == np.int32
    ids = out["top_k"][0]
    ids = ids[ids > 0]
    assert 0 < ids.size <= 8 and np.unique(ids).size == ids.size
    assert np.all((ids >= 1) & (ids <= 500))
    # scores sorted descending over valid slots
    sc = out["scores"][0][:ids.size]
    assert np.all(np.diff(sc) <= 1e-5)


def test_grpc_predict_batch_and_parity_with_engine(grpc_server):
    """A [B, L*d] request returns one row per query, equal to direct
    engine.search_sync results."""
    from nann_tpu.serving.grpc_server import make_client_call

    rng = np.random.default_rng(4)
    comm = rng.standard_normal((3, 6 * 16)).astype(np.float32)
    with grpc.insecure_channel(f"127.0.0.1:{grpc_server.port}") as ch:
        call = make_client_call(ch)
        out = call({"comm_seq": comm})
    assert out["top_k"].shape[0] == 3
    for i in range(3):
        it, sc = grpc_server.engine.search_sync(comm[i].reshape(6, 16))
        got = out["top_k"][i][:len(it)]
        np.testing.assert_array_equal(got, np.asarray(it, np.int32))


def test_grpc_bad_input_rejected(grpc_server):
    from nann_tpu.serving.grpc_server import make_client_call

    with grpc.insecure_channel(f"127.0.0.1:{grpc_server.port}") as ch:
        call = make_client_call(ch)
        with pytest.raises(grpc.RpcError) as ei:
            call({"comm_seq": np.zeros((1, 7), np.float32)})
        assert ei.value.code() == grpc.StatusCode.INVALID_ARGUMENT
        with pytest.raises(grpc.RpcError) as ei:
            call({"level_topn": np.array([1, 2, 3], np.int32)})
        assert ei.value.code() == grpc.StatusCode.INVALID_ARGUMENT
