"""Tests for the native CSV loader + UserBehavior converter."""

import json
import numpy as np

from nann_tpu.data.user_behavior import convert_user_behavior, load_csv


def _write_csv(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(",".join(map(str, r)) + "\n")


def test_load_csv_basic(tmp_path):
    csv = tmp_path / "ub.csv"
    _write_csv(csv, [
        (100, 7, 3, "pv", 11),
        (100, 8, 3, "pv", 12),
        (200, 7, 3, "buy", 13),
    ])
    cols, item_cate = load_csv(str(csv))
    meta = cols.pop("_meta")
    assert meta == {"num_user": 2, "num_item": 2, "num_cate": 1}
    np.testing.assert_array_equal(cols["user"], [0, 0, 1])
    np.testing.assert_array_equal(cols["item"], [0, 1, 0])
    np.testing.assert_array_equal(cols["ts"], [11, 12, 13])
    np.testing.assert_array_equal(item_cate, [0, 0])


def test_load_csv_no_trailing_newline(tmp_path):
    """The last row must parse even without a final newline (the C parser's
    carry path)."""
    csv = tmp_path / "ub.csv"
    with open(csv, "w") as f:
        f.write("1,10,3,pv,100\n2,11,4,buy,200")  # no trailing \n
    cols, item_cate = load_csv(str(csv))
    meta = cols.pop("_meta")
    assert meta["num_user"] == 2 and meta["num_item"] == 2
    np.testing.assert_array_equal(cols["ts"], [100, 200])


def test_load_csv_skips_short_rows(tmp_path):
    csv = tmp_path / "ub.csv"
    with open(csv, "w") as f:
        f.write("1,10,3,pv,100\nbadrow\n2,11,4,pv,200\n")
    cols, _ = load_csv(str(csv))
    cols.pop("_meta")
    assert len(cols["user"]) == 2


def test_convert_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    # 30 users with 12-20 interactions over 40 items / 5 cates
    item_cate = {i: i % 5 + 1 for i in range(40)}
    for u in range(30):
        n = rng.integers(12, 21)
        ts = np.sort(rng.integers(0, 10_000, n))
        for t in ts:
            it = int(rng.integers(0, 40))
            rows.append((u, it, item_cate[it], "pv", int(t)))
    csv = tmp_path / "ub.csv"
    _write_csv(csv, rows)

    out = tmp_path / "out"
    meta = convert_user_behavior(str(csv), str(out), max_length=10,
                                 train_min_length=5, test_min_length=5,
                                 num_test_user=5, num_validate_user=5)
    assert meta["num_item"] == 40
    assert meta["num_test_user"] == 5

    train = np.load(out / "ub_train.npz")
    test = np.load(out / "ub_test.npz")
    items = np.load(out / "ub_items.npz")
    with open(out / "ub_meta.json") as f:
        assert json.load(f)["num_item"] == 40

    # contract: 1-based ids, 0 padding, shapes
    assert train["item_ids"].shape[1] == 10
    assert train["gt_item_id"].min() >= 1
    assert train["gt_item_id"].max() <= 40
    assert test["gt_item_id"].shape == (5,)
    assert items["weight_tag"].sum() == np.float32(1.0) or \
        abs(items["weight_tag"].sum() - 1.0) < 1e-5
    # weight_tag of each sample = popularity of its gt item
    wt = items["weight_tag"][train["gt_item_id"] - 1]
    np.testing.assert_allclose(train["weight_tag"], wt, rtol=1e-6)
    # sequences are the user's history: padded rows have zeros at the tail only
    row = train["item_ids"][0]
    nz = np.nonzero(row)[0]
    if len(nz) < len(row):
        assert np.all(row[len(nz):] == 0)


def test_packed_conversion_equals_materialized(tmp_path):
    """packed=True must emit the SAME train sample set as the materialised
    converter, with PackedUB building identical padded rows lazily."""
    rng = np.random.default_rng(1)
    rows = []
    item_cate = {i: i % 7 + 1 for i in range(60)}
    for u in range(40):
        n = rng.integers(12, 25)
        ts = np.sort(rng.integers(0, 10_000, n))
        for t in ts:
            it = int(rng.integers(0, 60))
            rows.append((u, it, item_cate[it], "pv", int(t)))
    csv = tmp_path / "ub.csv"
    _write_csv(csv, rows)

    kw = dict(max_length=10, train_min_length=5, test_min_length=5,
              num_test_user=5, num_validate_user=5, seed=0)
    out_m = tmp_path / "mat"
    convert_user_behavior(str(csv), str(out_m), **kw)
    out_p = tmp_path / "packed"
    meta_p = convert_user_behavior(str(csv), str(out_p), packed=True, **kw)

    from nann_tpu.data.user_behavior import PackedUB
    mat = np.load(out_m / "ub_train.npz")
    packed = PackedUB(str(out_p))
    assert meta_p["packed"] is True
    assert packed.num_samples == len(mat["gt_item_id"])

    # materialise ALL packed samples and compare as unordered sets of rows
    # (the materialised split is disk-shuffled)
    all_idx = np.arange(packed.num_samples)
    got = packed.materialize(all_idx)

    def canon(d):
        rows = np.concatenate(
            [d["item_ids"], d["cate_ids"], d["gt_item_id"][:, None],
             d["gt_cate_id"][:, None]], axis=1)
        return rows[np.lexsort(rows.T[::-1])]

    np.testing.assert_array_equal(
        canon(got), canon({k: mat[k] for k in mat.files}))
    wt = np.load(out_p / "ub_items.npz")["weight_tag"]
    np.testing.assert_allclose(got["weight_tag"],
                               wt[got["gt_item_id"] - 1], rtol=1e-6)

    # BatchIterator integration: lazy columns batch and shuffle unchanged
    from nann_tpu.data import BatchIterator
    it = BatchIterator(packed, batch_size=16, epochs=1, seed=0)
    b = next(iter(it))
    assert b["item_ids"].shape == (16, 10)
    assert b["gt_item_id"].min() >= 1
