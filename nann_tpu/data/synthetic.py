"""Synthetic UserBehavior-like dataset for tests and benchmarks.

Generates the same sample contract as the reference converter
(NANN_impls/nann/data_provider/convert_UB_to_tfrecord.py:121-136): per-sample
`item_ids`/`cate_ids` behavior prefix (0-padded to max_length, ids 1-based,
0 = missing), ground-truth `gt_item_id`/`gt_cate_id`, and `weight_tag` =
popularity probability of the ground-truth item.

The generator plants learnable structure: items live in clusters (categories),
and each user browses a small number of clusters with Zipfian item popularity
— so a trained scorer beats random retrieval and recall tests are meaningful.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def synthetic_dataset(num_item: int = 2000, num_cate: int = 50,
                      num_users: int = 500, max_seq_length: int = 20,
                      samples_per_user: int = 4, seed: int = 0
                      ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray],
                                 Dict[str, np.ndarray]]:
    """Returns (train_samples, test_samples, item_features).

    train/test samples: dict of arrays
        item_ids   [N, L] int32, cate_ids [N, L] int32,
        gt_item_id [N] int32,    gt_cate_id [N] int32,  weight_tag [N] float32
    item_features: item_id/cate_id [num_item] int32 (1-based, in array order),
        weight_tag [num_item] float32 (popularity probabilities, sum to 1).
    """
    rng = np.random.default_rng(seed)

    # item -> category assignment (contiguous blocks, 1-based ids)
    item_cate = rng.integers(1, num_cate + 1, size=num_item).astype(np.int32)
    # Zipfian global popularity
    pop = 1.0 / np.arange(1, num_item + 1) ** 0.8
    pop = rng.permutation(pop)
    pop /= pop.sum()

    # per-category item lists for user preference sampling
    cate_items = [np.where(item_cate == c)[0] for c in range(num_cate + 1)]

    def gen_split(n_users: int, per_user: int, split_seed: int):
        r = np.random.default_rng(split_seed)
        rows_item, rows_cate, gts_i, gts_c, wts = [], [], [], [], []
        for _ in range(n_users):
            # each user prefers 1-3 categories
            prefs = r.choice(np.arange(1, num_cate + 1),
                             size=r.integers(1, 4), replace=False)
            pool = np.concatenate([cate_items[c] for c in prefs])
            if pool.size == 0:
                pool = np.arange(num_item)
            p = pop[pool] / pop[pool].sum()
            for _ in range(per_user):
                seq_len = int(r.integers(max(2, max_seq_length // 2),
                                         max_seq_length + 1))
                picks = r.choice(pool, size=seq_len, replace=True, p=p)
                seq, gt = picks[:-1], picks[-1]
                row_i = np.zeros(max_seq_length, np.int32)
                row_c = np.zeros(max_seq_length, np.int32)
                row_i[:len(seq)] = seq + 1          # 1-based
                row_c[:len(seq)] = item_cate[seq]
                rows_item.append(row_i)
                rows_cate.append(row_c)
                gts_i.append(gt + 1)
                gts_c.append(item_cate[gt])
                wts.append(pop[gt])
        return {
            "item_ids": np.stack(rows_item),
            "cate_ids": np.stack(rows_cate),
            "gt_item_id": np.array(gts_i, np.int32),
            "gt_cate_id": np.array(gts_c, np.int32),
            "weight_tag": np.array(wts, np.float32),
        }

    train = gen_split(num_users, samples_per_user, seed + 1)
    test = gen_split(max(num_users // 5, 8), 1, seed + 2)
    item_features = {
        "item_id": np.arange(1, num_item + 1, dtype=np.int32),
        "cate_id": item_cate,
        "weight_tag": pop.astype(np.float32),
    }
    return train, test, item_features
