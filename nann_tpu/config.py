"""Configuration for nann_tpu jobs.

Mirrors the knob surface of the reference CLI (`NANN_impls/nann/config.py:16-91`)
but as typed dataclasses usable both programmatically and from the CLI driver
(`nann_tpu/main.py`). Paths are derived the same way (model/, embeddings/,
index/, export/ under one output root; dataset meta JSON merged in).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Sequence


def _makedirs(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


@dataclasses.dataclass
class ModelConfig:
    """Scorer architecture. Reference: NANN_impls/nann/model/model.py:20-233."""

    num_item: int = 1000
    num_cate: int = 100
    emb_dim: int = 32                 # id/cate embedding dim; item emb dim = 2*emb_dim
    max_seq_length: int = 50
    item_tower_dims: Sequence[int] = (64, 64, 64)    # 3 DNN layers, dim = 2*emb_dim
    head_dims: Sequence[int] = (128, 64, 32, 1)      # final layer bias-free
    # attention projections: d -> att_proj_mult1*d -> att_proj_mult2*d
    att_proj_mult1: int = 2
    att_proj_mult2: int = 4
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3          # tf.layers.batch_normalization default
    # compute dtype for the scorer matmuls ("bfloat16" on TPU, "float32" for tests)
    compute_dtype: str = "float32"

    @property
    def item_emb_dim(self) -> int:
        return 2 * self.emb_dim

    @property
    def user_emb_dim(self) -> int:
        return 2 * self.emb_dim


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters. Reference defaults: nann/config.py:22-42."""

    batch_size: int = 800
    train_epochs: int = 5
    learning_rate: float = 3e-3
    # lr schedule: "constant" (reference behavior, nann/config.py:26) or
    # "cosine" (decay to learning_rate * lr_final_ratio over the step budget).
    # Measured motivation: at 4.2M items the oracle ceiling DEGRADES
    # monotonically past step 10001 at constant 3e-3 (66.0% -> 54.3% over
    # 50k steps, docs/DESIGN.md round 4) — classic too-hot-late-training that
    # the reference's 5-epoch schedule never sees on its smaller per-step
    # corpus. Warmup applies to either schedule.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    lr_final_ratio: float = 0.01
    # cosine decay horizon; 0 = the loop's total step budget
    lr_total_steps: int = 0
    weight_decay: float = 1e-4
    adv_eps: float = 3e-5             # FGSM epsilon; 0 disables
    adv_weight: float = 1.0
    num_neg: int = 200                # negatives per positive
    save_freq: int = 5000
    print_freq: int = 50
    max_to_keep: int = 50             # checkpoint retention (Saver parity)
    seed: int = 0
    # parallelism: number of data-parallel shards (devices) for the train step
    dp: int = 1


def default_frontier_cap(num_items: int) -> int:
    """Catalogue-aware frontier capacity.

    The per-hop neighbor expansion grows with the catalogue (denser ground
    level + bigger budgets actually used), and a cap that silently truncates
    it is a recall leak that only appears at scale: measured at 4.2M items,
    cap 4096 saturated every ground hop and cost 13pp recall parity
    (64.6% -> 77.6% at 8192; 16384 flat — docs/DESIGN.md round-3 gap
    analysis). 4096 is right for <= ~2M items (at 100k-1M the mean expansion
    sits well under it)."""
    return 4096 if num_items <= 2_000_000 else 8192


@dataclasses.dataclass
class SearchConfig:
    """HNSW search budget. Reference: nann/config.py:50-57.

    Level order follows the reference convention: index 0 = ground level.
    """

    hnsw_start_level: int = 2
    num_scoring_per_level: Sequence[int] = (3, 1, 1)   # ground..start
    top_k_per_level: Sequence[int] = (400, 200, 100)   # ground..start
    topk_eval: Sequence[int] = (200,)
    # which search algorithm serves by default:
    #   "eval"    = the reference test-job rule (fresh candidates thresholded
    #               against the current k-th result, model.py:299-362) —
    #               measured equal recall at ~12% less scored work than the
    #               exported-graph loop, so it is the serving default here;
    #   "serving" = the reference's exported exec-graph loop
    #               (build_opt_graph.py:109-149), kept for contract parity.
    semantics: str = "eval"
    # static frontier capacity per scoring hop in the fused jitted search
    # (candidates*max_degree is the upper bound; this caps wasted FLOPs).
    # This single knob replaces the reference's 75-bucket warmup ladder:
    # the fused program has exactly one frontier shape per hop.
    frontier_cap: int = 4096
    # Optional PER-HOP frontier capacities, one per expansion hop in search
    # order (levels start-1..0, num_scoring_per_level[level] hops each; the
    # enter-point scoring is not a hop). The measured hop profile at 4.2M is
    # strongly non-uniform (L1 hop ~2.8k mean / 3.1k max vs ground hop 1
    # saturating 8192 — runs/tpu_batch_r3d.log), so one global cap pads the
    # cheap hops to the expensive hop's width; per-hop caps cut that padded
    # scorer work. None = use frontier_cap everywhere.
    frontier_cap_per_hop: Optional[Sequence[int]] = None
    # top-k implementation inside the fused search:
    #   "exact"  = lax.top_k — bit-exact reference semantics, but XLA lowers
    #              it to a FULL SORT on TPU;
    #   "approx" = lax.approx_max_k — the TPU-native partial-reduce
    #              (recall_target 0.95 per level; the merge/final top-k
    #              stays exact), measured-equal end recall at lower cost;
    #   "topk"   = lax.top_k partial selection for the fresh-node
    #              compaction only (exact results; measured to see whether
    #              XLA's TopK beats the full sort at f_cap-of-expansion).
    topk_impl: str = "exact"
    # per-hop structure:
    #   "filtered" = reference semantics: sort-based dedup + visited filter
    #                + compaction to frontier_cap, score the compacted set;
    #   "wide"     = score the ENTIRE neighbor expansion (masked), select
    #                candidates by top-k over scores, mark only selected
    #                nodes visited — no per-hop sorts at all. Scored-but-
    #                unselected nodes may be re-scored later (physical rows
    #                are cheap on the MXU; the visited set still prevents
    #                candidate cycling).
    hop_mode: str = "filtered"
    # visited-set representation inside the fused search:
    #   "bytemap" = per-query [n_items] uint8 epoch stamps — the direct
    #               BitmapRefDifference analogue. Its random 1-byte
    #               gather+scatter is the measured TPU bottleneck (~70% of
    #               search time, docs/DESIGN.md round-2 forensics II) and
    #               its memory is O(catalogue) per query;
    #   "list"    = visited ids kept as a sorted-mergeable LIST; membership,
    #               dedup and union are computed with sorts over tagged keys
    #               (2*id+tag) — no random gather/scatter at all, memory
    #               O(visited). Identical results to "bytemap".
    vis_impl: str = "list"
    # which expanded nodes get marked visited each hop:
    #   "scored" = mark only the <= frontier_cap nodes actually scored;
    #              truncated-away nodes stay reachable through other parents.
    #              THE DEFAULT, and the faithful equivalent of the reference
    #              SYSTEM: the reference's dynamic-shape graph scores every
    #              fresh node each hop (no truncation), so BitmapRefDifference
    #              marking everything it returns never blacklists unscored
    #              nodes there. Under a static frontier_cap it would —
    #              measured +20.7pp recall (51.2% -> 71.9% graph recall at
    #              97% of oracle, p100k_v8, docs/DESIGN.md) for ~15% more
    #              scored work;
    #   "all"    = literal BitmapRefDifference op semantics — every RETURNED
    #              fresh node is marked, including truncated-unscored ones.
    #              Kept for op-level parity experiments.
    mark_policy: str = "scored"

    def validate(self) -> None:
        assert len(self.num_scoring_per_level) == self.hnsw_start_level + 1
        assert len(self.top_k_per_level) == self.hnsw_start_level + 1
        assert self.num_scoring_per_level[self.hnsw_start_level] == 1
        assert self.topk_impl in ("exact", "approx", "topk"), self.topk_impl
        assert self.hop_mode in ("filtered", "wide"), self.hop_mode
        assert self.vis_impl in ("bytemap", "list"), self.vis_impl
        assert self.mark_policy in ("all", "scored"), self.mark_policy
        if self.frontier_cap_per_hop is not None:
            hops = sum(self.num_scoring_per_level[:self.hnsw_start_level])
            assert len(self.frontier_cap_per_hop) == hops, (
                f"frontier_cap_per_hop needs one entry per expansion hop "
                f"({hops} for levels {self.hnsw_start_level - 1}..0), got "
                f"{len(self.frontier_cap_per_hop)}")

    def hop_cap(self, hop_index: int) -> int:
        """Frontier capacity of the hop_index-th expansion hop (0-based, in
        search order)."""
        if self.frontier_cap_per_hop is not None:
            return int(self.frontier_cap_per_hop[hop_index])
        return self.frontier_cap


@dataclasses.dataclass
class IndexConfig:
    """HNSW build parameters. Reference: nann/delivery/build_hnsw_index.py:22-26."""

    num_neighbors: int = 32           # M; ground level stores up to 2M
    ef_construction: int = 200
    seed: int = 42


@dataclasses.dataclass
class PathConfig:
    """Derived output layout, same shape as reference nann/config.py:63-90."""

    output_root: str = "./output"
    dataset_dir: str = "./data"

    def __post_init__(self):
        self.model_save_dir = _makedirs(os.path.join(self.output_root, "model"))
        emb_dir = _makedirs(os.path.join(self.output_root, "embeddings"))
        self.item_ids_file = os.path.join(emb_dir, "item_ids.npy")
        self.item_embs_file = os.path.join(emb_dir, "item_embs.npy")
        self.index_dir = _makedirs(os.path.join(self.output_root, "index"))
        self.export_dir = _makedirs(os.path.join(self.output_root, "export"))
        self.log_file = os.path.join(self.output_root, "nann_tpu.log")


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    index: IndexConfig = dataclasses.field(default_factory=IndexConfig)
    paths: Optional[PathConfig] = None
    num_test_users: int = 10000

    @staticmethod
    def from_dataset_meta(meta_path: str, **overrides) -> "Config":
        """Load `ub_meta.json` (written by the data converter) into a Config,
        like reference nann/config.py:83-89."""
        with open(meta_path) as f:
            meta = json.load(f)
        cfg = Config(**overrides)
        cfg.model.num_item = meta["num_item"]
        cfg.model.num_cate = meta["num_cate"]
        cfg.model.max_seq_length = meta["max_length"]
        cfg.num_train_samples = meta.get("num_train_samples", 0)
        return cfg
