"""TPU-native equivalents of the reference's custom-op layer.

The reference implements its retrieval plumbing as CPU C++ TF ops
(tensorflow/core/user_ops/, SURVEY.md §2.2). Here the same capabilities are
JAX/XLA functions (static-shape, mask-based) plus Pallas kernels for the hot
paths. Ragged data travels as (values, row_splits) pairs like the reference,
with dense-padded variants for on-device use.

  reference op                      -> here
  ---------------------------------------------------------------
  BitmapInit/Difference/RefDifference  ops.bitmap
  BloomFilterDifference                ops.bitmap.bloom_filter_difference
  SetUnion/Intersection/Difference     ops.ragged_device (compiled, padded
                                        -dense); ops.ragged (host tooling)
  GroupGather / BatchGatherOnRT /
    BatchConcatOnRT / SplitsGather     ops.ragged_device gathers (compiled);
                                        ops.ragged (host tooling)
  BlazeTopK / BatchTopKOnRT            ops.topk (BlazeTopK device);
                                        ops.ragged_device.batch_topk_on_rt
                                        (per-row runtime-k, device)
  tree ops (TDM RangeIndicator)        ops.tree
  HugeConst                            (unneeded: jax arrays load from npy
                                        without protobuf limits)
  BlazeGeneralMap                      ops.idmap
"""

from . import bitmap, ragged, ragged_device, topk, tree, idmap

__all__ = ["bitmap", "ragged", "ragged_device", "topk", "tree", "idmap"]
