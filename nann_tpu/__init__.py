"""nann_tpu — a TPU-native model-based approximate-nearest-neighbor retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of alibaba/NANN
(reference: /root/reference, CIKM'22 "Approximate Nearest Neighbor Search under
Neural Similarity Metric for Large-Scale Recommendation"):

  * train an arbitrary deep user-item scorer (target attention) with FGSM
    adversarial regularisation, decoupled from the index,
  * build an HNSW graph over trained item embeddings (native C++ builder),
  * retrieve by greedy/beam graph search where every hop scores the frontier
    with the DNN instead of a dot product — expressed as a single jitted XLA
    program per frontier bucket,
  * serve with a bucketed-compilation engine (warmup ladder, admission
    deadlines, hot model swap) and benchmark with a blaze-benchmark-equivalent
    load harness.

Layer map (TPU-first, not a port):
  models/    pure-JAX scorer (embedding tables, towers, nonlinear attention, MLP head)
  train/     negative sampling, logQ-corrected loss, FGSM, AdamW train step, DP sharding
  data/      UserBehavior conversion + input pipeline (no TF dependency)
  index/     HNSW build (C++ via ctypes) + flat npy artifact contract
  search/    brute-force oracle + fused bucketed beam search (the serving compute path)
  ops/       Pallas TPU kernels (visited bitmap, masked top-k, fixed-degree gather)
  parallel/  mesh / sharding / collectives helpers (DP + row-sharded index)
  serving/   engine (warmup, deadlines, hot swap) + load-generator benchmark
  delivery/  export pipeline: params -> bf16 artifacts + index npys + signature
"""

__version__ = "0.1.0"
