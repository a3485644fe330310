"""XLA cost_analysis on the real search program variants.

Compiles (cache-warm) each variant at items/batch and prints the compiler's
own estimate of bytes accessed + flops + #fusions, to localize where the
super-additive cost of the full program (ablate_bench.py) comes from:
launch-count, HBM traffic, or serial scheduling.

Usage: python scripts/cost_probe.py [--items 200000] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=200_000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--variants", nargs="+",
                    default=["full", "no_filter", "no_score", "none"])
    args = ap.parse_args()

    from bench import build_setup
    from nann_tpu.search import make_searcher
    from nann_tpu.search.beam import level_topn_default

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    mcfg, scfg, params, state, sidx = build_setup(args.items)
    rng = np.random.default_rng(1)
    userB = jnp.asarray(rng.standard_normal(
        (args.batch, mcfg.max_seq_length, mcfg.user_emb_dim)
    ).astype(np.float32))
    ltn = jnp.asarray(level_topn_default(scfg))

    def variant(name):
        kw = {}
        if name == "no_filter":
            kw["_filter"] = False
        elif name == "no_score":
            kw["_score"] = False
        elif name == "none":
            kw["_filter"] = False
            kw["_score"] = False
        return make_searcher(mcfg, scfg, **kw)

    for name in args.variants:
        searcher = variant(name)
        fB = jax.jit(jax.vmap(searcher, in_axes=(None, None, None, 0, None)))
        t0 = time.time()
        lowered = fB.lower(params, state, sidx, userB, ltn)
        comp = lowered.compile()
        dt = time.time() - t0
        try:
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
        except Exception as e:  # pragma: no cover
            ca = {"error": str(e)}
        flops = ca.get("flops", float("nan"))
        ba = ca.get("bytes accessed", float("nan"))
        out_ba = ca.get("bytes accessed output", float("nan"))
        # fusion/launch proxy: count ENTRY computation's top-level ops
        nfusion = nops = -1
        try:
            txt = comp.as_text()
            m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
            body = m.group(1) if m else txt
            nops = len(re.findall(r"\n\s+\S+ = ", body))
            nfusion = len(re.findall(r"= \S*fusion", body))
        except Exception:
            pass
        print(f"{name:12s} flops={flops/1e9:8.2f}G  bytes={ba/1e9:8.3f}GB  "
              f"out_bytes={out_ba/1e6:8.1f}MB  entry_ops={nops} "
              f"fusions={nfusion}  [compile {dt:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
