"""Per-hop frontier-cap autotuning: measure, then compile to the measured width.

Every expansion hop of the fused search program is its own static shape, so
each can carry its own frontier capacity (SearchConfig.frontier_cap_per_hop)
at zero structural cost. The measured 4.2M-item hop profile is wildly
non-uniform — [enter ~4.0k, L1 ~2.8k, ground 8.1k / 2.3k / 0.9k] scored per
hop (docs/DESIGN.md round 4) — so one global cap sized for the widest hop
pads every other hop to ~2x its real work (~49% average row utilization at
cap 8192).

This module is the runtime analogue of the reference's warmup-ladder
calibration (blaze_xla_predictor.cc:79-140), applied to the frontier axis
instead of the batch axis: probe the search at the catalogue-default scalar
cap, record the per-hop scored maxima, and return per-hop caps with headroom.
A hop whose probes never reach its tuned cap runs bit-identically to the
scalar-cap program (the cap only pads); a hop that saturates the probe cap
keeps the full scalar cap.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig, SearchConfig


def measure_hop_profile(mcfg: ModelConfig, scfg: SearchConfig, params, state,
                        sidx, probe_users: np.ndarray,
                        level_topn: Optional[np.ndarray] = None,
                        batch: int = 64) -> np.ndarray:
    """Scored-items-per-hop over a probe set: [num_probes, hops] int32.

    Runs the search at scfg's own (scalar or per-hop) caps; probe_users is
    [N, L, d_user] fp32.
    """
    import jax
    import jax.numpy as jnp

    from .beam import level_topn_default, make_searcher

    search = jax.jit(jax.vmap(make_searcher(mcfg, scfg),
                              in_axes=(None, None, None, 0, None)))
    ltn = jnp.asarray(level_topn if level_topn is not None
                      else level_topn_default(scfg))
    rows = []
    n = len(probe_users)
    for s in range(0, n, batch):
        chunk = probe_users[s:s + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        _ids, _scores, ns = search(params, state, sidx,
                                   jnp.asarray(chunk, jnp.float32), ltn)
        rows.append(np.asarray(ns)[:len(chunk) - pad if pad else batch])
    return np.concatenate(rows)


def tuned_hop_caps(profile: np.ndarray, scalar_cap: int,
                   margin: float = 1.3, quantum: int = 512,
                   floor: int = 512) -> Tuple[int, ...]:
    """Per-hop caps from a measured profile: max-per-hop * margin, rounded up
    to `quantum` (TPU-friendly lane multiples), clipped to [floor,
    scalar_cap]. A hop whose probes saturated the scalar cap (max == cap)
    keeps the full scalar cap — its true width is unknown."""
    maxima = profile.max(axis=0).astype(np.int64)
    caps = []
    for m in maxima:
        if m >= scalar_cap:
            caps.append(int(scalar_cap))
            continue
        want = int(np.ceil(m * margin / quantum) * quantum)
        caps.append(int(min(max(want, floor), scalar_cap)))
    return tuple(caps)


def autotune_hop_caps(mcfg: ModelConfig, scfg: SearchConfig, params, state,
                      sidx, probe_users: np.ndarray,
                      level_topn: Optional[np.ndarray] = None,
                      margin: float = 1.3,
                      report: Optional[dict] = None) -> SearchConfig:
    """Probe at scfg's scalar cap and return a SearchConfig whose
    frontier_cap_per_hop matches the measured profile (one extra compile for
    the caller's next jit). The returned config also keeps the scalar cap as
    the saturation fallback for hops the probes maxed out.

    If `report` is passed (a dict), it is filled with the tuning provenance
    (probe maxima per hop, margin, probe count) so exporters can persist how
    the caps were derived — a production query whose expansion exceeds a
    tuned cap is truncated silently at serve time, and the recorded maxima
    are what make that risk auditable (round-4 advisor)."""
    import dataclasses

    base = dataclasses.replace(scfg, frontier_cap_per_hop=None)
    profile = measure_hop_profile(mcfg, base, params, state, sidx,
                                  probe_users, level_topn)
    # num_scoring row 0 is the enter-point evaluation (a static count, not a
    # frontier hop); frontier_cap_per_hop covers the expansion hops only
    caps = tuned_hop_caps(profile[:, 1:], base.frontier_cap, margin=margin)
    if report is not None:
        report.update({
            "num_probes": int(profile.shape[0]),
            "probe_hop_maxima": profile[:, 1:].max(axis=0).astype(int).tolist(),
            "probe_hop_means": [round(float(x), 1)
                                for x in profile[:, 1:].mean(axis=0)],
            "margin": margin,
            "scalar_cap": int(base.frontier_cap),
        })
    return dataclasses.replace(scfg, frontier_cap_per_hop=caps)
