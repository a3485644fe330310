"""Model hot-reload and multi-model selection.

Parity with the reference's serving-side model management
(blaze-benchmark/benchmark/core/model.cc:384-476):
  ModelReloader  — double-buffered reload: watches an export directory and,
                   when its version marker changes, cold-loads the new bundle
                   off-thread and atomically swaps it into the engine
                   (in-flight requests finish on the old model).
  ModelSelector  — named engines with an active pointer and optional timed
                   switching (switch_interval / cold_switching semantics).
"""

from __future__ import annotations

import os
import threading
from typing import Callable, Dict, Optional

from ..config import SearchConfig
from ..utils import get_logger
from .engine import Engine

logger = get_logger("nann_tpu.selector")


def _version_marker(export_dir: str) -> str:
    """The bundle's version marker — the reload trigger.

    export_model writes VERSION last (atomically), so a non-empty marker
    means the bundle on disk is complete; polling max-mtime (the old scheme)
    could catch a half-written export and cold-load a mixed bundle. Falls
    back to max-mtime for bundles written by other tools."""
    from ..delivery.export import read_version
    v = read_version(export_dir)
    if v:
        return v
    latest = 0.0
    for root, _dirs, files in os.walk(export_dir):
        for f in files:
            try:
                latest = max(latest, os.path.getmtime(os.path.join(root, f)))
            except OSError:
                pass
    return f"mtime:{latest}" if latest else ""


class ModelReloader:
    """Watch an export dir; hot-swap the engine when the bundle changes."""

    def __init__(self, engine: Engine, export_dir: str, scfg: SearchConfig,
                 poll_interval_s: float = 5.0,
                 loader: Optional[Callable] = None):
        self.engine = engine
        self.export_dir = export_dir
        self.scfg = scfg
        self.poll_interval_s = poll_interval_s
        self._loader = loader or self._default_loader
        self._marker = _version_marker(export_dir)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.reload_count = 0

    def _default_loader(self):
        from ..delivery.verify_export import load_serving_bundle
        params, state, _mcfg, sidx = load_serving_bundle(
            self.export_dir, self.scfg)
        return params, state, sidx

    def check_once(self) -> bool:
        """Poll once; reload if the bundle changed. Returns True on reload."""
        marker = _version_marker(self.export_dir)
        if not marker or marker == self._marker:
            return False
        logger.info(f"bundle change detected in {self.export_dir}; reloading")
        params, state, sidx = self._loader()       # off the serving path
        # if another export landed while we were loading, the files we read
        # may span two bundles — skip the swap and retry next poll
        if _version_marker(self.export_dir) != marker:
            logger.info("bundle changed again during load; skipping swap")
            return False
        self.engine.swap_model(params, state, sidx)
        self._marker = marker
        self.reload_count += 1
        return True

    def start(self) -> None:
        def loop():
            while not self._stop.wait(self.poll_interval_s):
                try:
                    self.check_once()
                except Exception as e:  # noqa: BLE001 — keep serving old model
                    logger.info(f"reload failed, keeping current model: {e}")

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)


class ModelSelector:
    """Named engines with an active model and optional timed switching
    (bench_conf switch_interval / cold_switching)."""

    def __init__(self, engines: Dict[str, Engine]):
        if not engines:
            raise ValueError("need at least one engine")
        self._engines = dict(engines)
        self._order = list(engines)
        self._active = self._order[0]
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    @property
    def active(self) -> Engine:
        with self._lock:
            return self._engines[self._active]

    @property
    def active_name(self) -> str:
        with self._lock:
            return self._active

    def select(self, name: str) -> None:
        with self._lock:
            if name not in self._engines:
                raise KeyError(name)
            self._active = name

    def submit(self, *args, **kwargs):
        return self.active.submit(*args, **kwargs)

    def start_switching(self, switch_interval_s: float,
                        cold_switching: bool = False) -> None:
        """Cycle the active model on a timer (ModelSelector::Start).

        cold_switching (bench_conf.proto:28): drain the outgoing engine —
        queued AND dispatched-but-uncompleted work (Engine.depth()) — before
        pointing traffic at the next model, instead of switching hot with
        both briefly in flight."""
        import time as _time

        def loop():
            i = 0
            while not self._stop.wait(switch_interval_s):
                outgoing = self.active
                i = (i + 1) % len(self._order)
                if cold_switching:
                    deadline = _time.monotonic() + 5.0
                    while (outgoing.depth() > 0
                           and _time.monotonic() < deadline):
                        _time.sleep(0.01)
                self.select(self._order[i])
                logger.info(f"switched active model -> {self._order[i]}"
                            f"{' (cold)' if cold_switching else ''}")

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
