"""Driver-contract test: bench.py must emit one valid JSON metrics line."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--items", "3000", "--batch", "2", "--reps", "2"],
        capture_output=True, text=True, timeout=400, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload, payload
    assert payload["metric"] == "search_qps_per_chip"
    assert payload["value"] > 0
