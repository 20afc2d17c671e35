"""Perf canary: the headline throughput must never silently regress again.

Round 3 shipped a 33% headline regression (145 -> 78 Mray/s) while all 101
tests stayed green — the suite had correctness coverage but no performance
floor. This test is that floor: it runs the real ``bench.py`` headline
workload (CornellBox 512x512 spp16, regen scheduler — the same numbers the
driver records in BENCH_r*.json, at spp 8 / one repeat to keep the canary
~2 min) in a fresh subprocess so it lands on the *real* TPU even though the
suite itself pins JAX to the CPU (conftest.py), and fails if throughput
drops below a conservative floor.

The floor (100 Mray/s) sits ~30% under the measured 145 Mray/s headline on
TPU v5e: loose enough to absorb run-to-run tunnel variance (~5-8%) and
minor churn, tight enough that a regression of the round-3 magnitude fails
loudly instead of landing in a snapshot.

Skipped automatically when no TPU is attached (CI on CPU); the bench
discipline there is docs/PERF_NOTES.md's history table.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

# ~30% under the measured 145 Mray/s round-4 headline on TPU v5 lite.
HEADLINE_FLOOR_RAYS_PER_SEC = 100e6


def _tpu_attached() -> bool:
    """Probe the default backend in a clean subprocess (the test process
    itself is pinned to CPU by conftest.py)."""
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    return probe.returncode == 0 and probe.stdout.strip() == "tpu"


@pytest.mark.perf
def test_headline_throughput_floor():
    if not _tpu_attached():
        pytest.skip("no TPU attached; perf canary runs on real hardware only")

    # Trimmed to one repeat at spp 8 (round-5 VERDICT task 7): the full
    # --repeat 3 spp16 run cost ~10 min of wall on top of the suite; this
    # keeps the floor property (a 33%-magnitude regression still fails by a
    # wide margin) at ~2 min including compile. spp does not change rays/s
    # materially — the pool runs the same iterations/ray.
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    proc = subprocess.run(
        [sys.executable, "bench.py", "--no-mse", "--no-boat", "--no-sharded",
         "--repeat", "1", "--spp", "8"],
        capture_output=True, text=True, timeout=450, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, f"bench.py failed:\n{proc.stderr[-2000:]}"
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    rays_per_sec = result["value"]
    assert rays_per_sec >= HEADLINE_FLOOR_RAYS_PER_SEC, (
        f"headline regression: {rays_per_sec/1e6:.1f} Mray/s < floor "
        f"{HEADLINE_FLOOR_RAYS_PER_SEC/1e6:.0f} Mray/s on "
        f"{result.get('device')} — see docs/PERF_NOTES.md history; "
        "bisect before shipping"
    )
