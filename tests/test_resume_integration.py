"""Production-entry kill/resume: SIGKILL `tools/run_pipeline.py` mid-wave
(a real process kill, not the cooperative max_waves interruption
`test_checkpoint.py` uses), rerun the identical command, and require the
resumed output to be byte-identical to an uninterrupted run — including
any partial parquet the killed wave left behind being wiped and redone."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow.dataset as pads
import pytest

REPO = Path(__file__).resolve().parent.parent
N_TURNS = 4000
N_SHARDS = 8


@pytest.fixture(scope="module")
def turns_dir(tmp_path_factory):
    from lingua_ray.sources.transcripts import ensure_transcripts
    d = tmp_path_factory.mktemp("resume") / "turns"
    return ensure_transcripts(d, n_turns=N_TURNS, seed=42,
                              n_shards=N_SHARDS)


def _cmd(turns_dir, out_dir):
    return [sys.executable, str(REPO / "tools" / "run_pipeline.py"),
            "--input", str(turns_dir), "--output", str(out_dir),
            "--wave-size", "2", "--concurrency", "2",
            "--partitions", "4", "--skip-order"]


def _env():
    env = dict(os.environ)
    env["RAY_ADDRESS"] = "local"  # each subprocess owns a fresh cluster
    return env


def _read_sorted(data_dir):
    t = pads.dataset(str(data_dir), partitioning="hive").to_table()
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_sigkill_mid_wave_then_resume_byte_identical(turns_dir, tmp_path):
    out_killed = tmp_path / "out_killed"

    # Start the production entry in its own session (so the SIGKILL can
    # take down the raylet children it spawns, not just the driver).
    proc = subprocess.Popen(_cmd(turns_dir, out_killed), env=_env(),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL,
                            start_new_session=True)
    manifest_dir = out_killed / "_manifest"
    try:
        deadline = time.time() + 180
        while time.time() < deadline:
            if len(list(manifest_dir.glob("shard-*.json"))) >= 2:
                break  # first wave committed — kill mid-run
            if proc.poll() is not None:
                pytest.fail("pipeline exited before any wave committed")
            time.sleep(0.05)
        else:
            pytest.fail("first wave never committed within 180 s")
        os.killpg(proc.pid, signal.SIGKILL)
    finally:
        # the failure paths above raise BEFORE the killpg — kill here too
        # or proc.wait() blocks this test forever on a wedged pipeline
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()

    committed = len(list(manifest_dir.glob("shard-*.json")))
    assert 2 <= committed < N_SHARDS, (
        f"kill landed outside the run ({committed} manifests) — "
        "nothing left to resume")

    # Resume with the identical command: must exit 0 and process ONLY
    # the shards the killed run never committed.
    res = subprocess.run(_cmd(turns_dir, out_killed), env=_env(),
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    summary = json.loads(res.stdout[res.stdout.index("{"):])
    assert len(summary["processed_shards"]) == N_SHARDS - committed
    assert sorted(summary["processed_shards"]
                  + summary["skipped_shards"]) == list(range(N_SHARDS))

    # Uninterrupted reference run.
    out_clean = tmp_path / "out_clean"
    res2 = subprocess.run(_cmd(turns_dir, out_clean), env=_env(),
                          capture_output=True, text=True, timeout=600)
    assert res2.returncode == 0, res2.stderr[-2000:]

    ta = _read_sorted(out_killed / "data")
    tb = _read_sorted(out_clean / "data")
    assert ta.num_rows == tb.num_rows == N_TURNS
    for col in ta.schema.names:
        a, b = ta.column(col), tb.column(col)
        if col == "ppl":  # Arrow equals() treats NaN != NaN
            av = np.array(a.to_pylist(), dtype=np.float64)
            bv = np.array(b.to_pylist(), dtype=np.float64)
            assert ((av == bv) | (np.isnan(av) & np.isnan(bv))).all()
        else:
            assert a.equals(b), col
