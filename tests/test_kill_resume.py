"""Kill-and-resume: SIGKILL a running spark-submit job, resume, verify.

The north rule's checkpoint-resumability claim, driven end-to-end: a real
``spark-submit --py-files`` process is killed -9 mid-job after at least one
group manifest committed; the rerun must (a) report those groups as
resumed, (b) not reprocess their input bytes, and (c) produce output
row-identical to an uninterrupted single-pass run.
"""
from __future__ import annotations

import json
import pathlib
import signal
import subprocess
import sys
import time

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def job_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("kr_in")
    subprocess.run(
        [sys.executable, str(REPO / "data/synth.py"), str(d),
         "--convs", "500", "--mean-turns", "8", "--files", "12"],
        check=True, capture_output=True,
    )
    return str(d)


@pytest.fixture(scope="module")
def pyfiles(tmp_path_factory):
    z = tmp_path_factory.mktemp("kr_zip") / "ocr_spark.zip"
    subprocess.run(
        ["zip", "-qr", str(z), "ocr_spark"], cwd=str(REPO), check=True
    )
    return str(z)


def _cmd(pyfiles, inp, out, resume=True):
    c = [
        "spark-submit", "--master", "local[8]", "--py-files", pyfiles,
        str(REPO / "ocr_spark/plans/run_extract.py"),
        "--master", "local[8]",
        "--input", inp, "--output", out, "--groups", "6",
        "--shuffle-partitions", "8",
    ]
    if not resume:
        c.append("--no-resume")
    return c


def _rows(spark, out):
    return {
        (r["conv_id"], r["turn_idx"]): (
            r["normalized_text"],
            r["dictionary_corrections"],
            r["spelling_changes"],
        )
        for r in spark.read.parquet(f"{out}/group=*").collect()
    }


def test_sigkill_then_resume_matches_single_pass(spark, job_input, pyfiles, tmp_path):
    out_killed = str(tmp_path / "killed")
    out_clean = str(tmp_path / "clean")

    # start, wait for >=1 committed manifest, SIGKILL the whole job
    proc = subprocess.Popen(
        _cmd(pyfiles, job_input, out_killed),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    manifests = pathlib.Path(out_killed) / "_manifests"
    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        done = list(manifests.glob("group-*.json"))
        if len(done) >= 2:
            break
        if proc.poll() is not None:
            pytest.fail("job finished before it could be killed; shrink groups")
        time.sleep(0.3)
    else:
        proc.kill()
        pytest.fail("no manifest appeared within deadline")
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    committed = {
        json.loads(p.read_text())["group"]
        for p in manifests.glob("group-*.json")
        if json.loads(p.read_text()).get("status") == "complete"
    }
    assert committed, "at least one group must have committed before the kill"

    # resume: committed groups are skipped, summary says so
    res = subprocess.run(
        _cmd(pyfiles, job_input, out_killed),
        capture_output=True, text=True, check=True,
    )
    summary = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(summary["resumed_groups"]) == committed
    assert summary["groups"] == 6

    # uninterrupted single pass for comparison
    res2 = subprocess.run(
        _cmd(pyfiles, job_input, out_clean, resume=False),
        capture_output=True, text=True, check=True,
    )
    clean = json.loads(res2.stdout.strip().splitlines()[-1])
    assert clean["turns"] == summary["turns"]
    assert clean["corrections"] == summary["corrections"]

    # row-identical output (exactly-once despite the crash)
    killed_rows = _rows(spark, out_killed)
    clean_rows = _rows(spark, out_clean)
    assert killed_rows == clean_rows
    assert len(killed_rows) == summary["turns"]
