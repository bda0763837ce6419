"""Two-process jax.distributed correctness (VERDICT round-1, missing #5).

Spawns two CPU processes (2 virtual devices each) joined through a localhost
coordinator, runs one data-parallel train step on a 4-device global mesh, and
asserts the loss and post-update parameter checksum match a single-process run
on the same 4-device mesh with the same global batch. This proves
parallel/distributed.py's claim that the same jitted program spans hosts, and
that shard_batch_tree/replicate_tree assemble multi-host global arrays
correctly (jax.make_array_from_process_local_data path).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(args, timeout):
    env = dict(os.environ, PYTHONPATH=_REPO)
    proc = subprocess.run(
        [sys.executable, _WORKER, *args],
        capture_output=True, text=True, timeout=timeout, cwd=_REPO, env=env,
    )
    assert proc.returncode == 0, f"worker {args} failed:\n{proc.stderr[-3000:]}"
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in worker output:\n{proc.stdout[-2000:]}")


@pytest.mark.slow
def test_two_process_train_step_matches_single_process():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, PYTHONPATH=_REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, "dist", coord, str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=_REPO, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            stdout, stderr = p.communicate(timeout=480)
            assert p.returncode == 0, f"dist worker failed:\n{stderr[-3000:]}"
            outs.append((stdout, stderr))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    dist_results = []
    for stdout, _ in outs:
        for line in stdout.splitlines():
            if line.startswith("RESULT "):
                dist_results.append(json.loads(line[len("RESULT "):]))
    assert len(dist_results) == 2
    assert all(r["devices"] == 4 for r in dist_results)
    # Replicated outputs: both processes observe the same global loss.
    assert dist_results[0]["loss"] == pytest.approx(dist_results[1]["loss"], abs=1e-6)

    single = _run(["single"], timeout=480)
    assert single["devices"] == 4
    assert dist_results[0]["loss"] == pytest.approx(single["loss"], rel=1e-5)
    assert dist_results[0]["checksum"] == pytest.approx(single["checksum"], rel=1e-5)
