"""Real multi-process execution of the trainer (VERDICT r2 item 3).

Launches TWO OS processes, each a JAX distributed process with 4 CPU
devices, forming one 8-device data-parallel mesh. Phase 1 trains 2 steps
and checkpoints; phase 2 relaunches both processes and exercises the
elastic-restart path (`broadcast_one_to_all` checkpoint agreement,
multi-host `is_main_process` gating) before training 2 more steps.
Asserts both processes agree on step and parameter digest each phase —
turning trainer.py's multi-host branches from dead code into tested
behavior.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(num_procs, port, results, steps):
    worker = Path(__file__).parent / "_multiproc_worker.py"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(num_procs), str(port),
             str(results), str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for i in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append((out, err))
    results_json = []
    for out, err in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        assert lines, f"no JSON line in worker output:\n{out}\n{err[-2000:]}"
        results_json.append(json.loads(lines[-1]))
    return results_json


def test_two_process_train_checkpoint_elastic_restart(tmp_path):
    results = tmp_path / "shared_results"
    results.mkdir()

    # phase 1: fresh 2-process run, 2 steps, main writes the checkpoint
    r1 = _launch(2, _free_port(), results, steps=2)
    assert {r["proc"] for r in r1} == {0, 1}
    assert all(r["step"] == 2 for r in r1), r1
    assert r1[0]["digest"] == pytest.approx(r1[1]["digest"], rel=1e-6)
    ckpts = list(results.glob("model-*.ckpt"))
    assert len(ckpts) == 1, ckpts

    # phase 2: relaunch — elastic restart finds the checkpoint on BOTH
    # processes (shared folder), broadcast agrees, both resume from step 2
    r2 = _launch(2, _free_port(), results, steps=4)
    assert all(r["step"] == 4 for r in r2), r2
    assert r2[0]["digest"] == pytest.approx(r2[1]["digest"], rel=1e-6)
    # training actually continued (params moved from the phase-1 state)
    assert r2[0]["digest"] != pytest.approx(r1[0]["digest"], rel=1e-9)
