"""REAL multi-process proof of the multi-host data/parallel path.

Round 1 exercised ``shard_examples`` / ``make_array_from_process_local_data``
only with ``process_count == 1``; this launches TWO coordinated processes
(``jax.distributed.initialize`` over a localhost coordinator, 4 virtual CPU
devices each = 8 global) and runs a DP x TP-sharded train step where each
process feeds only its addressable shard — the actual multi-host input
recipe (SURVEY.md §2.5 comm-backend row)."""

import json
import os
import socket
import subprocess
import sys


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device count
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(worker))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))

    assert all(o["process_count"] == 2 for o in outs)
    # both processes computed the SAME global loss and updated params
    assert abs(outs[0]["loss"] - outs[1]["loss"]) < 1e-5
    assert abs(outs[0]["cksum"] - outs[1]["cksum"]) < 1e-4
    assert outs[0]["loss"] > 0
    # the user-facing MultitaskTrainer epoch over the same mesh agrees too
    assert abs(outs[0]["trainer_loss"] - outs[1]["trainer_loss"]) < 1e-5
    assert outs[0]["trainer_loss"] > 0
