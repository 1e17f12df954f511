"""Real 2-process ``jax.distributed`` integration test (SURVEY §2.7/§5.8).

Spawns two CPU subprocesses (4 virtual devices each) that rendezvous via
``parallel.launch.maybe_initialize_distributed`` with a localhost
coordinator, then run one data-parallel train step over the combined
8-device global mesh — exercising the actual rendezvous + cross-process
collective path that the env-parsing tests (``test_tp.py``) mock out.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_rendezvous_and_dp_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        env.update(
            DXT_COORDINATOR=f"localhost:{port}",
            DXT_NUM_PROCESSES="2",
            DXT_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed rendezvous timed out on this host")

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "OK pid=" in out, out

    # both processes computed the identical pmean'd loss and update
    def field(out, name):
        line = [l for l in out.splitlines() if l.startswith("OK")][0]
        return float(dict(kv.split("=") for kv in line.split()[1:])[name])

    assert field(outs[0], "loss") == pytest.approx(field(outs[1], "loss"))
    assert field(outs[0], "wsum") == pytest.approx(field(outs[1], "wsum"))
    # and the update actually moved the params (8 * 0.5 * ... != initial 4)
    assert not np.isclose(field(outs[0], "wsum"), 4.0)

    # phase 2: tp axis spanning the process boundary (GSPMD collectives
    # across processes, not just dp's gradient pmean)
    def tp_field(out, name):
        line = [l for l in out.splitlines() if l.startswith("OKTP")][0]
        return float(dict(kv.split("=") for kv in line.split()[1:])[name])

    for out in outs:
        assert "OKTP pid=" in out, out
    # the replicated loss agrees across processes at both steps...
    assert tp_field(outs[0], "loss1") == pytest.approx(tp_field(outs[1], "loss1"))
    assert tp_field(outs[0], "loss2") == pytest.approx(tp_field(outs[1], "loss2"))
    # ...the cross-process tp step learns...
    assert tp_field(outs[0], "loss2") < tp_field(outs[0], "loss1")
    # ...and each process holds a DIFFERENT half of the tp-sharded kernel
    # (complementary shards, not replicas)
    assert tp_field(outs[0], "w1sum") != pytest.approx(
        tp_field(outs[1], "w1sum"), abs=1e-9
    )
