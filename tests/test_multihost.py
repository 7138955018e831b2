"""Multi-process execution (parallel/multihost.py): the sharded SPMD
program must be process-count invariant — logL/d1/d2 identical whether one
process owns all 8 devices or two processes own 4 each (the reference's
MPI consumers' rank-invariance property, SURVEY §2.3; affordance at
reference pll.c:1112 / likelihood.c:122).

Each configuration runs in fresh subprocesses (jax.distributed can only be
initialized once per process); gloo provides the cross-process CPU
collectives."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mh_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_group(nproc, devices_per_proc, timeout=600):
    """Launch one process group; returns the parsed JSON line per rank."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(nproc), str(port),
         str(devices_per_proc)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        outs.append(json.loads(line))
    return outs


def test_process_count_invariance():
    one = _run_group(1, 8)
    two = _run_group(2, 4)
    # every rank of the 2-process run must agree with the 1-process run
    for rank in two:
        for key in ("lk", "lk2", "d1", "d2",
                    "lk_prs", "d1_prs", "d2_prs",
                    "lk_pe", "d1_pe", "d2_pe"):
            np.testing.assert_allclose(
                rank[key], one[0][key], rtol=1e-12,
                err_msg=f"{key} diverged between 1x8 and 2x4 processes")
        # dense-fused sharded site repeats (fp32): per-rank local class
        # tables, same SPMD program and psums — process-count invariant
        for key in ("lk_rep", "d1_rep", "lk_rep_spr"):
            np.testing.assert_allclose(
                rank[key], one[0][key], rtol=1e-6,
                err_msg=f"{key} diverged between 1x8 and 2x4 processes")
        # multi-process repeats topology search: same accepted moves
        assert rank["acc_rep_spr"] == one[0]["acc_rep_spr"]
        # streamed SPR round: per-candidate scores, the round's result
        # and accepted-move count must be IDENTICAL (bit-for-bit: the
        # psum reduction order is process-count independent under the
        # same 8-shard mesh) whether 1 or 2 processes drive it
        assert rank["stream_n"] == one[0]["stream_n"]
        assert rank["stream_scores"] == one[0]["stream_scores"], \
            "streamed candidate scores diverged between 1x8 and 2x4"
        assert rank["stream_sum"] == one[0]["stream_sum"]
        assert rank["stream_acc"] == one[0]["stream_acc"]
        np.testing.assert_allclose(rank["stream_best"],
                                   one[0]["stream_best"], rtol=1e-12)
    # and the two ranks with each other (replicated outputs)
    assert two[0]["lk"] == two[1]["lk"]
    assert two[0]["lk_prs"] == two[1]["lk_prs"]
    assert two[0]["lk_rep"] == two[1]["lk_rep"]
    assert two[0]["stream_scores"] == two[1]["stream_scores"]
    assert two[0]["lk_pe"] == two[1]["lk_pe"]
