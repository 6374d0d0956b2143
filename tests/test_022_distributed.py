"""Multi-process (multi-host) execution: parallel/distributed.py.

The real thing — no mocks: the test spawns two OS processes that form a
gloo-backed jax.distributed CPU cluster (4 virtual devices each, 8 global),
run cohort inference and a sharded training step across the process
boundary, and verify against single-process ground truth
(tests/distributed_child.py). This is the offline stand-in for a TPU pod
slice: the module under test issues no backend-specific calls, so the same
code path serves multi-host TPU deployments (DCN collectives instead of
gloo).

Pure-host helpers (process_shard) are covered in-process below.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, 'tests', 'distributed_child.py')


import pytest

# full tier: heavy integration on a 1-core CPU box (run with pytest -m '')
pytestmark = pytest.mark.slow


def test_process_shard_balanced():
    from totalsegmentator2d_tpu.parallel.distributed import process_shard
    for n, nproc in [(7, 2), (8, 2), (3, 4), (0, 2), (10, 3)]:
        slices = [process_shard(n, nproc, p) for p in range(nproc)]
        # contiguous, covering, balanced within 1
        assert slices[0].start == 0
        assert slices[-1].stop == n
        sizes = [s.stop - s.start for s in slices]
        assert sum(sizes) == n
        assert max(sizes) - min(sizes) <= 1
        for a, b in zip(slices, slices[1:]):
            assert a.stop == b.start


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_cluster():
    """Cohort inference + sharded train step across two real processes."""
    port = _free_port()
    env = dict(os.environ)
    # the child pins its own XLA_FLAGS/JAX_PLATFORMS before importing jax
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    # the child is run by script path (sys.path[0] = tests/), so the repo
    # root must come from PYTHONPATH
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    nproc = 2
    procs = [subprocess.Popen(
        [sys.executable, CHILD, str(pid), str(nproc), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO)
        for pid in range(nproc)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out.decode(errors='replace'))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f'child {pid} failed (rc={p.returncode}):\n{out}'
        assert f'DIST_OK {pid}' in out, f'child {pid} output:\n{out}'
    # both processes computed the same global loss (printed for the log)
    losses = {line.split('loss=')[1] for out in outs
              for line in out.splitlines() if 'DIST_OK' in line}
    assert len(losses) == 1, losses
