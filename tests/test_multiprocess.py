"""2-process distributed smoke test (SURVEY.md section 4 item 4 extended to
REAL multi-process): two jax.distributed CPU processes train one epoch with
per-process data sharding (Batcher stride) + make_array_from_process_local_data
batch assembly, and the loss sequence matches a single-process run over the
same global batches. The reference's DDP path was never tested
(SURVEY.md section 2.8); this is the test it lacked."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

# ~10 min cold-cache on a 1-core host (3 jax processes compiling under
# contention) — opt-in so the default gate stays usable:
#   RUN_MULTIPROC=1 python -m pytest tests/test_multiprocess.py
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        os.environ.get("RUN_MULTIPROC") != "1",
        reason="set RUN_MULTIPROC=1 (about 10 min on 1 core)",
    ),
]

HERE = os.path.dirname(os.path.abspath(__file__))
CHILD = os.path.join(HERE, "mp_train_child.py")


def _run(args, log_path):
    e = dict(os.environ)
    # the child forces JAX_PLATFORMS=cpu itself; drop any pytest-level flags
    e.pop("XLA_FLAGS", None)
    # children write to files, NOT pipes: two processes coupled through
    # collectives deadlock if one blocks on a full un-drained stdout pipe
    log = open(log_path, "w")
    proc = subprocess.Popen(
        [sys.executable, CHILD, *map(str, args)],
        stdout=log, stderr=subprocess.STDOUT, env=e, text=True,
    )
    proc._log_path = log_path
    proc._log_file = log
    return proc


def _wait(proc, timeout=540):
    proc.wait(timeout=timeout)
    proc._log_file.close()
    with open(proc._log_path) as f:
        return f.read()


def _losses(out: str):
    m = re.search(r"RESULT pid=\d+ losses=([\d.,eE+-]+)", out)
    assert m, out[-2000:]
    return np.array([float(x) for x in m.group(1).split(",")])


def test_two_process_training_matches_single_process(tmp_path):
    port = 12431
    single = _run([0, 1, port], str(tmp_path / "single.log"))
    out_single = _wait(single)
    assert single.returncode == 0, out_single[-2000:]

    p0 = _run([0, 2, port], str(tmp_path / "p0.log"))
    p1 = _run([1, 2, port], str(tmp_path / "p1.log"))
    out0 = _wait(p0)
    out1 = _wait(p1)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]

    ref = _losses(out_single)
    l0 = _losses(out0)
    l1 = _losses(out1)
    np.testing.assert_allclose(l0, ref, rtol=1e-5)
    np.testing.assert_allclose(l1, ref, rtol=1e-5)


def test_two_process_lockstep_on_uneven_dataset(tmp_path):
    """5 samples over 2 processes: the global batch schedule gives BOTH
    hosts the same 2 steps (one full global batch of 4 + one padded tail
    holding sample 5) — the epoch completes without deadlock, the identical
    (replicated) loss sequence appears on both hosts, and no sample is
    skipped (pre-round-3, the cross-host step_cap permanently dropped the
    surplus batch)."""
    port = 12437
    p0 = _run([0, 2, port, 5], str(tmp_path / "p0.log"))
    p1 = _run([1, 2, port, 5], str(tmp_path / "p1.log"))
    out0 = _wait(p0)
    out1 = _wait(p1)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    l0 = _losses(out0)
    l1 = _losses(out1)
    assert len(l0) == 2  # ceil(5 / global_bs 4): the tail batch trains too
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    assert np.isfinite(l0).all()


def test_two_process_async_checkpoint(tmp_path):
    """Collective async checkpointing under jax.distributed: both processes
    save via AsyncSaver while training continues, finalize commits the
    write (latest.json advances), and the checkpoint restores on both.
    Orbax's multihost commit barrier is the thing under test — a hang or
    rank-divergent directory state fails the child assert."""
    port = 12443
    ckdir = str(tmp_path / "ck")
    p0 = _run([0, 2, port, 4, ckdir], str(tmp_path / "p0.log"))
    p1 = _run([1, 2, port, 4, ckdir], str(tmp_path / "p1.log"))
    out0 = _wait(p0)
    out1 = _wait(p1)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    for out in (out0, out1):
        assert "restored_leaves=" in out, out[-2000:]
        assert np.isfinite(_losses(out)).all()
