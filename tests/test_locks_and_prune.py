"""Round-4 review fixes: the flock build mutex and the NaN-safe
per-block top-k prune."""

import multiprocessing as mp
import time

import numpy as np
import pyarrow as pa


def _locked_worker(index_dir: str, log_path: str) -> None:
    from matrixprofile_1_ray.stages.ann import _locked_build

    def build():
        with open(log_path, "a") as f:
            f.write("start\n")
        time.sleep(0.4)
        with open(log_path, "a") as f:
            f.write("end\n")

    _locked_build(index_dir, lambda: True, build, timeout_s=30.0)


def test_locked_build_is_mutually_exclusive(tmp_path):
    """Two processes building the same dir must serialize: the critical
    sections may never interleave (start/end strictly alternate).  flock
    has no stale-lock state, so there is no steal path to race."""
    index_dir = str(tmp_path / "idx")
    log_path = str(tmp_path / "log.txt")
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_locked_worker, args=(index_dir, log_path))
             for _ in range(3)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(60)
        assert p.exitcode == 0
    events = open(log_path).read().split()
    assert events == ["start", "end"] * 3


def _hanging_worker(index_dir: str) -> None:
    from matrixprofile_1_ray.stages.ann import _locked_build

    _locked_build(index_dir, lambda: True,
                  lambda: time.sleep(300), timeout_s=600)


def test_locked_build_releases_on_death(tmp_path):
    """A builder killed mid-build must not wedge later builders: the
    kernel drops its flock, so the next caller acquires immediately
    (no stale-timeout wait)."""
    from matrixprofile_1_ray.stages.ann import _locked_build

    index_dir = str(tmp_path / "idx")
    ctx = mp.get_context("spawn")
    p = ctx.Process(target=_hanging_worker, args=(index_dir,))
    p.start()
    time.sleep(1.0)   # let it acquire
    p.kill()
    p.join(10)

    done = []
    t0 = time.time()
    _locked_build(index_dir, lambda: True, lambda: done.append(1),
                  timeout_s=30.0)
    assert done == [1]
    assert time.time() - t0 < 10  # no stale-timeout stall


def test_block_topk_ignores_nan():
    """A block with >= k NaNs must still surrender its genuine top rows;
    NaN rows pass through so the prune is identity w.r.t. the unpruned
    global sort (round-4 review: NaN threshold dropped EVERY row)."""
    from matrixprofile_1_ray.stages.discover_stage import _block_topk

    t = pa.table({"mp_value": pa.array(
        [5.0, 4.0, np.nan, np.nan, np.nan, 3.0], pa.float64())})
    out = _block_topk(t, "mp_value", 2, descending=True)
    vals = out["mp_value"].to_numpy(zero_copy_only=False)
    finite = sorted(v for v in vals if not np.isnan(v))
    assert finite == [4.0, 5.0]
    assert np.isnan(vals).sum() == 3  # NaNs pass through, not dropped

    # ascending path symmetric
    out2 = _block_topk(t, "mp_value", 2, descending=False)
    vals2 = out2["mp_value"].to_numpy(zero_copy_only=False)
    assert sorted(v for v in vals2 if not np.isnan(v)) == [3.0, 4.0]

    # all-NaN / fewer-finite-than-k blocks pass through whole
    t3 = pa.table({"mp_value": pa.array([np.nan, np.nan, 1.0], pa.float64())})
    assert len(_block_topk(t3, "mp_value", 2, descending=True)) == 3
