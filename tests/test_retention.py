"""Retention / downsample serving over the tiered rollup store.

Built over a synthetic 3-doc corpus whose token streams span ~5 hours
(token index = seconds), so every tier has multiple buckets and the
fine->coarse stitch boundaries fall mid-corpus.  Values are cross-checked
against token_rollup_pipeline (itself oracle-green), so these tests pin
the retention plumbing, not the kernels.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NOW = 19000                                    # ingest watermark (seconds)
POLICY_AGES = {"1m": 2600, "1h": 13400, "1d": None}
H_1M = NOW - POLICY_AGES["1m"]                 # 16400
H_1H = NOW - POLICY_AGES["1h"]                 # 5600


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("retention_corpus")
    lengths = [19000, 18500, 12000]
    texts = ["".join(chr(97 + (7 * i + 3 * j) % 26) for j in range(n))
             for i, n in enumerate(lengths)]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "source": pa.array(["s0", "s1", "s0"], pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def store(ray_session, corpus, tmp_path_factory):
    from matrixprofile_1_ray.stages.retention import write_tiered_store

    path = str(tmp_path_factory.mktemp("tiered") / "store")
    meta = write_tiered_store(corpus, path, w=32, epoch_sec=600)
    return path, meta


def test_store_layout(store):
    path, meta = store
    assert meta["epoch_sec"] == 600
    kinds = sorted(n for n in os.listdir(path) if n.startswith("kind="))
    assert kinds == ["kind=mp", "kind=token"]
    tiers = sorted(os.listdir(os.path.join(path, "kind=token")))
    assert tiers == ["tier=1d", "tier=1h", "tier=1m"]
    m_epochs = sorted(int(n.split("=")[1]) for n in
                      os.listdir(os.path.join(path, "kind=token", "tier=1m")))
    assert m_epochs[0] == 0 and m_epochs[-1] == (19000 - 1) // 600  # 31
    # 1h buckets start every 3600 s -> start-keyed epochs every 6
    h_epochs = sorted(int(n.split("=")[1]) for n in
                      os.listdir(os.path.join(path, "kind=token", "tier=1h")))
    assert h_epochs == [0, 6, 12, 18, 24, 30]
    assert os.listdir(os.path.join(path, "kind=token", "tier=1d")) \
        == ["epoch=0"]


def test_tiered_read_stitches_by_horizon(store):
    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        tiered_read,
    )

    path, _ = store
    pol = RetentionPolicy(POLICY_AGES)
    df = tiered_read(path, "token", NOW, pol, t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m", "1h", "1d"}
    g = df.groupby("tier")["bucket_start"]
    # each tier serves exactly [its horizon, finer tier's horizon)
    assert g.min()["1m"] >= H_1M and g.max()["1m"] < NOW
    assert g.min()["1h"] >= H_1H and g.max()["1h"] < H_1M
    assert g.min()["1d"] >= 0 and g.max()["1d"] < H_1H
    # served bucket starts never collide within a doc (tiers partition the
    # timeline by start), and the expected 1h starts are exactly the
    # multiples of 3600 inside [H_1H, H_1M)
    one = df[df["doc_id"] == "0"]
    assert one["bucket_start"].is_unique
    assert sorted(one.loc[one["tier"] == "1h", "bucket_start"]) \
        == [7200, 10800, 14400]


def test_tiered_read_values_match_rollup_pipeline(store, corpus):
    from matrixprofile_1_ray.pipelines.flagship import token_rollup_pipeline
    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        tiered_read,
    )

    path, _ = store
    pol = RetentionPolicy(POLICY_AGES)
    served = tiered_read(path, "token", NOW, pol,
                         t_lo=0, t_hi=NOW).to_pandas()
    assert len(served) > 0
    ref = token_rollup_pipeline(corpus).to_pandas()
    merged = served.merge(ref, on=["doc_id", "tier", "bucket"],
                          suffixes=("", "_ref"), how="left")
    assert not merged["t_sum_ref"].isna().any()
    for col in ("t_min", "t_max", "t_sum", "t_count", "t_mean"):
        np.testing.assert_array_equal(merged[col].to_numpy(),
                                      merged[f"{col}_ref"].to_numpy())


def test_tiered_read_serves_mp_kind(store):
    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        tiered_read,
    )

    path, _ = store
    pol = RetentionPolicy(POLICY_AGES)
    df = tiered_read(path, "mp", NOW, pol, t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m", "1h", "1d"}
    assert {"mp_min", "mp_mean", "mp_count", "mp_argmin", "w"} \
        <= set(df.columns)
    g = df.groupby("tier")["bucket_start"]
    assert g.min()["1m"] >= H_1M and g.max()["1h"] < H_1M \
        and g.max()["1d"] < H_1H


def test_apply_retention_deletes_only_expired_epochs(store):
    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        apply_retention,
        tiered_read,
    )

    path, _ = store
    pol = RetentionPolicy(POLICY_AGES)
    report = apply_retention(path, NOW, pol)

    # 1m: epochs are bucket-aligned, so data end = (e+1)*600; expired iff
    # <= H_1M=16400 -> e <= 26
    gone_1m = {d["epoch"] for d in report["deleted"] if d["tier"] == "1m"}
    assert gone_1m == set(range(27))
    left = sorted(int(n.split("=")[1]) for n in
                  os.listdir(os.path.join(path, "kind=token", "tier=1m")))
    assert left[0] == 27
    # 1h: start-keyed epoch 0 holds the bucket spanning [0, 3600), whose
    # data end 3600 <= H_1H=5600 -> expired; epoch 6 ends 7200 -> kept
    gone_1h = {d["epoch"] for d in report["deleted"] if d["tier"] == "1h"}
    assert gone_1h == {0}
    # keep-forever tier untouched
    assert not any(d["tier"] == "1d" for d in report["deleted"])

    # idempotent: second pass deletes nothing, audit log has both runs
    report2 = apply_retention(path, NOW, pol)
    assert report2["deleted"] == []
    with open(os.path.join(path, "_retention_log.jsonl")) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2 and lines[0]["deleted"]

    # reads over the retained window still stitch correctly
    df = tiered_read(path, "token", NOW, pol, t_lo=0, t_hi=NOW).to_pandas()
    assert (df.loc[df["tier"] == "1m", "bucket_start"] >= H_1M).all()
    assert set(df["tier"]) == {"1m", "1h", "1d"}


def test_downsample_read_picks_finest_fitting_tier(store):
    from matrixprofile_1_ray.stages.retention import downsample_read

    path, _ = store
    fine = downsample_read(path, "token", 0, 18000,
                           max_points=400).to_pandas()
    assert set(fine["tier"]) == {"1m"}
    assert fine["bucket_start"].max() < 18000
    coarse = downsample_read(path, "token", 0, 18000,
                             max_points=10).to_pandas()
    assert set(coarse["tier"]) == {"1h"}


def test_stitch_plan_properties():
    """Pure-plan properties under random policies/ranges: intervals are
    non-empty, disjoint, time-descending with tier coarseness, each tier
    starts at/after its horizon, and the union covers exactly
    [effective_lo, t_hi) where effective_lo is the retained floor."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        stitch_plan,
    )

    ages = st.one_of(st.none(), st.integers(min_value=1, max_value=10**6))

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(a_m=ages, a_h=ages, a_d=ages,
           now=st.integers(min_value=0, max_value=10**6),
           lo=st.integers(min_value=0, max_value=10**6),
           span=st.integers(min_value=1, max_value=10**6))
    def check(a_m, a_h, a_d, now, lo, span):
        pol = RetentionPolicy({"1m": a_m, "1h": a_h, "1d": a_d})
        hi = lo + span
        plan = stitch_plan(pol, now, lo, hi)
        order = ("1m", "1h", "1d")
        for tier, p_lo, p_hi in plan:
            assert p_lo < p_hi
            h = pol.horizon(tier, now)
            if h is not None:
                assert p_lo >= h
        # disjoint + descending: each entry abuts or precedes the previous
        for (t1, lo1, hi1), (t2, lo2, hi2) in zip(plan, plan[1:]):
            assert order.index(t2) > order.index(t1)
            assert hi2 == lo1
        if plan:
            assert plan[0][2] == hi
            # coverage floor: the coarsest planned tier reaches down to
            # max(lo, its own horizon)
            t_last, lo_last, _ = plan[-1]
            h_last = pol.horizon(t_last, now)
            assert lo_last == (lo if h_last is None else max(lo, h_last))

    check()


def test_write_tiered_store_guards_foreign_dirs(ray_session, corpus,
                                                tmp_path):
    from matrixprofile_1_ray.stages.retention import write_tiered_store

    target = tmp_path / "not_a_store"
    target.mkdir()
    (target / "precious.txt").write_text("hands off")
    with pytest.raises(ValueError, match="refusing"):
        write_tiered_store(corpus, str(target), w=32, epoch_sec=600)
