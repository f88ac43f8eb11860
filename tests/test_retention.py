"""Retention / downsample serving over the tiered rollup store.

Built over a synthetic 3-doc corpus whose token streams span ~5 hours
(token index = seconds) with a CUSTOM 1m/10m/1h tier ladder, so every
tier has many buckets, all three serve in one stitched read, and the
coarse-aligned seams fall mid-corpus.  Values are cross-checked against
rollup_batch on the same gap-filled sequences, so these tests pin the
retention plumbing, not the kernels.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

NOW = 19000                                    # ingest watermark (seconds)
WIDTHS = {"1m": 60, "10m": 600, "1h": 3600}
POLICY_AGES = {"1m": 2600, "10m": 13400, "1h": None}
# aligned horizons at NOW: 1m -> floor(16400/600)*600, 10m ->
# floor(5600/3600)*3600, 1h keep-forever
AH_1M = 16200
AH_10M = 3600
DOC_LENGTHS = [19000, 18500, 12000]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("retention_corpus")
    texts = ["".join(chr(97 + (7 * i + 3 * j) % 26) for j in range(n))
             for i, n in enumerate(DOC_LENGTHS)]
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
    meta = write_tiered_store(corpus, path, w=32, tiers=WIDTHS,
                              epoch_sec=600)
    return path, meta


def _policy():
    from matrixprofile_1_ray.stages.retention import RetentionPolicy

    return RetentionPolicy(POLICY_AGES)


def test_store_layout(store):
    path, meta = store
    assert meta["epoch_sec"] == 600 and meta["tiers"] == WIDTHS
    kinds = sorted(n for n in os.listdir(path) if n.startswith("kind="))
    assert kinds == ["kind=mp", "kind=token"]
    tiers = sorted(os.listdir(os.path.join(path, "kind=token")))
    assert tiers == ["tier=10m", "tier=1h", "tier=1m"]
    m_epochs = sorted(int(n.split("=")[1]) for n in
                      os.listdir(os.path.join(path, "kind=token", "tier=1m")))
    assert m_epochs[0] == 0 and m_epochs[-1] == (NOW - 1) // 600  # 31
    # 1h buckets start every 3600 s -> start-keyed epochs every 6
    h_epochs = sorted(int(n.split("=")[1]) for n in
                      os.listdir(os.path.join(path, "kind=token", "tier=1h")))
    assert h_epochs == [0, 6, 12, 18, 24, 30]


def test_write_rejects_unaligned_tier_ladder(corpus, tmp_path):
    from matrixprofile_1_ray.stages.retention import write_tiered_store

    with pytest.raises(ValueError, match="multiple"):
        write_tiered_store(corpus, str(tmp_path / "s"), w=32,
                           tiers={"7s": 7, "10s": 10}, epoch_sec=60)


def test_tiered_read_stitches_at_aligned_seams(store):
    from matrixprofile_1_ray.stages.retention import tiered_read

    path, _ = store
    df = tiered_read(path, "token", NOW, _policy(),
                     t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m", "10m", "1h"}
    g = df.groupby("tier")["bucket_start"]
    # each tier serves exactly [its ALIGNED horizon, finer tier's bound):
    # seams at 16200 (a 10m edge) and 3600 (a 1h edge), so no coarse
    # bucket's span crosses into a finer tier's range
    assert g.min()["1m"] == AH_1M and g.max()["1m"] < NOW
    assert g.min()["10m"] == AH_10M and g.max()["10m"] == AH_1M - 600
    assert g.min()["1h"] == 0 and g.max()["1h"] == AH_10M - 3600
    one = df[df["doc_id"] == "0"]
    assert one["bucket_start"].is_unique


def test_stitched_sums_count_every_instant_once(store):
    """The aligned seams make stitched aggregation EXACT: summing t_count
    across all served tiers reproduces each doc's full token count."""
    from matrixprofile_1_ray.stages.retention import tiered_read

    path, _ = store
    df = tiered_read(path, "token", NOW, _policy(),
                     t_lo=0, t_hi=NOW).to_pandas()
    got = df.groupby("doc_id")["t_count"].sum().to_dict()
    assert got == {str(i): n for i, n in enumerate(DOC_LENGTHS)}


def test_stitch_fallback_seam_drops_to_coarser_horizon(store):
    """Pathological ladder: every coarser tier's horizon lands EXACTLY on
    its candidate seam (so the main alignment loop skips them all), yet
    the 10m tier still retains below 1m's own-width floor (10980).  The
    seam must drop to the coarser tier's own horizon (10800) — flooring
    to 1m's own width would let the 10m bucket [10800, 11400) straddle
    the seam and double-count [10980, 11400)."""
    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        aligned_horizons,
        tiered_read,
    )

    path, _ = store
    pol = RetentionPolicy({"1m": 8000, "10m": 7000, "1h": 8200})
    # raw horizons: 1m 11000, 10m 12000, 1h 10800 (own floor).  10m's
    # candidate on the 1h grid is 10800 == 1h's horizon -> skip -> own
    # floor 12000, but 1h retains below it -> 10800.  1m's candidates on
    # the 10m/1h grids are both 10800 == those horizons -> skip -> own
    # floor 10980, but 10m retains below it -> 10800.
    assert aligned_horizons(pol, NOW, WIDTHS) == \
        {"1m": 10800, "10m": 10800, "1h": 10800}
    df = tiered_read(path, "token", NOW, pol, t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m"}          # nothing serves below 10800
    got = df.groupby("doc_id")["t_count"].sum().to_dict()
    assert got == {str(i): max(0, n - 10800)
                   for i, n in enumerate(DOC_LENGTHS)}


def test_tiered_read_values_match_rollup_batch(store, corpus):
    from matrixprofile_1_ray.sources.sequences import (
        sequences_table_from_documents,
    )
    from matrixprofile_1_ray.stages.gapfill import gapfill_batch
    from matrixprofile_1_ray.stages.retention import tiered_read
    from matrixprofile_1_ray.stages.rollup import rollup_batch

    path, _ = store
    served = tiered_read(path, "token", NOW, _policy(),
                         t_lo=0, t_hi=NOW).to_pandas()
    assert len(served) > 0
    ref = rollup_batch(gapfill_batch(sequences_table_from_documents(corpus)),
                       tiers=WIDTHS).to_pandas()
    merged = served.merge(ref, on=["doc_id", "tier", "bucket"],
                          suffixes=("", "_ref"), how="left")
    assert not merged["t_sum_ref"].isna().any()
    for col in ("t_min", "t_max", "t_sum", "t_count", "t_mean"):
        np.testing.assert_array_equal(merged[col].to_numpy(),
                                      merged[f"{col}_ref"].to_numpy())


def test_tiered_read_serves_mp_kind(store):
    from matrixprofile_1_ray.stages.retention import tiered_read

    path, _ = store
    df = tiered_read(path, "mp", NOW, _policy(), t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m", "10m", "1h"}
    assert {"mp_min", "mp_mean", "mp_count", "mp_argmin", "w"} \
        <= set(df.columns)
    g = df.groupby("tier")["bucket_start"]
    assert g.min()["1m"] == AH_1M and g.max()["10m"] < AH_1M \
        and g.max()["1h"] < AH_10M


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


def test_apply_retention_deletes_only_expired_epochs(store):
    from matrixprofile_1_ray.stages.retention import (
        apply_retention,
        downsample_read,
        tiered_read,
    )

    path, _ = store
    pol = _policy()
    report = apply_retention(path, NOW, pol)

    # 1m: epochs are bucket-aligned, so data end = (e+1)*600; expired iff
    # <= ALIGNED horizon 16200 -> e <= 26 (raw horizon 16400 would have
    # eaten epoch 26, which the stitched read still serves from 16200)
    gone_1m = {d["epoch"] for d in report["deleted"] if d["tier"] == "1m"}
    assert gone_1m == set(range(27))
    left = sorted(int(n.split("=")[1]) for n in
                  os.listdir(os.path.join(path, "kind=token", "tier=1m")))
    assert left[0] == 27 and left[0] * 600 == AH_1M
    # 10m: aligned horizon 3600 -> epochs ending <= 3600 -> e <= 5
    gone_10m = {d["epoch"] for d in report["deleted"] if d["tier"] == "10m"}
    assert gone_10m == set(range(6))
    # keep-forever tier untouched
    assert not any(d["tier"] == "1h" for d in report["deleted"])

    # idempotent: second pass deletes nothing, audit log has both runs
    report2 = apply_retention(path, NOW, pol)
    assert report2["deleted"] == []
    with open(os.path.join(path, "_retention_log.jsonl")) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2 and lines[0]["deleted"]

    # stitched reads over the pruned store: same tiers, sums still exact
    df = tiered_read(path, "token", NOW, pol, t_lo=0, t_hi=NOW).to_pandas()
    assert set(df["tier"]) == {"1m", "10m", "1h"}
    got = df.groupby("doc_id")["t_count"].sum().to_dict()
    assert got == {str(i): n for i, n in enumerate(DOC_LENGTHS)}

    # retention-aware downsample: 1m fits max_points but no longer
    # retains t_lo=0, so the read falls back to the keep-forever tier
    # instead of silently serving the surviving suffix
    ds = downsample_read(path, "token", 0, 18000, max_points=400,
                         now_sec=NOW, policy=pol).to_pandas()
    assert set(ds["tier"]) == {"1h"}


def test_stitch_plan_properties():
    """Pure-plan properties under random policies/ranges: intervals are
    non-empty, disjoint, time-descending with tier coarseness, each tier
    starts at/after its ALIGNED horizon, horizon-induced seams land on
    the next-coarser tier's bucket edge, and the plan floor is the
    coarsest planned tier's effective lower bound."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from matrixprofile_1_ray.stages.retention import (
        RetentionPolicy,
        aligned_horizons,
        stitch_plan,
        tier_order_of,
    )

    widths = {"1m": 60, "1h": 3600, "1d": 86400}
    order = tier_order_of(widths)
    ages = st.one_of(st.none(), st.integers(min_value=1, max_value=10**6))

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(a_m=ages, a_h=ages, a_d=ages,
           now=st.integers(min_value=0, max_value=10**6),
           lo=st.integers(min_value=0, max_value=10**6),
           span=st.integers(min_value=1, max_value=10**6))
    def check(a_m, a_h, a_d, now, lo, span):
        pol = RetentionPolicy({"1m": a_m, "1h": a_h, "1d": a_d})
        hi = lo + span
        plan = stitch_plan(pol, now, lo, hi, widths)
        horizons = aligned_horizons(pol, now, widths)
        for tier, p_lo, p_hi in plan:
            assert p_lo < p_hi
            if horizons[tier] is not None:
                assert p_lo >= horizons[tier]
        for (t1, lo1, hi1), (t2, lo2, hi2) in zip(plan, plan[1:]):
            assert order.index(t2) > order.index(t1)
            assert hi2 == lo1
            if lo1 != lo:
                # horizon-induced seam: t2 is the tier that ACTUALLY
                # serves below it (skips included), so the seam must
                # fall on t2's bucket edge — that is the whole
                # straddle-free guarantee
                assert lo1 % widths[t2] == 0
        if plan:
            assert plan[0][2] == hi
            t_last, lo_last, _ = plan[-1]
            h_last = horizons[t_last]
            assert lo_last == (lo if h_last is None else max(lo, h_last))

    check()


def test_cli_retention_build_expire_serve(ray_session, corpus, tmp_path):
    """`ray job submit`-able maintenance entry: build the store, expire on
    a custom keep ladder, serve a stitched range to parquet."""
    import io
    from contextlib import redirect_stdout

    import pyarrow.parquet as pq

    from matrixprofile_1_ray.cli import main

    store = str(tmp_path / "store")
    served = str(tmp_path / "served")
    buf = io.StringIO()
    with redirect_stdout(buf):
        main(["retention", "--store", store, "--build-from", corpus,
              "--epoch-sec", "600", "--expire", "--now", str(NOW),
              "--keep", "1m=2600", "--keep", "1h=13400",
              "--keep", "1d=none",
              "--serve", f"0:{NOW}", "--output", served,
              "--num-cpus", "4"])
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["built"]["epoch_sec"] == 600
    # default 1m/1h/1d ladder: 1m aligned horizon floor(16400/3600)*3600
    # = 14400 -> epochs ending <= 14400 (e <= 23) expire
    gone_1m = {d["epoch"] for d in report["expired"]["deleted"]
               if d["tier"] == "1m"}
    assert gone_1m == set(range(24))
    assert report["served_rows"] > 0
    df = pq.read_table(served).to_pandas()
    assert report["served_rows"] == len(df)
    assert set(df["tier"]) == {"1m", "1h"}


def test_write_tiered_store_guards_foreign_dirs(ray_session, corpus,
                                                tmp_path):
    from matrixprofile_1_ray.stages.retention import write_tiered_store

    target = tmp_path / "not_a_store"
    target.mkdir()
    (target / "precious.txt").write_text("hands off")
    with pytest.raises(ValueError, match="refusing"):
        write_tiered_store(corpus, str(target), w=32, epoch_sec=600)
