"""Differential fuzz: the bounded-slice MP-family batch fns vs the DuckDB
oracle SQL on RANDOM boundary-stressing corpora (no Ray needed — the gate
queries are thin map_batches wrappers over these same pure functions).

The fixed-testdata gate can only exercise the doc shapes that happen to
exist at sf0.001/sf0.01; this test generates corpora that force the edge
cases the guards exist for: slice-floor lengths (n_tok == 2*w and ±1),
repeated blocks (greedy/argmin ties), constant runs (sig2 floor), exact
window repeats beyond the exclusion zone (STOMP NaN-skip guard), and
periodic series.  A divergence here is an engine-vs-oracle gate failure
waiting for the right production doc — e.g. the stomp partnerless-center
bug bound to n_tok == 32 that motivated this file.
"""

import string

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SEEDS = [3, 11, 29, 47, 101, 211, 503]
_BOUNDARY_LENGTHS = [31, 32, 33, 47, 48, 49, 63, 64, 65,
                     127, 128, 129, 191, 192, 255, 256, 257]
_ALPHABET = np.array(list(string.ascii_letters + string.digits + " .,!?"))


def _random_corpus(seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts = []

    def rand_text(n):
        return "".join(rng.choice(_ALPHABET, n))

    for n in _BOUNDARY_LENGTHS:
        texts.append(rand_text(n))
    for n in rng.integers(28, 300, size=6):
        texts.append(rand_text(int(n)))
    # tie stress: identical snippet_size blocks
    block = rand_text(64)
    texts.append(block + block + rand_text(64))
    texts.append(block + block + block)
    # sig2 floor stress: long constant run
    texts.append(rand_text(40) + "A" * 24 + rand_text(40))
    # STOMP perfect-match guard: exact 20-char repeat at distance > ez
    base = rand_text(100)
    texts.append(base[:10] + base[20:40] + base[40:70] + base[20:40]
                 + base[70:90])
    # periodicity stress (near-perfect correlations at the period)
    texts.append(rand_text(16) * 8)
    per = rand_text(16)
    texts.append("".join(per[:-1] + c for c in rand_text(8)))
    return pd.DataFrame({
        "doc_id": [f"doc{i:03d}" for i in range(len(texts))],
        "source": [f"s{i % 3}" for i in range(len(texts))],
        "text": texts,
    })


def _sequences_batch(df: pd.DataFrame) -> pa.Table:
    """documents -> the exact batch the gate pipelines feed the small
    stages (tokenize + gap-fill, codec verify skipped as in the gate)."""
    from matrixprofile_1_ray.sources.sequences import tokenize_documents_batch
    from matrixprofile_1_ray.stages.gapfill import gapfill_batch

    docs = pa.table({"doc_id": df.doc_id, "text": df.text,
                     "source": df.source})
    return gapfill_batch(tokenize_documents_batch(docs), mode="forward_fill")


def _engine_fns():
    from matrixprofile_1_ray.stages.pairs import mpdist_vector_small_batch
    from matrixprofile_1_ray.stages.pmp import maxsubseq_small_batch
    from matrixprofile_1_ray.stages.profile import (
        corrected_small_rows_batch,
        motifs_small_batch,
        mp_discord_top1_batch,
        mp_rollup_small_batch,
        mp_rows_small_batch,
        pick_mp_small_batch,
        regimes_small_batch,
    )
    from matrixprofile_1_ray.stages.summarize import snippets_small_batch

    def pmp_both(b):
        parts = []
        for w in (16, 32):
            t = mp_rows_small_batch(b, w=w)
            parts.append(t.add_column(
                1, "w", pa.array(np.full(len(t), w, np.int64))))
        return pa.concat_tables(parts)

    return {
        "mp_profiles_small": mp_rows_small_batch,
        "mp_stomp_small": lambda b: mp_rows_small_batch(b, algorithm="stomp"),
        "mp_scrimp_small": lambda b: mp_rows_small_batch(
            b, algorithm="scrimp++"),
        "mp_discords_small": mp_discord_top1_batch,
        "pmp_small": pmp_both,
        "corrected_profile_small": corrected_small_rows_batch,
        "motifs_small": motifs_small_batch,
        "snippets_small": snippets_small_batch,
        "regimes_small": regimes_small_batch,
        "mpdist_vector_small": mpdist_vector_small_batch,
        "mp_rollup_small": mp_rollup_small_batch,
        "pick_mp_small": pick_mp_small_batch,
        "maximum_subsequence_small": maxsubseq_small_batch,
    }


@pytest.fixture(scope="module")
def oracle_sqls():
    import __ray_entry__

    return __ray_entry__.oracle_sql()


def _to_df(res) -> pd.DataFrame:
    """Dataset/Table -> DataFrame with the gate tool's empty-schema
    recovery: Ray 2.49's to_pandas is column-less on any all-empty
    Dataset, so rebuild the typed columns from the Dataset schema."""
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        schema = res.schema()
        df = res.to_pandas()
        if df.empty and schema is not None and not len(df.columns):
            df = pa.schema(list(zip(schema.names,
                                    schema.types))).empty_table().to_pandas()
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _compare_frames(name: str, eng: pd.DataFrame, ora: pd.DataFrame,
                    mismatches: list, equal_nan: bool = True):
    """Name-sorted-column, row-sorted, dtype-tolerant value compare — the
    shape of the driver gate's check."""
    cols = sorted(eng.columns)
    assert cols == sorted(ora.columns), (name, eng.columns, ora.columns)
    a = eng[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    if len(a) != len(b):
        mismatches.append(f"{name}: rows {len(a)} vs {len(b)}")
        return
    for c in cols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            if not np.array_equal(av.astype("d"), bv.astype("d"),
                                  equal_nan=equal_nan):
                mismatches.append(f"{name}: column {c} values differ")
                return
        elif not (pd.Series(av).fillna("<N>")
                  == pd.Series(bv).fillna("<N>")).all():
            mismatches.append(f"{name}: column {c} values differ")
            return


@pytest.mark.parametrize("seed", SEEDS)
def test_small_family_differential(oracle_sqls, seed):
    df = _random_corpus(seed)
    seq = _sequences_batch(df)
    con = duckdb.connect()
    con.register("documents", df)
    mismatches = []
    for name, fn in _engine_fns().items():
        eng = fn(seq).to_pandas()
        ora = con.execute(oracle_sqls[name]).df()
        _compare_frames(name, eng, ora, mismatches, equal_nan=False)
    assert not mismatches, mismatches


TEXT_FAMILY = ["langid", "quality", "word_counts", "fingerprints", "simhash",
               "dedup_exact", "dedup_minhash_lsh", "dedup_groups",
               "doc_stats", "ngram_top50", "per_source_stats",
               "per_source_distinct_tokens", "per_source_token_quantiles",
               "sequences_meta", "rollup_1m", "moving_stats_w8"]


def _edge_corpus() -> pd.DataFrame:
    """Degenerate docs the fixed testdata never contains: empty text (a
    DuckDB split('','') -> [''] phantom-token trap and an engine
    empty-values fancy-index trap), single chars, whitespace-only,
    punctuation runs, exact repeats."""
    rng = np.random.default_rng(5)
    texts = ["", "a", " ", "   ", ".", "!!!", "the the the", "aaaaaaaaaa",
             "The quick brown fox jumps over the lazy dog",
             "le la les et un une des il elle",
             "der die das und ist nicht ein eine",
             "\t\n x", '"quoted, text"', "semi;colon",
             # non-ASCII: DuckDB ascii()/split('') are codepoint-based like
             # ord(); a uint8 n-gram view truncates these (caught a bug)
             "héllo wörld", "日本語のテキストです", "emoji 🎉🎊 mix",
             "Ελληνικά και русский", "café né à Zürich", "ü" * 40]
    texts += ["".join(rng.choice(_ALPHABET, int(n)))
              for n in rng.integers(0, 200, 12)]
    return pd.DataFrame({
        "doc_id": [f"e{i:02d}" for i in range(len(texts))],
        "source": [f"s{i % 3}" for i in range(len(texts))],
        "text": texts,
    })


def test_text_family_differential_on_edge_corpus(ray_session, oracle_sqls,
                                                 tmp_path):
    """The text/dedup/rollup oracle family must stay exact on degenerate
    docs — zero-token docs crashed sequences_meta (empty-array
    fancy-index) and made the oracle invent a phantom token 0 until
    _SEQ_CTE gained nullif(text, '')."""
    import __ray_entry__

    df = _edge_corpus()
    sf = tmp_path / "edge_sf"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    con = duckdb.connect()
    con.register("documents", df)
    qs = __ray_entry__.queries()
    mismatches = []
    for name in TEXT_FAMILY:
        eng = _to_df(qs[name](str(sf))).reset_index(drop=True)
        ora = con.execute(oracle_sqls[name]).df()
        _compare_frames(name, eng, ora, mismatches)
    assert not mismatches, mismatches


def test_dedup_groups_on_dup_free_corpus(ray_session):
    """Zero candidate pairs must yield a schema-stable empty grouping, not
    a KeyError: Ray's to_pandas drops columns on an all-empty dataset."""
    import ray.data

    from matrixprofile_1_ray.stages.dedup import (
        dedup_groups,
        minhash_candidates,
    )

    rng = np.random.default_rng(8)
    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(6)],
        "text": ["".join(rng.choice(_ALPHABET, 80)) for _ in range(6)],
        "source": ["s"] * 6,
    })
    from matrixprofile_1_ray.sources.sequences import tokenize_documents_batch

    seq = ray.data.from_pandas(docs).map_batches(tokenize_documents_batch,
                                                 batch_format="pyarrow")
    cands = minhash_candidates(seq)
    assert cands.count() == 0
    out = dedup_groups(cands)
    # Dataset schema is the contract: to_pandas on ANY all-empty Dataset
    # is column-less in Ray 2.49, so assert on the schema + row count
    assert out.schema().names == ["doc_id", "component"]
    assert out.count() == 0


@pytest.mark.parametrize("seed", SEEDS)
def test_small_family_slices_nonempty(oracle_sqls, seed):
    """The guards must not drop everything — a silently-empty slice would
    make the differential (and the driver gate) vacuously green."""
    df = _random_corpus(seed)
    seq = _sequences_batch(df)
    fns = _engine_fns()
    for name in ("mp_profiles_small", "mp_stomp_small", "snippets_small",
                 "regimes_small", "pick_mp_small"):
        assert len(fns[name](seq)) > 0, name


DEDUP_FAMILY = ["dedup_exact", "dedup_minhash_lsh", "dedup_groups",
                "dedup_jaccard_verified", "simhash", "fingerprints"]


def _planted_dup_corpus(seed: int) -> pd.DataFrame:
    """Dedup-stress corpus the fixed testdata under-represents: exact
    duplicate families, near-dups straddling the 0.8 Jaccard verify
    threshold (single-char edits at varied positions), short docs
    (< k=5 chars — one whole-text shingle each, so identical short docs
    pair and DISTINCT short docs must NOT; the SQL oracle reproduces the
    whole-text hash), empty docs (zero shingles — the all-max sentinel
    signature, all empty docs pair as genuinely identical), and random
    background."""
    rng = np.random.default_rng(seed)

    def rand_text(n):
        return "".join(rng.choice(_ALPHABET, n))

    texts = []
    # exact-dup family of 3 + a pair
    base_a, base_b = rand_text(120), rand_text(75)
    texts += [base_a, base_a, base_a, base_b, base_b]
    # near-dups: one edit in a 200-char doc (jaccard ~0.95, above 0.8),
    # and heavier edits that fall below the verify threshold
    base_c = rand_text(200)
    texts.append(base_c)
    texts.append(base_c[:100] + ("X" if base_c[100] != "X" else "Y")
                 + base_c[101:])
    base_d = rand_text(150)
    texts.append(base_d)
    texts.append(base_d[:30] + rand_text(40) + base_d[70:])
    # shared 64-char block inside otherwise-different docs
    block = rand_text(64)
    texts.append(rand_text(30) + block + rand_text(30))
    texts.append(rand_text(25) + block + rand_text(35))
    # short docs: an identical pair (must dedup), two distinct singles
    # (must NOT pair with each other or the pair), plus TWO empty docs
    # (zero shingles, sentinel path — genuinely identical, must pair)
    texts += ["ab", "ab", "xy", "q", "", ""]
    # background
    texts += [rand_text(int(n)) for n in rng.integers(20, 250, 8)]
    return pd.DataFrame({
        "doc_id": [f"p{i:03d}" for i in range(len(texts))],
        "source": [f"s{i % 3}" for i in range(len(texts))],
        "text": texts,
    })


@pytest.mark.parametrize("seed", [13, 59])
def test_dedup_family_differential_on_planted_corpus(ray_session,
                                                     oracle_sqls, seed,
                                                     tmp_path):
    """The REAL gate dedup queries (LSH candidates, duplicate groups,
    exact-Jaccard verify) vs their SQL oracles on corpora with planted
    duplicate structure — the fixed testdata exercises only its own
    organic dup pattern."""
    import __ray_entry__

    df = _planted_dup_corpus(seed)
    sf = tmp_path / f"dup_sf_{seed}"
    sf.mkdir()
    df.to_parquet(sf / "documents.parquet", index=False)
    con = duckdb.connect()
    con.register("documents", df)
    qs = __ray_entry__.queries()
    mismatches = []
    n_pairs = 0
    for name in DEDUP_FAMILY:
        eng = _to_df(qs[name](str(sf))).reset_index(drop=True)
        if name == "dedup_minhash_lsh":
            n_pairs = len(eng)
            pair_set = set(zip(eng["doc_a"], eng["doc_b"]))
        ora = con.execute(oracle_sqls[name]).df()
        _compare_frames(name, eng, ora, mismatches)
    assert not mismatches, mismatches
    # anti-vacuity: the planted structure must actually surface pairs —
    # exact-dup family C(3,2)=3 + dup pair + identical short pair +
    # identical empty pair at minimum
    assert n_pairs >= 6
    # short/empty docs are planted at fixed positions: "ab","ab","xy","q",
    # "","" are p011..p016 (11 long docs precede them)
    short_ids = {f"p{i:03d}" for i in range(11, 17)}
    allowed = {("p011", "p012"),   # identical "ab" pair
               ("p015", "p016")}   # identical empty pair
    got_short = {(a, b) for a, b in pair_set
                 if a in short_ids and b in short_ids}
    assert got_short == allowed, got_short
