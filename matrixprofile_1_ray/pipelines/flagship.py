"""Flagship pipeline: sequences -> gap-fill -> compress(+verify) ->
matrix profiles -> retention-tier rollups.

All stages are streaming ``map_batches`` over Arrow batches; nothing
materializes the corpus.  At 100 TB the same graph holds: the read prunes
columns, every transform is per-row so blocks flow independently, and the
only all-to-all steps live in the optional corpus-level top-k and the
chunked-series merge (state/chunked.py).
"""

from __future__ import annotations

from ..sources.sequences import sequences_from_documents
from ..stages.codec_stage import verify_roundtrip_batch
from ..stages.gapfill import gapfill_batch
from ..stages.profile import compute_profiles_batch
from ..stages.rollup import mp_rollup_batch, rollup_batch


def sequences_pipeline(sf_dir: str, gapfill_mode: str = "forward_fill",
                       verify_codec: bool = True, num_blocks: int | None = None):
    """sequences source + gap-fill + inline compression-invariant check.

    ``num_blocks=None`` auto-splits single-file inputs so downstream
    kernel stages can use every core (a 100 TB corpus already arrives in
    thousands of files; the split matters only for the small test inputs).
    """
    ds = sequences_from_documents(sf_dir)
    if num_blocks is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4))
        num_blocks = 2 * cpus
    if num_blocks:
        ds = ds.repartition(num_blocks)
    ds = ds.map_batches(lambda b: gapfill_batch(b, mode=gapfill_mode),
                        batch_format="pyarrow")
    if verify_codec:
        ds = ds.map_batches(verify_roundtrip_batch, batch_format="pyarrow")
        ds = ds.drop_columns(["tokens_enc"])
    return ds


def token_rollup_pipeline(sf_dir: str, tiers=None, **seq_kwargs):
    """Tier rollups of the raw token values (min/max/sum/count/mean)."""
    ds = sequences_pipeline(sf_dir, **seq_kwargs)
    return ds.map_batches(lambda b: rollup_batch(b, tiers=tiers),
                          batch_format="pyarrow")


def profiles_pipeline(sf_dir: str, w: int = 32, algorithm: str = "mpx",
                      keep_tokens: bool = False, **seq_kwargs):
    ds = sequences_pipeline(sf_dir, **seq_kwargs)
    return ds.map_batches(
        lambda b: compute_profiles_batch(b, w=w, algorithm=algorithm,
                                         keep_tokens=keep_tokens),
        batch_format="pyarrow", batch_size=256)


def mp_rollup_pipeline(sf_dir: str, w: int = 32, tiers=None, **seq_kwargs):
    """Tier rollups of the matrix-profile distances (min/mean/count/argmin)."""
    ds = profiles_pipeline(sf_dir, w=w, **seq_kwargs)
    return ds.map_batches(lambda b: mp_rollup_batch(b, tiers=tiers),
                          batch_format="pyarrow")


def flagship_batch(batch, w: int = 32, tiers=None):
    """Single-pass flagship transform: token tier rollups AND matrix-profile
    tier rollups from one batch, unified into one long-format table (token
    rows carry null mp_* columns and vice versa).  One streaming pass over
    the corpus instead of two."""
    import pyarrow as pa

    from ..stages.profile import compute_profiles_batch
    from ..stages.rollup import mp_rollup_batch, rollup_batch

    token_rolls = rollup_batch(batch, tiers=tiers)
    prof = compute_profiles_batch(batch, w=w)
    mp_rolls = mp_rollup_batch(prof, tiers=tiers)
    return pa.concat_tables([token_rolls, mp_rolls],
                            promote_options="default")


def flagship_rollup(sf_dir: str, w: int = 32, tiers=None, out_dir=None):
    """The end-to-end rollup: token tiers + MP tiers; optionally written as
    partitioned Parquet (one directory per tier — resumable layout)."""
    token_rollups = token_rollup_pipeline(sf_dir, tiers=tiers)
    mp_rollups = mp_rollup_pipeline(sf_dir, w=w, tiers=tiers)
    if out_dir:
        token_rollups.write_parquet(f"{out_dir}/token_rollups")
        mp_rollups.write_parquet(f"{out_dir}/mp_rollups")
    return token_rollups, mp_rollups
