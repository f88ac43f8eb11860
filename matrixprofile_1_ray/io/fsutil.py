"""Filesystem guard shared by every stage that rebuilds a persisted
output directory (IVF index, flagship rollup layout).

``write_parquet`` APPENDS uniquely-named files, so re-running a writer
into its previous output silently doubles every row in later pruned
reads.  The fix everywhere is the same policy: rebuild from clean when
the target is recognizably OUR layout, refuse anything else (a typo'd
path must raise, never delete an unrelated tree).  Resolved through
``pyarrow.fs`` so the guard holds for URI targets (s3://, gs://) exactly
as for local paths — at 100 TB the output is never on a local disk.
"""

from __future__ import annotations

from collections.abc import Callable


def fs_and_path(path: str):
    """Resolve ``path`` to ``(pyarrow FileSystem, fs-relative path)``.

    from_uri rejects relative local paths ("URI has empty scheme"), so
    anything without a scheme is absolutized first.  The ONE place this
    rule lives — writers (guarded_clean_dir), the retention store and the
    flagship pruned reads all resolve through it, so they can never apply
    different URI handling to the same target."""
    import os

    from pyarrow import fs as pafs

    if "://" not in path:
        path = os.path.abspath(path)
    return pafs.FileSystem.from_uri(path)


def guarded_clean_dir(path: str, is_ours: Callable[[list[str]], bool],
                      what: str) -> None:
    """Delete ``path`` (file tree) iff it does not exist, is empty, or
    ``is_ours(basenames)`` accepts its top-level entries; raise
    ``ValueError`` otherwise.  ``what`` names the layout in the error."""
    from pyarrow import fs as pafs

    filesystem, rel = fs_and_path(path)
    info = filesystem.get_file_info(rel)
    if info.type == pafs.FileType.NotFound:
        return
    if info.type != pafs.FileType.Directory:
        raise ValueError(
            f"refusing to rebuild into {path!r}: exists and is not a "
            f"directory")
    entries = [e.base_name for e in
               filesystem.get_file_info(pafs.FileSelector(rel))]
    if entries and not is_ours(entries):
        raise ValueError(
            f"refusing to rebuild into {path!r}: directory exists and does "
            f"not look like {what}; delete it explicitly or point the "
            f"output elsewhere")
    filesystem.delete_dir(rel)
