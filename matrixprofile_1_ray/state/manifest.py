"""Per-partition lineage manifests and checkpointed resume.

The resumable-output contract (north rule): output is laid out as one
directory per partition key; each completed partition appends one JSON line
to ``_manifest.jsonl`` recording (key, input fingerprint, output path, rows,
bytes, kernel version).  ``run_partitioned`` skips any partition whose
manifest entry matches the current fingerprint — a restarted job re-runs
only unfinished or invalidated partitions, and a fingerprint change (new
input or kernel version) invalidates exactly the affected partitions.

Writes are atomic: each partition lands in ``<key>.tmp-<pid>`` and is
renamed into place before the manifest line is appended, so a crash
mid-partition leaves no partially-visible output.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from .. import __version__


class LineageManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "_manifest.jsonl")

    def entries(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                for line in fh:
                    entry = json.loads(line)
                    done[entry["key"]] = entry
        return done

    def is_done(self, key: str, fingerprint: str) -> bool:
        entry = self.entries().get(key)
        return (entry is not None
                and entry["fingerprint"] == fingerprint
                and entry["version"] == __version__
                and os.path.exists(os.path.join(self.out_dir, key)))

    def record(self, key: str, fingerprint: str, rows: int, nbytes: int):
        entry = {
            "key": key,
            "fingerprint": fingerprint,
            "version": __version__,
            "rows": int(rows),
            "bytes": int(nbytes),
            "completed_at": time.time(),
        }
        with open(self.path, "a") as fh:
            fh.write(json.dumps(entry) + "\n")


def _dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def run_partitioned(out_dir: str, partitions: dict[str, str], make_dataset,
                    progress=None) -> dict:
    """Run ``make_dataset(key) -> ray.data.Dataset`` once per partition,
    writing each to ``out_dir/<key>/`` with manifest-gated skip.

    ``partitions`` maps partition key -> input fingerprint (e.g. source
    file path + mtime + size).  Returns {key: 'done'|'skipped'}.
    """
    manifest = LineageManifest(out_dir)
    status = {}
    for key, fingerprint in partitions.items():
        if manifest.is_done(key, fingerprint):
            status[key] = "skipped"
            continue
        final = os.path.join(out_dir, key)
        tmp = f"{final}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)

        ds = make_dataset(key)
        ds.write_parquet(tmp)
        rows = sum(
            __import__("pyarrow.parquet", fromlist=["ParquetFile"])
            .ParquetFile(os.path.join(tmp, f)).metadata.num_rows
            for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(tmp, final)
        manifest.record(key, fingerprint, rows, _dir_size(final))
        status[key] = "done"
        if progress:
            progress(key)
    return status


def file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{path}:{st.st_size}:{int(st.st_mtime)}"
