"""Per-stage / per-partition lineage records and resume-from-checkpoint.

The reference's resumability is a hash-cache + dir-mtimes + parser
fingerprint manifest plus graph rehydration (``graph_updater.py:129-211,
1049-1225, 1633-1812``), with the hard-won invariant that an incremental run
must equal a clean rebuild (issue #532, ``evals/README.md:133-175``).

Ray-native translation (SURVEY.md §4 "Resume"): every checkpointed stage
writes immutable parquet under its own directory plus a ``_MANIFEST.json``
recording row count, per-file rows, an input fingerprint and status. Resume
= if a stage's manifest is complete AND the fingerprint matches, read the
parquet back instead of recomputing — re-derive, never mutate. A fingerprint
mismatch invalidates the checkpoint (the analog of cgr's parser-fingerprint
stamp invalidating its hash cache).
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from ray.data import Dataset

MANIFEST = "_MANIFEST.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def read_manifest(stage_dir: str) -> dict | None:
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


class Checkpointer:
    """Stage-granular checkpoint/resume over a root directory.

    ``stage(name, build)`` returns the stage's Dataset, either freshly built
    and persisted (atomically: data lands in ``.tmp`` then renamed) or read
    back from a completed checkpoint. ``resumed`` records which stages were
    skipped — the incremental-equivalence test asserts resumed == clean.
    """

    def __init__(self, root: str, fingerprint: str = ""):
        self.root = root
        self.fingerprint = fingerprint
        self.resumed: list[str] = []
        self.built: list[str] = []
        os.makedirs(root, exist_ok=True)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(self, name: str, build: Callable[[], Dataset]) -> Dataset:
        import ray.data as rd

        sdir = self.stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        m = read_manifest(sdir)
        if m and m.get("status") == "complete" and m.get("fingerprint") == self.fingerprint:
            self.resumed.append(name)
            return rd.read_parquet(data_dir)

        # (re)build: clear any partial output, write atomically
        shutil.rmtree(sdir, ignore_errors=True)
        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, ".tmp")
        ds = build()
        ds.write_parquet(tmp)
        os.rename(tmp, data_dir)

        files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        import pyarrow.parquet as pq

        per_file = {f: pq.read_metadata(os.path.join(data_dir, f)).num_rows for f in files}
        manifest = {
            "stage": name,
            "status": "complete",
            "fingerprint": self.fingerprint,
            "rows": int(sum(per_file.values())),
            "files": per_file,
        }
        with open(_manifest_path(sdir) + ".tmp", "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(_manifest_path(sdir) + ".tmp", _manifest_path(sdir))
        self.built.append(name)
        return rd.read_parquet(data_dir)


def partition_manifest(out_dir: str) -> dict:
    """Row counts per hive partition directory under a materialized output.

    Written next to the data so a rerun can skip finished partitions
    (per-partition lineage, north-star requirement)."""
    import pyarrow.parquet as pq

    parts: dict[str, int] = {}
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if not (os.path.isdir(pdir) and "=" in name):
            continue
        n = 0
        for f in os.listdir(pdir):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(pdir, f)).num_rows
        parts[name] = n
    manifest = {"partitions": parts, "rows": int(sum(parts.values()))}
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
