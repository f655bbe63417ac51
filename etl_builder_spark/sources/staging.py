"""Shared staging-directory discipline for keys that materialize
fixture files on local disk (blob dirs, JSONL corpora, stream replay
slices).

Why this exists (ADVICE r10): the round-10 stagers keyed their tempdir
paths on ``basename(sf_dir)`` only, so two corpora with the same
basename under different parents (``/a/sf0.01`` vs ``/b/sf0.01``)
collided — and the mtime marker guard would then happily serve the
OTHER corpus's staged files.  Worse, restaging wrote over a live
directory without clearing it, so stale files (e.g. ``doc_*.bin``
beyond a shrunken ``BLOB_DOC_MAX``) survived and were picked up by
unfiltered directory scans.

The contract here fixes both:

- ``stage_path`` keys the directory on basename PLUS a sha256 digest of
  the ABSOLUTE source path, so distinct corpora can never share a stage;
- ``staged`` clears the directory completely before every rebuild, so a
  stage only ever contains exactly what the current builder wrote.

100 TB posture: staging is a TEST-FIXTURE concern (local replay dirs
for the streaming/binary-source keys) — production pipelines read the
real object store directly; nothing here is on the scaled data path.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable


def stage_path(family: str, sf_dir: str) -> str:
    """Collision-proof stage directory for (family, corpus): the
    basename keeps paths human-readable, the abs-path digest makes
    same-basename corpora under different parents distinct."""
    abs_dir = os.path.abspath(sf_dir.rstrip("/") or sf_dir)
    digest = hashlib.sha256(abs_dir.encode("utf-8")).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(),
        family,
        f"{os.path.basename(abs_dir)}-{digest}",
    )


def staged(family: str, sf_dir: str, src: str, build: Callable[[str], None]) -> str:
    """Marker-guarded idempotent staging, atomic-swap edition.

    If the ``_staged`` marker is missing or older than ``src``, the
    stage is rebuilt — but never in place (ADVICE r11: the old
    clear-first ``rmtree`` could delete files out from under a
    concurrent reader, and two processes racing the marker check could
    interleave).  The rebuild goes into a UNIQUE temp sibling (so
    concurrent builders never share a scratch dir), the marker is
    written there, and the finished tree is swapped in with
    ``os.rename`` — atomic on POSIX within one filesystem — so a reader
    listing the stage path only ever observes either the complete old
    tree or the complete new one, never a partially-built state.
    """
    stage = stage_path(family, sf_dir)
    done = os.path.join(stage, "_staged")
    if not os.path.exists(done) or os.path.getmtime(done) < os.path.getmtime(src):
        parent = os.path.dirname(stage)
        os.makedirs(parent, exist_ok=True)
        scratch = tempfile.mkdtemp(prefix=os.path.basename(stage) + ".build-", dir=parent)
        try:
            build(scratch)
            with open(os.path.join(scratch, "_staged"), "w") as f:
                f.write("ok")
            # swap in: move any existing stage aside first (rename onto a
            # non-empty dir fails on POSIX), then promote the scratch tree.
            trash = None
            if os.path.exists(stage):
                trash = tempfile.mkdtemp(prefix=os.path.basename(stage) + ".old-", dir=parent)
                os.rename(stage, os.path.join(trash, "t"))
            try:
                os.rename(scratch, stage)
                scratch = None  # promoted — nothing to clean up
            except OSError:
                # a concurrent builder promoted its tree between our
                # move-aside and rename; its stage is complete (marker
                # written pre-swap), so just discard our scratch copy.
                pass
            if trash is not None:
                shutil.rmtree(trash, ignore_errors=True)
        finally:
            if scratch is not None:
                shutil.rmtree(scratch, ignore_errors=True)
    return stage


def copy_parquet(src: str, dst: str) -> None:
    """Copy a parquet TABLE to a single file, whether ``src`` is a
    single-file corpus (the shipped sf dirs) or a Spark-written
    DIRECTORY of part files (the ×N scale syntheses).  The file-stream
    stagers replay byte-identical single files, so a directory source
    is consolidated through pyarrow (round-12 x10 sweep:
    ``shutil.copy`` raised IsADirectoryError on every stream_*_live
    key over the synthesized corpus).

    The directory path streams batch-at-a-time through a ParquetWriter
    (round-13, ADVICE r12): a single ``read_table`` materializes the
    whole table in driver memory, an OOM cliff once the engine's own
    Spark-written outputs (arbitrarily large at higher ×N syntheses)
    flow back through this stager.  ``pyarrow.dataset`` scans fragments
    in file order with a single thread, so the consolidated row order
    is deterministic — same guarantee the one-shot read gave."""
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    if os.path.isfile(src):
        shutil.copy(src, dst)
    else:
        ds = pads.dataset(src, format="parquet")
        with pq.ParquetWriter(dst, ds.schema) as writer:
            # use_threads=False keeps fragment order == filename order,
            # the same deterministic row order read_table produced.
            for batch in ds.scanner(use_threads=False).to_batches():
                if batch.num_rows:
                    writer.write_batch(batch)
