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
    """Marker-guarded idempotent staging.

    If the ``_staged`` marker is missing or older than ``src``, the
    stage directory is REMOVED ENTIRELY, recreated, rebuilt via
    ``build(stage)``, and re-marked.  The clear-first rule guarantees a
    stage never carries leftovers from a previous builder version, so
    unfiltered directory scans over it are safe.
    """
    stage = stage_path(family, sf_dir)
    done = os.path.join(stage, "_staged")
    if not os.path.exists(done) or os.path.getmtime(done) < os.path.getmtime(src):
        shutil.rmtree(stage, ignore_errors=True)
        os.makedirs(stage, exist_ok=True)
        build(stage)
        with open(done, "w") as f:
            f.write("ok")
    return stage
