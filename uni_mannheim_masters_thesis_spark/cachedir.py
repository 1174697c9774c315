"""Cross-process-safe cached-directory publication.

The derived-table builders materialize multi-job Spark outputs under
/tmp keyed by (dataset, mtime, variant). A done-marker written into
the target dir AFTER the build is not cross-process safe: a second
process (bench running alongside pytest) can observe — and read, or
vacuum — a half-built directory, or two concurrent builders can
interleave rmtree/build on the same path. The fix is the classic
staging protocol: build into a PRIVATE sibling temp dir, write the
marker inside it, then publish with one atomic ``os.rename`` — a
reader can only ever observe a missing dir or a complete one, and
concurrent builders race harmlessly on the rename (the loser discards
its staging build and uses the winner's).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable


def staged_cache_dir(
    tdir: str, marker_name: str, build: Callable[[str], None]
) -> str:
    """Return ``tdir`` with ``marker_name`` present, building it via
    ``build(staging_dir)`` + atomic rename if missing. ``build``
    receives a private empty directory and must treat it as the
    eventual ``tdir`` contents; it may itself create ``marker_name``
    (e.g. a stats JSON that doubles as the marker), otherwise a plain
    "ok" marker is added before publication."""
    marker = os.path.join(tdir, marker_name)
    if os.path.exists(marker):
        return tdir
    parent = os.path.dirname(tdir) or "."
    stage = tempfile.mkdtemp(
        prefix=os.path.basename(tdir) + ".stage-", dir=parent
    )
    try:
        build(stage)
        stage_marker = os.path.join(stage, marker_name)
        if not os.path.exists(stage_marker):
            with open(stage_marker, "w") as f:
                f.write("ok")
        try:
            os.rename(stage, tdir)  # the atomic commit point
        except OSError:
            # tdir appeared meanwhile: either another process published
            # first (marker present — drop ours, use theirs) or a stale
            # half-built dir from a pre-staging-era crash lingers (no
            # marker — replace it)
            if os.path.exists(marker):
                shutil.rmtree(stage, ignore_errors=True)
            else:
                shutil.rmtree(tdir, ignore_errors=True)
                os.rename(stage, tdir)
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    return tdir
