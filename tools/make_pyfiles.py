"""Build the ``--py-files`` artifact: dist/cds_spark.zip.

The north rule's deployment mode is ``spark-submit --py-files`` onto a
multi-executor cluster; this packages the pure-python engine so the driver
and every executor import the identical code. Sources only (.py + the
FastLocalFileSystem.java for reference) — no compiled .class (bytecode is
JVM-version-specific; session.py compiles it at first use on writable
installs and degrades gracefully when the package lives in a zip).

Usage: python tools/make_pyfiles.py [out_zip]   (default dist/cds_spark.zip)
Prints the artifact path.
"""

from __future__ import annotations

import os
import sys
import zipfile

INCLUDE_EXT = {".py", ".java"}


def build(out_zip: str | None = None) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "cds_spark")
    out = out_zip or os.path.join(repo, "dist", "cds_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    # deterministic artifact: sorted walk + fixed timestamps, so repeated
    # builds of the same source are byte-identical (cacheable on clusters)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for fn in sorted(files):
                if os.path.splitext(fn)[1] not in INCLUDE_EXT:
                    continue
                full = os.path.join(root, fn)
                arc = os.path.relpath(full, repo)
                info = zipfile.ZipInfo(arc, date_time=(1980, 1, 1, 0, 0, 0))
                info.compress_type = zipfile.ZIP_DEFLATED
                with open(full, "rb") as f:
                    z.writestr(info, f.read())
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
