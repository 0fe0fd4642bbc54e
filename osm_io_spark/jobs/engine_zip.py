"""Build the ``--py-files`` artifact for spark-submit.

The north rule mandates jobs launched via ``spark-submit --py-files``;
this module produces the deterministic engine zip that every job module
ships with (and that ``queries.ensure_shipped`` adds programmatically
when the engine is driven from a plain Python process instead).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile


def build_engine_zip(out_path: str | None = None) -> str:
    """Zip the osm_io_spark package (sources only, content-addressed)."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sources: list[str] = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                sources.append(os.path.join(root, fn))
    sources.sort()
    if out_path is None:
        h = hashlib.md5()
        for s in sources:
            with open(s, "rb") as fh:
                h.update(fh.read())
        out_path = os.path.join(tempfile.gettempdir(),
                                f"osm_io_spark_engine_{h.hexdigest()[:12]}.zip")
        if os.path.exists(out_path):
            return out_path
    tmp = out_path + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for s in sources:
            rel = os.path.relpath(s, os.path.dirname(pkg_dir))
            z.write(s, rel)
    os.replace(tmp, out_path)
    return out_path


if __name__ == "__main__":
    print(build_engine_zip())
