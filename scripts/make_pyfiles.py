"""Build the ``--py-files`` archive for the spark-submit deploy surface.

    python scripts/make_pyfiles.py [dist/engine.zip]

Packages ``postal_address_spark`` (every ``.py`` plus the vendored
``refdata/data/*.json``, which `refdata.iso3166_2` reads zip-safely via
importlib.resources) into ONE deterministic zip: entries are sorted and
timestamps pinned, so the same tree always produces byte-identical bytes
— the archive itself can be content-addressed by deploy tooling.  The
jobs under ``jobs/`` are NOT zipped; they are the ``spark-submit``
primary resources and ship as plain files::

    spark-submit --py-files dist/engine.zip jobs/link.py --input ... --output ...

tests/test_spark_submit.py runs exactly that command (from a scratch cwd
where the package is NOT otherwise importable) as the deploy smoke test.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PACKAGE = "postal_address_spark"
# pinned DOS timestamp (zip has no epoch 0): determinism, not provenance
_FIXED_DATE = (1980, 1, 1, 0, 0, 0)


def build_zip(out_path: str, repo_root: str = REPO_ROOT) -> str:
    pkg_root = os.path.join(repo_root, PACKAGE)
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for name in sorted(filenames):
            if name.endswith(".py") or name.endswith(".json"):
                full = os.path.join(dirpath, name)
                members.append((os.path.relpath(full, repo_root), full))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(members):
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arcname.replace(os.sep, "/"), _FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main(argv=None) -> str:
    argv = sys.argv[1:] if argv is None else argv
    out = argv[0] if argv else os.path.join(REPO_ROOT, "dist", "engine.zip")
    path = build_zip(out)
    print(path)
    return path


if __name__ == "__main__":
    main()
