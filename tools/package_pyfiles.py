"""Build the ``spark-submit --py-files`` artifact: one zip holding the
whole ``ckanext_extractor_spark`` package (pure Python, no data files —
stopword/synonym tables are code, so the zip is self-contained).

    python tools/package_pyfiles.py [dist/ckanext_extractor_spark.zip]

Then on any cluster:

    spark-submit --py-files dist/ckanext_extractor_spark.zip \
        your_job.py ...
    # or drive the CLI itself (spark-submit has no `python -m`
    # equivalent, so ship the 3-line wrapper as the primary resource):
    spark-submit --py-files dist/ckanext_extractor_spark.zip \
        tools/submit_cli.py build --source ... --index ...

Deterministic output: entries are added in sorted order with a fixed
timestamp, so the same tree always produces byte-identical artifacts
(reproducible deploys; a content hash of the zip identifies the code
revision).
"""

from __future__ import annotations

import os
import sys
import zipfile

FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # reproducible builds


def build_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    pkg = os.path.join(root, "ckanext_extractor_spark")
    if not os.path.isdir(pkg):
        raise SystemExit(f"package dir not found: {pkg}")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                exist_ok=True)
    entries = []
    for dirpath, dirnames, filenames in os.walk(pkg):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            full = os.path.join(dirpath, fn)
            arc = os.path.relpath(full, root)
            entries.append((arc, full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arc, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=FIXED_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return out_path


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else \
        "dist/ckanext_extractor_spark.zip"
    path = build_zip(out)
    n = len(zipfile.ZipFile(path).namelist())
    print(f"{path}: {n} modules, {os.path.getsize(path)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
