"""The spark-submit --py-files artifact is real and self-contained: a
fresh subprocess with ONLY the zip on sys.path (cwd moved away from the
repo) must import the package and run the analysis kernel — proving no
hidden dependency on repo-relative files, data resources, or the
source tree. Byte-determinism is pinned so a zip hash identifies the
code revision."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from package_pyfiles import build_zip  # noqa: E402


def test_zip_contains_all_modules(tmp_path):
    out = build_zip(str(tmp_path / "eng.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "ckanext_extractor_spark/__init__.py" in names
    assert "ckanext_extractor_spark/api.py" in names
    assert "ckanext_extractor_spark/functions/hybrid.py" in names
    assert all(n.endswith(".py") for n in names)
    assert not any("__pycache__" in n for n in names)


def test_zip_is_deterministic(tmp_path):
    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    ha = hashlib.md5(open(a, "rb").read()).hexdigest()
    hb = hashlib.md5(open(b, "rb").read()).hexdigest()
    assert ha == hb


def test_zip_imports_standalone(tmp_path):
    """Fresh interpreter, cwd outside the repo, sys.path = [zip]: the
    package must import and the pure-python analysis chain must run
    (tokenizer + stemmer + query parse — the pieces every executor
    unpickles under --py-files)."""
    out = build_zip(str(tmp_path / "eng.zip"))
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "from ckanext_extractor_spark.analysis.tokenizer import (\n"
        "    analyze_query, SIMPLE_CONFIG)\n"
        "from ckanext_extractor_spark.analysis.stem import porter_stem\n"
        "from ckanext_extractor_spark.functions import hybrid, dsir\n"
        "q = analyze_query('parseBuffer camelCase')\n"
        "assert q, q\n"
        "qs = analyze_query('alpha beta', config=SIMPLE_CONFIG)\n"
        "assert qs == ['alpha', 'beta'], qs\n"
        "assert porter_stem('running') == 'run'\n"
        "print('OK')\n" % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip().endswith("OK")
