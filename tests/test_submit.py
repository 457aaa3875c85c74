"""The spark-submit --py-files packaging surface.

The cluster deployment path (bin/submit_crawl.py) ships the package as
a zip archive; everything the executors import — including the PSL
data table — must resolve through zipimport, not filesystem paths.
"""

import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_zip(tmp_path: Path) -> Path:
    zip_path = tmp_path / "heritrix_spark.zip"
    pkg = REPO / "heritrix_spark"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in pkg.rglob("*"):
            if "__pycache__" in f.parts or f.is_dir():
                continue
            z.write(f, f.relative_to(REPO))
    return zip_path


def test_psl_table_loads_from_zip(tmp_path):
    """importlib.resources must read data/psl_surt_rules.txt out of the
    archive itself (a __file__+open loader would raise here)."""
    zip_path = build_zip(tmp_path)
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "from heritrix_spark.functions import psl\n"
        "t = psl._load()\n"
        "assert len(t) > 3000, len(t)\n"
        "assert psl.reduce_surt_authority_py('uk,co,example,www,') == 'uk,co,example,'\n"
        "print('ok', len(t))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zip_path)],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # not the repo — the zip must be the only source
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.startswith("ok")


def test_submit_cli_arg_validation():
    """bin/submit_crawl.py rejects an input-less invocation before
    touching Spark (fast failure on a misconfigured submit)."""
    out = subprocess.run(
        [sys.executable, str(REPO / "bin" / "submit_crawl.py"), "--store", "/tmp/x"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 2
    assert "--docs/--seeds/--robots or --fixture" in out.stderr
