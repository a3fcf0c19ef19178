"""The spark-submit deployment surface: the --py-files zip must contain
the whole package and import cleanly from the zip alone; the submit
script must build a real index from CLI args."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_importable(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py")],
        capture_output=True, text=True, check=True,
    )
    zpath = out.stdout.strip()
    assert zpath.endswith(".zip") and os.path.exists(zpath)
    names = zipfile.ZipFile(zpath).namelist()
    assert "text_search_spark/index/build.py" in names
    assert "text_search_spark/streaming/windows.py" in names
    # import from the zip ONLY (what executors see via --py-files)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import text_search_spark.index.build as b; "
        "import text_search_spark.operators.ann; "
        "print(b.TOKENS_TMP)" % zpath
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
        cwd=str(tmp_path),  # not the repo: the zip must be self-sufficient
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.stdout.strip() == "tokens_tmp"


def test_submit_build_cli(spark, tmp_path, monkeypatch):
    """Drive scripts/submit_build.py's main() through its CLI surface
    (in-process so the shared session is reused; its spark.stop() is
    no-op'd so the session-scoped fixture survives for later tests)."""
    import pandas as pd
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)

    src = str(tmp_path / "corpus.parquet")
    pd.DataFrame(
        {
            "url": [f"https://x.example/p{i}" for i in range(80)],
            "text": [f"alpha beta w{i % 7} gamma" for i in range(80)],
        }
    ).to_parquet(src)
    ix = str(tmp_path / "ix")
    argv = [
        "submit_build.py", "--input", src, "--index", ix,
        "--n-buckets", "4", "--n-shards", "2", "--bucket-groups", "2",
    ]
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import submit_build

        old = sys.argv
        sys.argv = argv
        try:
            submit_build.main()
        finally:
            sys.argv = old
    finally:
        sys.path.pop(0)

    from text_search_spark.index import format as ixfmt
    from text_search_spark.index.query import QuerySpec, bm25_topk_rows

    man = ixfmt.load_manifest(ix)
    assert man is not None and man.complete and man.n_docs == 80
    rows = bm25_topk_rows(spark, ix, [QuerySpec("q", ["ALPHA"], "or")], k=3)
    assert len(rows) == 3
