"""Build the --py-files artifact for spark-submit deployment (north rule:
``spark-submit --py-files`` on a multi-executor cluster).

    python tools/package.py [dist/rdf_rdfxml_spark.zip]
    spark-submit --py-files dist/rdf_rdfxml_spark.zip \
        --master ... rdf_rdfxml_spark/cli.py --input ... --output ...
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def build(out: pathlib.Path) -> pathlib.Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "rdf_rdfxml_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    target = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else \
        REPO / "dist" / "rdf_rdfxml_spark.zip"
    path = build(target)
    names = zipfile.ZipFile(path).namelist()
    print(f"wrote {path} ({len(names)} modules)")
