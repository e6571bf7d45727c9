"""--py-files packaging smoke: the north_rule launch shape is
``spark-submit --py-files engine.zip job.py ...`` on a real cluster; this
pins that the zip built by tools/package_pyfiles.py is complete and
importable by a spark-submit'd driver that does NOT have the repo on its
path (a missing module or data-file-only dependency would fail here, not
on the cluster)."""

import os
import subprocess

from tools.package_pyfiles import build

_DRIVER_SRC = """\
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.appName("pyfiles-smoke")
    .config("spark.sql.shuffle.partitions", "2")
    .getOrCreate()
)
# all imports resolve from the --py-files zip (cwd has no repo checkout)
from patent_decision_document_converter_spark.plans.job import convert_documents
from patent_decision_document_converter_spark.sources.documents import create_documents_df

rows = [
    {
        "doc_id": "d1",
        "spans": [
            {"kind": "text", "text": "１．これは本文です。", "media_ref": "", "offset": 0},
            {"kind": "figure", "text": "[図１]", "media_ref": "m:1", "offset": 1},
            {"kind": "text", "text": "２．続きの本文です。", "media_ref": "", "offset": 2},
        ],
    }
]
out = convert_documents(create_documents_df(spark, rows), mode="officeAction").collect()
assert len(out) == 1, out
assert out[0]["n_spans_out"] == 3, out
assert out[0]["spans"][1]["media_ref"] == "m:1", out
print("PYFILES_SMOKE_OK", out[0]["n_spans_out"])

# the extraction pipeline must also resolve from the zip (north-rule
# launch shape: media payloads -> dispatcher -> span splice)
from patent_decision_document_converter_spark.operators.pdf import _encode_pdf
from patent_decision_document_converter_spark.plans.extract_job import extract_and_enrich

docs2 = create_documents_df(
    spark,
    [
        {
            "doc_id": "d2",
            "spans": [
                {"kind": "media", "text": "", "media_ref": "pdf:d2", "offset": 0},
                {"kind": "text", "text": "本文", "media_ref": "", "offset": 1},
            ],
        }
    ],
)
media = spark.createDataFrame(
    [("d2", "pdf:d2", "pdf", bytearray(_encode_pdf([(72.0, 700.0, "fig text")], compress=True)))],
    "doc_id string, media_ref string, format string, payload binary",
)
enr = extract_and_enrich(docs2, media).collect()
kinds = [s["kind"] for s in enr[0]["spans"]]
assert kinds == ["media", "media_text", "text"], enr
assert enr[0]["spans"][1]["text"] == "fig text", enr
print("PYFILES_EXTRACT_OK", len(kinds))
spark.stop()
"""


def test_spark_submit_with_pyfiles_zip(tmp_path):
    import pyspark

    zip_path = build(str(tmp_path / "engine.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER_SRC)

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY source of the package
    res = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(driver),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo checkout
        env=env,
        timeout=480,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    assert "PYFILES_SMOKE_OK 3" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
    assert "PYFILES_EXTRACT_OK 3" in res.stdout, res.stdout[-2000:] + res.stderr[-2000:]
