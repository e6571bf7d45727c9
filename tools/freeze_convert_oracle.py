"""Freeze REFERENCE-computed expected outputs for the conversion contract
queries into a parquet the DuckDB oracle can read.

For every document in the given sf dirs, runs the reference JS pipeline
(tools/js_oracle.mjs, which executes /root/reference's own code under node)
for the three contract modes plus the typo checker, and writes one row per
(doc_id, input-md5) with the expected output digests:

    doc_id        BIGINT   document id
    in_md5        VARCHAR  md5 of the raw input text (join/guard key)
    n_spans_out   BIGINT   spans emitted (1: single text span in, no media)
    oa_md5        VARCHAR  md5 of the officeAction conversion output
    oa_n_findings BIGINT   typo-checker finding count on the raw input
    par_refs      VARCHAR  paragraph-mode output (extractParagraphAndFigureRefs)
    html_md5      VARCHAR  md5 of the html-mode output
    html_len      BIGINT   html-mode output length (code points)
    oa_h1_md5     VARCHAR  officeAction output md5 of the FIRST HALF of the
                           text (chars [0, len//2)) — interleaved-spans gate:
                           a media span between two text runs makes each run
                           an independent conversion unit
    oa_h2_md5     VARCHAR  officeAction output md5 of the second half
    oa_h_findings BIGINT   typo finding count of half1 + half2

The contract oracle SQL joins this parquet to the live `documents` view on
``doc_id AND md5(text) = in_md5`` — so it both selects the right sf's rows
(several sf corpora are frozen into one file) and FAILS LOUDLY (0 rows →
row-count mismatch) if the input corpus ever changes, instead of silently
passing a stale expectation.

Usage: python tools/freeze_convert_oracle.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "expected", "convert_expected.parquet")
DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def run_js(requests: list[dict]) -> list:
    p = subprocess.run(
        ["node", os.path.join(REPO, "tools", "js_oracle.mjs")],
        input=json.dumps(requests).encode(),
        capture_output=True,
        check=True,
    )
    return json.loads(p.stdout)


def md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def main(sf_dirs: list[str]) -> int:
    rows: dict[tuple[int, str], dict] = {}
    for sf_dir in sf_dirs:
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
        # one node invocation per sf dir: 4 reference runs per document
        reqs = []
        for _doc_id, text in docs:
            h1, h2 = text[: len(text) // 2], text[len(text) // 2 :]
            for mode, t in (
                ("officeAction", text), ("paragraph", text), ("html", text),
                ("typo", text), ("officeAction", h1), ("officeAction", h2),
                ("typo", h1), ("typo", h2),
            ):
                reqs.append({"mode": mode, "text": t})
        outs = run_js(reqs)
        for i, (doc_id, text) in enumerate(docs):
            oa, par, html, typo, oa1, oa2, ty1, ty2 = outs[8 * i : 8 * i + 8]
            n_findings = len(typo["items"]) if typo.get("hasError") else 0
            nf_halves = (len(ty1["items"]) if ty1.get("hasError") else 0) + (
                len(ty2["items"]) if ty2.get("hasError") else 0
            )
            key = (int(doc_id), md5(text))
            row = {
                "doc_id": int(doc_id),
                "in_md5": md5(text),
                "n_spans_out": 1,
                "oa_md5": md5(oa),
                "oa_n_findings": n_findings,
                "par_refs": par,
                "html_md5": md5(html),
                "html_len": len(html),
                "oa_h1_md5": md5(oa1),
                "oa_h2_md5": md5(oa2),
                "oa_h_findings": nf_halves,
            }
            if key in rows:
                assert rows[key] == row, f"conflicting expectation for {key}"
            rows[key] = row
        print(f"{sf_dir}: froze {len(docs)} docs")

    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows.values()], pa.int64()),
            "in_md5": pa.array([r["in_md5"] for r in rows.values()], pa.string()),
            "n_spans_out": pa.array([r["n_spans_out"] for r in rows.values()], pa.int64()),
            "oa_md5": pa.array([r["oa_md5"] for r in rows.values()], pa.string()),
            "oa_n_findings": pa.array([r["oa_n_findings"] for r in rows.values()], pa.int64()),
            "par_refs": pa.array([r["par_refs"] for r in rows.values()], pa.string()),
            "html_md5": pa.array([r["html_md5"] for r in rows.values()], pa.string()),
            "html_len": pa.array([r["html_len"] for r in rows.values()], pa.int64()),
            "oa_h1_md5": pa.array([r["oa_h1_md5"] for r in rows.values()], pa.string()),
            "oa_h2_md5": pa.array([r["oa_h2_md5"] for r in rows.values()], pa.string()),
            "oa_h_findings": pa.array([r["oa_h_findings"] for r in rows.values()], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {table.num_rows} rows -> {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or DEFAULT_SF_DIRS))
