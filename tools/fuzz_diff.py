"""Randomized differential fuzzer: Python engine vs reference JS (node).

Generates seeded synthetic JPO office-action-ish documents (FIXTURES.md §1
ingredient table) and compares every mode's output byte-for-byte.

Usage: python tools/fuzz_diff.py [n_docs] [seed]
"""

from __future__ import annotations

import json
import random
import subprocess
import sys

sys.path.insert(0, ".")

from patent_decision_document_converter_spark.plans.registry import MODES, convert_text
from patent_decision_document_converter_spark.sources.generator import make_document_text


def run_js(requests: list[dict]) -> list:
    p = subprocess.run(
        ["node", "tools/js_oracle.mjs"],
        input=json.dumps(requests).encode(),
        capture_output=True,
        check=True,
    )
    return json.loads(p.stdout)


def main(n_docs: int = 25, seed: int = 42) -> int:
    rng = random.Random(seed)
    texts = [make_document_text(rng) for _ in range(n_docs)]

    requests = [{"mode": m, "text": t} for t in texts for m in MODES]
    expected = run_js(requests)

    bad = 0
    for (req, exp) in zip(requests, expected):
        got = convert_text(req["text"], req["mode"])
        if got != exp:
            bad += 1
            i = next(
                (i for i, (a, b) in enumerate(zip(got, exp)) if a != b),
                min(len(got), len(exp)),
            )
            print(f"MISMATCH mode={req['mode']} at char {i}")
            print("  input:", repr(req["text"][:160]))
            print("  py   :", repr(got[max(0, i - 30):i + 40]))
            print("  js   :", repr(exp[max(0, i - 30):i + 40]))
            if bad > 5:
                break
    total = len(requests)
    print(f"{total - bad}/{total} outputs byte-match the reference")
    return 1 if bad else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    raise SystemExit(main(n, s))
