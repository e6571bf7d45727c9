import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

FIXTURES = ["例文_1", "例文_2", "例文_3"]


def read_fixture(name: str) -> str:
    # newline='' : preserve the file's raw \r\n (JS readFileSync semantics)
    with open(os.path.join(FIXTURE_DIR, f"{name}.txt"), newline="", encoding="utf-8") as f:
        return f.read()


def read_golden(name: str) -> str:
    with open(os.path.join(GOLDEN_DIR, f"{name}.txt"), newline="", encoding="utf-8") as f:
        return f.read()
