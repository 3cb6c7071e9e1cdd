"""Freeze the parity-case payloads computed by the REFERENCE RecTools.

Run from the repo root (CPU-only; the reference is pure python + the numpy
implicit stub):

    env -u PALLAS_AXON_POOL_IPS python -m tests.frozen.record

Writes tests/frozen/fixtures.json. `test_frozen.py` then recomputes every
case with rectools_tpu and compares against these frozen values WITHOUT
importing the reference — so the coverage survives reference/pandas drift
(the reference pins literal fixtures the same way: tests/models/data.py:20-41
there). Re-record only when a case definition changes, and review the diff.
"""

import json
import sys
import traceback
from pathlib import Path

from tests.frozen.cases import RefEnv, build_cases

FIXTURES = Path(__file__).parent / "fixtures.json"


def main() -> int:
    env = RefEnv()
    payloads = {}
    failures = {}
    for name, case in sorted(build_cases().items()):
        try:
            payloads[name] = case(env)
            print(f"recorded {name}")
        except Exception:
            failures[name] = traceback.format_exc(limit=4)
            print(f"FAILED   {name}")
    if failures:
        for name, tb in failures.items():
            print(f"\n=== {name} ===\n{tb}")
        return 1
    FIXTURES.write_text(json.dumps({"source": "reference@/root/reference", "cases": payloads}, indent=1))
    print(f"\nwrote {FIXTURES} ({FIXTURES.stat().st_size / 1024:.0f} KiB, {len(payloads)} cases)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
