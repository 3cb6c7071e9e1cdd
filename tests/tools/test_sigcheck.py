"""The stdlib call-signature checker must catch real TypeError-class defects
and stay silent on the shipping package (it gates `make lint` in lieu of
mypy, which this image cannot install)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO / "tools"))

from sigcheck import check_paths  # noqa: E402

DEFECTS = '''
def f(a, b, c=1):
    return a + b + c

class K:
    def __init__(self, x):
        self.x = x

    def m(self, y, *, z):
        return y

def bad():
    f(1, 2, 3, 4)
    f(1, b=2, q=3)
    f(1)
    K(1, 2)

class Sub(K):
    def go(self):
        self.m(1)
        self.m(1, z=2)
'''


def test_detects_signature_defects(tmp_path) -> None:
    mod = tmp_path / "mod.py"
    mod.write_text(DEFECTS)
    problems = check_paths([str(mod)])
    joined = "\n".join(problems)
    assert "too many positional arguments to f" in joined
    assert "unexpected keyword argument 'q'" in joined
    assert "missing required argument 'b'" in joined
    assert "too many positional arguments to K()" in joined
    assert "missing required keyword argument 'z'" in joined
    assert len(problems) == 5  # and nothing flagged on the valid lines


def test_package_is_clean() -> None:
    problems = check_paths([str(REPO / "rectools_tpu")])
    assert problems == []


def test_cli_exit_codes(tmp_path) -> None:
    ok = subprocess.run(
        [sys.executable, str(REPO / "tools" / "sigcheck.py"), str(REPO / "rectools_tpu" / "columns.py")],
        capture_output=True,
    )
    assert ok.returncode == 0
    mod = tmp_path / "mod.py"
    mod.write_text(DEFECTS)
    bad = subprocess.run(
        [sys.executable, str(REPO / "tools" / "sigcheck.py"), str(mod)], capture_output=True
    )
    assert bad.returncode == 1
