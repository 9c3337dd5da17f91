"""Static gate runnable with the stdlib alone (no installable tooling in
the dev image): syntax-compile every source, import every package module
(catches import-time errors, circular imports, missing symbols at module
scope), and fail on accidental debug artifacts. CI additionally runs ruff
and mypy (.github/workflows/tests.yml) where pip is available — this is
the offline floor, mirroring the reference's clippy -D warnings gate
(/root/reference/Makefile:62-74) at the rigor the environment allows."""

from __future__ import annotations

import compileall
import importlib
import pathlib
import re
import sys


def main() -> int:
    root = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(root))
    ok = True

    # 1. syntax: compile everything (quiet=2 prints errors only)
    for target in ("infera_tpu", "tests", "bench.py", "__graft_entry__.py"):
        if not compileall.compile_dir(str(root / target), quiet=2) \
                if (root / target).is_dir() \
                else not compileall.compile_file(str(root / target), quiet=2):
            ok = False

    # 2. import every package module (forces module-level execution)
    pkg_root = root / "infera_tpu"
    for py in sorted(pkg_root.rglob("*.py")):
        rel = py.relative_to(root).with_suffix("")
        mod = ".".join(rel.parts)
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        try:
            importlib.import_module(mod)
        except Exception as e:  # noqa: BLE001 - report everything
            print(f"IMPORT FAIL {mod}: {type(e).__name__}: {e}")
            ok = False

    # 3. debug artifacts that must never ship
    bad = re.compile(r"^\s*(breakpoint\(\)|import pdb|pdb\.set_trace)")
    for py in sorted(pkg_root.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if bad.match(line):
                print(f"DEBUG ARTIFACT {py}:{i}: {line.strip()}")
                ok = False

    print("static gate:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
