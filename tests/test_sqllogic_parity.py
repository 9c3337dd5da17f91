"""Run the parity sqllogictest suite (tests/sqllogic/*.test).

These files replay every assertion of the reference's SQL test suite
(/root/reference/test/sql — SURVEY.md §4 tier 2) against the TPU engine,
including exact error strings and result renderings.
"""

import glob
import os

import pytest

from infera_tpu.sql import Connection
from infera_tpu.testing.sqllogic import SqlLogicRunner

SUITE_DIR = os.path.join(os.path.dirname(__file__), "sqllogic")
FILES = sorted(glob.glob(os.path.join(SUITE_DIR, "*.test")))


@pytest.mark.parametrize("mesh", [None, 8], ids=["single", "mesh8"])
@pytest.mark.parametrize("path", FILES, ids=[os.path.basename(f) for f in FILES])
def test_sqllogic_file(path, mesh, model_dir, clean_registry, isolated_cache,
                       tmp_path):
    conn = Connection()
    conn.set_mesh(mesh)  # mesh8: partitioned execution must keep parity
    runner = SqlLogicRunner(conn, substitutions={"MODELS": model_dir,
                                                 "TMP": str(tmp_path)})
    result = runner.run_file(path)
    if not result.passed:
        msgs = []
        for rec in result.failures():
            msgs.append(f"line {rec.line + 1}: {rec.sql}\n  {rec.message}")
        pytest.fail(
            f"{os.path.basename(path)}: {len(result.failures())} of "
            f"{len(result.records)} records failed\n" + "\n".join(msgs)
        )
    assert result.n_passed == len(result.records)
