"""Replay the reference's ORIGINAL sqllogictest files against this engine.

/root/reference/test/sql/*.test are the reference's own parity bar
(SURVEY.md §4 tier 2). This runs them verbatim, with only path remapping:
the DuckDB-extension `load` line is a no-op here, and 'test/models/...'
paths point at our synthesized equivalents of the committed ONNX fixtures.
Network-dependent files are skipped. Skips entirely when the reference tree
isn't mounted.
"""

import os

import pytest

from infera_tpu.sql import Connection
from infera_tpu.testing.sqllogic import SqlLogicRunner

REF_SQL_DIR = "/root/reference/test/sql"

SKIP_FILES = {
    # downloads real remote models from GitHub/HuggingFace (network tier)
    "test_advanced_features.test",
}

if os.path.isdir(REF_SQL_DIR):
    FILES = sorted(
        f for f in os.listdir(REF_SQL_DIR)
        if (f.endswith(".test") or f.endswith(".slt")) and f not in SKIP_FILES
    )
else:
    FILES = []


@pytest.mark.skipif(not FILES, reason="reference tree not mounted")
@pytest.mark.parametrize("mesh", [None, 8], ids=["single", "mesh8"])
@pytest.mark.parametrize("fname", FILES)
def test_reference_file(fname, mesh, model_dir, clean_registry, isolated_cache):
    with open(os.path.join(REF_SQL_DIR, fname)) as f:
        text = f.read()
    # remap fixture-model paths to the synthesized models
    text = text.replace("test/models", model_dir)
    conn = Connection()
    conn.set_mesh(mesh)  # mesh8: partitioned execution must keep parity
    runner = SqlLogicRunner(conn)
    result = runner.run_text(text, fname)
    if not result.passed:
        msgs = [
            f"line {r.line + 1}: {r.sql}\n  {r.message}" for r in result.failures()
        ]
        pytest.fail(
            f"{fname}: {len(result.failures())} of {len(result.records)} "
            "records failed\n" + "\n".join(msgs)
        )
