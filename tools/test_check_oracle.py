#!/usr/bin/env python3
"""Regression test for check_oracle.py's dtype-kind gate.

Round-13 shipped q183 red because the oracle's HUGEINT division came
back float64 (52.0) while Spark emitted BIGINT (52); canon's %.9g
folded both to "52" so the local gate printed OK while the driver's
hash mismatched. This pins that an int-Spark / float-oracle pair now
FAILS loudly (DTYPE line, exit 1) and that the cast fix passes.

Usage: python tools/test_check_oracle.py
"""
import json, os, subprocess, sys, tempfile
import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "check_oracle.py")

def run_case(oracle_sql: str):
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf"); os.makedirs(sf)
        out = os.path.join(tmp, "out")
        qdir = os.path.join(out, "q_dtype"); os.makedirs(qdir)
        pq.write_table(
            pa.table({"x": pa.array([52], type=pa.int64())}),
            os.path.join(qdir, "part-00000.parquet"))
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump({"q_dtype": oracle_sql}, f)
        p = subprocess.run([sys.executable, TOOL, sf, out],
                           capture_output=True, text=True)
        return p.returncode, p.stdout + p.stderr

rc, log = run_case("SELECT 52.0 AS x")
assert rc != 0, f"float oracle vs int spark must fail, got rc=0:\n{log}"
assert "DTYPE" in log, f"expected a DTYPE line:\n{log}"

rc, log = run_case("SELECT 52::BIGINT AS x")
assert rc == 0, f"matching BIGINT oracle must pass:\n{log}"
assert "OK" in log, log

print("test_check_oracle: PASS (float oracle flagged, BIGINT oracle green)")
