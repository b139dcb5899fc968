"""Golden-file comparison (reference test layer 2, golden.go:83-120 analogue):
the parse output for a pinned 200-row slice must match the checked-in
snapshot byte-for-byte (structural compare after canonical ordering).

If this fails after an INTENTIONAL semantic change, regenerate with
``python scripts/make_golden.py`` and review the diff in the commit.
"""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))


def test_parse_output_matches_golden():
    from make_golden import GOLDEN, build

    assert os.path.exists(GOLDEN), "golden missing — run scripts/make_golden.py"
    expected = pq.read_table(GOLDEN)
    actual = build()
    assert actual.schema.equals(expected.schema), (
        f"schema drift:\n{actual.schema}\nvs golden\n{expected.schema}")
    if not actual.equals(expected):
        a, e = actual.to_pandas(), expected.to_pandas()
        for c in e.columns:
            neq = (a[c].astype(str) != e[c].astype(str))
            if neq.any():
                i = int(neq.idxmax())
                raise AssertionError(
                    f"golden mismatch in {c}[{i}]: "
                    f"got={a[c][i]!r} expected={e[c][i]!r}")
        raise AssertionError("tables differ (metadata-level)")
