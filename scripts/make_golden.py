"""(Re)generate the golden parse fixture — run ONLY when parse semantics
change intentionally; the golden test pins them otherwise.

The reference pins component behavior with expected-telemetry golden files
compared structurally (tests/testutils/golden.go:83-120, fixture pairs like
tests/receivers/lightprometheus/testdata/httpd_basic_auth_expected.yaml).
Our analogue: a checked-in Parquet snapshot of the parse output for a fixed
200-row slice of the sf0.001 corpus.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from splunk_otel_collector_ray import corpus  # noqa: E402
from splunk_otel_collector_ray.stages.parse import ParseStage  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "golden", "parse_golden.parquet")


def build() -> pa.Table:
    src = corpus.build_transcripts("sf0.001").slice(0, 200)
    out = ParseStage()(src)
    # attributes map → deterministic "k=v,k=v" string (stable comparison)
    attrs = [",".join(f"{k}={v}" for k, v in sorted(row))
             for row in out.column("attributes").to_pylist()]
    out = out.drop_columns(["attributes"]).append_column(
        "attributes_flat", pa.array(attrs, type=pa.string()))
    return out


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pq.write_table(build(), GOLDEN)
    print(f"wrote {GOLDEN}")
