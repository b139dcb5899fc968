"""journald receiver analogue: journal JSON export → log records.

The reference wires the stanza journald input with a ``units`` allowlist
and two operators — copy ``body["_SYSTEMD_UNIT"]`` →
``resource["com.splunk.source"]`` and add sourcetype ``linux:journald``
(cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:123-148). The
journal's wire form (`journalctl -o json`) is one JSON object per entry:
``__REALTIME_TIMESTAMP`` is a STRING of epoch microseconds, ``PRIORITY``
a string syslog level 0-7. The batch analogue reads the export JSONL
with ``ray.data.read_json`` and decodes vectorized: µs string → ts,
PRIORITY → OTel severity via the syslog table, units filtered with one
``isin`` mask per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# syslog PRIORITY 0-7 → canonical OTel level (consistent with the apache /
# stanza-default tables in functions/severity.py: emerg→FATAL, alert→ERROR3,
# crit→ERROR2, err→ERROR, warning→WARN, notice→INFO2, info→INFO, debug→DEBUG)
PRIORITY_TEXT = np.array(
    ["FATAL", "ERROR3", "ERROR2", "ERROR", "WARN", "INFO2", "INFO", "DEBUG"],
    dtype=object)
PRIORITY_NUMBER = np.array([21, 19, 18, 17, 13, 10, 9, 5], dtype=np.int8)


def decode_journald_batch(batch: pa.Table,
                          units: "tuple[str, ...] | None" = None
                          ) -> pa.Table:
    if units is not None:
        batch = batch.filter(pc.is_in(
            batch["_SYSTEMD_UNIT"], value_set=pa.array(list(units))))
    us = batch["__REALTIME_TIMESTAMP"].cast(pa.int64())
    prio = batch["PRIORITY"].cast(pa.int8()).to_numpy(zero_copy_only=False)
    return pa.table({
        "ts": us.cast(pa.timestamp("us")),
        "body": batch["MESSAGE"],
        "host.name": batch["_HOSTNAME"],
        "com.splunk.source": batch["_SYSTEMD_UNIT"],
        "com.splunk.sourcetype": pa.array(
            np.full(batch.num_rows, "linux:journald"), type=pa.string()),
        "severity_text": pa.array(PRIORITY_TEXT[prio], type=pa.string()),
        "severity_number": pa.array(PRIORITY_NUMBER[prio], type=pa.int8()),
    })


def read_journald(paths: "list[str] | str",
                  units: "tuple[str, ...] | None" = None,
                  parallelism: int = -1) -> "ray.data.Dataset":
    import ray.data

    ds = ray.data.read_json(paths, override_num_blocks=parallelism
                            if parallelism > 0 else None)
    return ds.map_batches(lambda t: decode_journald_batch(t, units),
                          batch_format="pyarrow")
