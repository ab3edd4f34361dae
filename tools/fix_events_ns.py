#!/usr/bin/env python3
"""Rewrite a GenScale-produced events table's ts column from plain
INT64 nanos back to parquet timestamp[ns] (Spark cannot write NANOS;
the driver's generator does). Values are reinterpreted, not converted,
so both engines see the exact timestamps the int64 encoded.

Also removes Hadoop local-FS ``.crc`` sidecars for rewritten files:
they hold checksums of the ORIGINAL bytes, and a stale sidecar makes
every later Spark read fail with ChecksumException.

Usage: python3 tools/fix_events_ns.py <events.parquet dir>
"""
import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    d = sys.argv[1]
    for f in glob.glob(f"{d}/*.parquet"):
        t = pq.read_table(f)
        i = t.schema.get_field_index("ts")
        if pa.types.is_int64(t.schema.field(i).type):
            ts = t.column(i).cast(pa.timestamp("ns"))
            t = t.set_column(i, "ts", ts)
            pq.write_table(t, f, use_deprecated_int96_timestamps=False,
                           coerce_timestamps=None)
            crc = os.path.join(os.path.dirname(f),
                               "." + os.path.basename(f) + ".crc")
            if os.path.exists(crc):
                os.remove(crc)
            print(f"rewrote {f}")


if __name__ == "__main__":
    main()
