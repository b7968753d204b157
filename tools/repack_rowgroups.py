#!/usr/bin/env python3
"""Repack a fixture SF dir's parquet files into >= 32 row groups per table.

Round-19 scaling fix (VERDICT r18 item 3): the generated fixtures carried
ONE row group per file, so every Spark scan was a single task and the
8-core bench beat the 32-core one — no per-query parallelism was
measurable at any SF. This rewrites each file VALUE-IDENTICALLY
(pyarrow read -> write with row_group_size = max(ceil(rows/64), 32);
schema and table equality asserted before the original is replaced) so
byte-range splits land on real row-group boundaries. DuckDB reads
multi-row-group files identically; the oracle is unaffected.

Usage: python3 tools/repack_rowgroups.py /root/testdata/sf0.1
"""
import glob
import math
import os
import sys

import pyarrow.parquet as pq


def repack(sfdir: str) -> None:
    for path in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
        t = pq.read_table(path)
        rg = max(math.ceil(t.num_rows / 64), 32)
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=rg, compression="snappy",
                       version="2.6")
        back = pq.read_table(tmp)
        assert back.schema.equals(t.schema, check_metadata=False), path
        assert back.equals(t), path
        os.chmod(tmp, 0o644)
        os.replace(tmp, path)
        f = pq.ParquetFile(path)
        print(f"{os.path.basename(path):22s} rows={t.num_rows:7d} "
              f"rgs={f.metadata.num_row_groups:3d} "
              f"bytes={os.path.getsize(path)}")


if __name__ == "__main__":
    repack(sys.argv[1])
