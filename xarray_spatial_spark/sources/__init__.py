"""Source helpers shared across the sources/ package."""

from __future__ import annotations

import glob
import os


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from the FOOTERS,
    read driver-side with pyarrow — no Spark job.  The cheap path for
    operators that only need a size (banding plans, raster shapes)
    before building their real query."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    return sum(pq.read_metadata(f).num_rows for f in files)