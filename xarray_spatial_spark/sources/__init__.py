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


def parquet_first_array_len(path: str, column: str) -> int:
    """Element count of ``column`` (an array column) in the first row
    of a parquet file/directory, read driver-side with pyarrow — the
    no-job way to learn a fixed embedding dimension before building a
    query."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    else:
        files = [path]
    for f in files:
        pf = pq.ParquetFile(f)
        if pf.metadata.num_rows == 0:
            continue
        # one row, not the whole first row group
        batch = next(pf.iter_batches(batch_size=1, columns=[column]))
        return len(batch.column(0)[0])
    raise ValueError(f"no rows in {path}")
