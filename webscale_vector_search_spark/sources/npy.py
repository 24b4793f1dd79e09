"""S1/S2 — `.npy` vector-corpus ingestion.

Reference: `np.load(vectors_path).astype(np.float32)` eagerly in driver RAM
(vector_search_cluster.py:995), or mmap + 100k-row batches (1164-1188).

Spark-native: `binaryFile` source (one row per file, content read inside the
task, never on the driver) + a mapInPandas decoder that parses the npy
header and yields Arrow batches of (row_in_file, vec). Stable ids come from
file ordering: files sorted by path get cumulative base offsets, so
vec_id = base[path] + row_in_file is deterministic and restart-safe.

Scale posture: .npy is an INGEST format here — the first job converts to
partitioned Parquet (the index build input); nothing downstream re-reads npy.
A multi-TB corpus arrives as many .npy files (one per producer shard), which
this reader parallelizes file-per-task; monolithic single-file corpora are
driver-listed but still decoded executor-side.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


_HEADER_PEEK = 64 * 1024  # covers any realistic header (v1 caps at 65535 B)


def _npy_row_count(header_bytes: bytes) -> int:
    """Parse the row count from an npy header prefix (no data read).

    Dispatches on the format version from the magic bytes — plain 1.0 files
    have ~70 B headers, but numpy writes 2.0/3.0 when the header dict grows
    (structured dtypes, very long shapes), and those frame the length as
    4 bytes instead of 2.
    """
    import numpy.lib.format as npf

    buf = io.BytesIO(header_bytes)
    major, _minor = npf.read_magic(buf)
    reader = {
        1: npf.read_array_header_1_0,
        2: npf.read_array_header_2_0,
        3: getattr(npf, "read_array_header_2_0", None),  # 3.0 frames like 2.0
    }.get(major)
    if reader is None:
        raise ValueError(f"unsupported .npy format version {major}")
    shape, _, _ = reader(buf)
    return shape[0] if shape else 1


def read_npy(spark: SparkSession, path: str, vec_col: str = "embedding") -> DataFrame:
    """Read one or many .npy files into (vec_id BIGINT, embedding ARRAY<FLOAT>).

    Ids are assigned by (file path order, row order) — explicit and stable,
    unlike the reference's implicit FAISS positional ids (SURVEY.md §1.1).
    """
    import numpy as np

    files = spark.read.format("binaryFile").load(path)
    # pass 1 (tiny): header-only row counts -> cumulative base offset per file
    heads = (
        files.select("path", F.substring("content", 1, _HEADER_PEEK).alias("head"))
        .orderBy("path")
        .collect()
    )
    bases: dict[str, int] = {}
    acc = 0
    for r in heads:
        bases[r["path"]] = acc
        acc += _npy_row_count(bytes(r["head"]))

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField(vec_col, T.ArrayType(T.FloatType())),
        ]
    )
    bases_bc = spark.sparkContext.broadcast(bases)

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                arr = np.load(io.BytesIO(bytes(content))).astype(np.float32)
                if arr.ndim == 1:
                    arr = arr.reshape(1, -1)
                base = bases_bc.value[path]
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(base, base + len(arr), dtype=np.int64),
                        vec_col: list(arr),
                    }
                )

    return files.select("path", "content").mapInPandas(decode, schema)
