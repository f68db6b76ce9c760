"""Demo: byte-level binlog value decode (the RowsLogBuffer rebuild).

Builds a table of packed ROWS_EVENT row images (null bitmap + MySQL
wire-encoded NEWDECIMAL / DATETIME2 / VARCHAR / JSONB values), decodes it
with one fused mapInArrow pass, and verifies every value against the
source truth.

    spark-submit --master 'local[8]' --py-files binlake_spark.zip \
        examples/wire_decode_demo.py
"""

import os
import sys
from decimal import Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binlake_spark.functions.binlog_decode import (  # noqa: E402
    ColumnSpec,
    decode_row_images,
    encode_row_images,
)
from binlake_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark("wire_decode_demo", cpus=8, shuffle_partitions=8)
    rng = np.random.default_rng(42)
    n = 10_000

    specs = [
        ColumnSpec("price", "newdecimal", (14, 4)),
        ColumnSpec("updated_at", "datetime2", (6,)),
        ColumnSpec("name", "varchar", (100,)),
        ColumnSpec("props", "jsonb", (2,)),
    ]
    rows = [
        {
            "price": None
            if i % 11 == 0
            else Decimal(int(rng.integers(-(10**12), 10**12))).scaleb(-4),
            "updated_at": pd.Timestamp("2015-01-01")
            + pd.Timedelta(int(rng.integers(0, 3 * 10**8)), "s"),
            "name": f"doc-{i}",
            "props": {"k": int(rng.integers(0, 1000))},
        }
        for i in range(n)
    ]
    imgs = encode_row_images(rows, specs)
    pdf = pd.DataFrame({"row_id": np.arange(n, dtype=np.int64), "row_image": imgs})
    df = spark.createDataFrame(pdf)

    out = decode_row_images(df, "row_image", specs)
    out.printSchema()
    got = {r.row_id: r for r in out.collect()}
    n_null = 0
    for i, row in enumerate(rows):
        g = got[i]
        if row["price"] is None:
            assert g.price is None
            n_null += 1
        else:
            assert g.price == row["price"], i
        assert pd.Timestamp(g.updated_at) == row["updated_at"], i
        assert g.name == row["name"], i
        assert g.props == '{"k":%d}' % row["props"]["k"], i
    print(
        f"decoded {n} row images ({n_null} with NULL-bitmap cells) — "
        "exact value match vs source ✓"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
