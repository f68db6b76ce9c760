"""GTID set semantics — behavioural parity with the reference.

A GTID set is ``uuid:lo-hi[:lo-hi…][,uuid2:…]`` — per server-uuid, a list
of closed intervals with adjacent/overlapping intervals merged
(GTID.java:13-66, parse :97-111, ClosedInterval.merge :136-142).  Set
containment answers "has this server already executed that position?"
(GTIDUtils.compare, GTIDUtils.java:73-94) — the reference uses it to pick
the newer checkpoint during failover (ZkLeaderSelector.usingGTID:343-350).

In the rebuild the checkpoint role is played by the LakeTable snapshot,
but the same set algebra powers (a) bootstrap assertions (our applied set
must contain the resume position's set) and (b) the distributed
interval-set aggregation :func:`gtid_islands` (gaps-and-islands over the
applied gno per server — one shuffle, no UDF).

Pure-Python semantics implemented from the published string format; not a
code port.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


class GTIDSet:
    """Per-uuid merged closed intervals over transaction numbers."""

    def __init__(self, intervals: dict[str, list[tuple[int, int]]] | None = None):
        self.intervals: dict[str, list[tuple[int, int]]] = {}
        for sid, ivs in (intervals or {}).items():
            self.intervals[sid.strip()] = _normalize(ivs)

    # -- construction ---------------------------------------------------- #
    @classmethod
    def parse(cls, text: str) -> "GTIDSet":
        out: dict[str, list[tuple[int, int]]] = {}
        if not text or not text.strip():
            return cls()
        for part in text.split(","):
            fields = part.split(":")
            sid = fields[0].strip()
            ivs = out.setdefault(sid, [])
            for rng in fields[1:]:
                bits = rng.split("-")
                lo = int(bits[0])
                hi = int(bits[1]) if len(bits) == 2 else lo
                ivs.append((lo, hi))
        return cls(out)

    def add(self, sid: str, gno: int) -> None:
        ivs = self.intervals.setdefault(sid.strip(), [])
        ivs.append((gno, gno))
        self.intervals[sid] = _normalize(ivs)

    def union(self, other: "GTIDSet") -> "GTIDSet":
        merged = {sid: list(ivs) for sid, ivs in self.intervals.items()}
        for sid, ivs in other.intervals.items():
            merged.setdefault(sid, []).extend(ivs)
        return GTIDSet(merged)

    # -- predicates ------------------------------------------------------ #
    def contains(self, other: "GTIDSet") -> bool:
        """True iff every interval of ``other`` lies inside one of ours —
        the reference's ``GTIDUtils.compare(src, dst)`` contract."""
        for sid, dst_ivs in other.intervals.items():
            src_ivs = self.intervals.get(sid)
            if src_ivs is None:
                return False
            for lo, hi in dst_ivs:
                if not any(slo <= lo and hi <= shi for slo, shi in src_ivs):
                    return False
        return True

    def __str__(self) -> str:
        parts = []
        for sid in sorted(self.intervals):
            rngs = ":".join(
                f"{lo}-{hi}" if lo != hi else str(lo)
                for lo, hi in self.intervals[sid]
            )
            parts.append(f"{sid}:{rngs}")
        return ",".join(parts)

    def __eq__(self, other) -> bool:
        return isinstance(other, GTIDSet) and self.intervals == other.intervals


def _normalize(ivs: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent closed intervals."""
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ivs):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def gtid_islands(
    df: DataFrame, sid_col: str = "server_uuid", gno_col: str = "gno"
) -> DataFrame:
    """Distributed GTID-set construction: collapse each server's executed
    gno set into closed intervals (one window + one groupBy, no UDF).

    Returns (server_uuid, lo, hi) rows — the DataFrame form of
    :class:`GTIDSet`, aggregatable at any scale.
    """
    w = W.partitionBy(sid_col).orderBy(gno_col)
    grp = (F.col(gno_col) - F.row_number().over(w)).alias("_grp")
    return (
        df.select(sid_col, gno_col)
        .distinct()
        .select(sid_col, gno_col, grp)
        .groupBy(sid_col, "_grp")
        .agg(F.min(gno_col).alias("lo"), F.max(gno_col).alias("hi"))
        .drop("_grp")
    )


def gtid_set_of(df: DataFrame, sid_col: str = "server_uuid", gno_col: str = "gno") -> GTIDSet:
    """Collect a (small) islands result into a GTIDSet value."""
    rows = gtid_islands(df, sid_col, gno_col).collect()
    out: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        out.setdefault(r[sid_col], []).append((r["lo"], r["hi"]))
    return GTIDSet(out)


class PositionNotInLog(RuntimeError):
    """A resume position is not contained in the source log's GTID set."""


def assert_position_covered(
    source: DataFrame,
    position: GTIDSet,
    sid_col: str = "server_uuid",
    gno_col: str = "gno",
) -> GTIDSet:
    """Fail fast when a resume position is outside the log — the
    reference's bootstrap containment check (GTIDTracker.java:30-51:
    refuse to dump from a GTID the server no longer has).  Returns the
    source's set so callers can reuse it."""
    src = gtid_set_of(source, sid_col, gno_col)
    if not src.contains(position):
        raise PositionNotInLog(
            f"resume position {{{position}}} is not contained in the "
            f"source log's executed set {{{src}}} — the log has been "
            "purged past the checkpoint or the checkpoint is foreign"
        )
    return src
