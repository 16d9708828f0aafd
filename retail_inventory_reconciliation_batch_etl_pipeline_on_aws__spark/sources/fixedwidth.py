"""Fixed-width text source via Spark 4's Python DataSource API.

Fixed-width layouts (COBOL copybooks, bank/POS settlement files,
mainframe extracts) are the one legacy ETL interchange format Spark has
no native reader for -- the reference's retail domain is exactly where
they still appear. This implements one as a REGISTERED custom data
source, exercising the full DataSource V2-for-Python machinery: schema
declaration, one InputPartition per file (parallelism = file count,
the same unit a text scan uses), and a per-partition reader that
slices + types each record.

Usage::

    spark.dataSource.register(FixedWidthDataSource)
    df = (spark.read.format("fixedwidth")
          .option("path", "/data/settle/*.dat")
          .option("layout", "sku:0:8:string,qty:8:5:int,amount:13:9:decimal(7,2)")
          .load())

Layout grammar: ``name:start:width:type`` comma-separated, 0-based
byte offsets, types = string|int|long|double|decimal(p,s)|date
(ISO yyyy-MM-dd). Values are stripped; blank -> NULL. Records shorter
than a field's window yield NULL for that field (ragged tail), records
longer are allowed (trailing filler) -- both standard copybook
behaviors. Python-side parsing is the slow path by house rules, but a
custom source IS the sanctioned boundary: there is no JVM operator to
stay inside, and the reader is partition-parallel (one task per file).
"""

from __future__ import annotations

import datetime as dt
import decimal
import glob as _glob
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


def parse_layout(layout: str) -> list[tuple[str, int, int, str]]:
    """``name:start:width:type`` fields -> [(name, start, width, type)].
    Validates overlaps are allowed (aliased views of the same bytes are
    legal in copybooks) but widths/starts must be non-negative ints."""
    import re

    fields = []
    # split on commas NOT inside a type's parentheses (decimal(7,2))
    for part in re.split(r",(?![^()]*\))", layout):
        bits = part.strip().split(":")
        if len(bits) != 4:
            raise ValueError(f"bad layout field {part!r}: want name:start:width:type")
        name, start, width, typ = bits
        start_i, width_i = int(start), int(width)
        if start_i < 0 or width_i <= 0:
            raise ValueError(f"bad offsets in {part!r}")
        fields.append((name, start_i, width_i, typ))
    return fields


def _spark_type(typ: str) -> T.DataType:
    if typ.startswith("decimal"):
        p, s = typ[len("decimal(") : -1].split(",")
        return T.DecimalType(int(p), int(s))
    return {
        "string": T.StringType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
    }[typ]


def _convert(raw: str, typ: str):
    v = raw.strip()
    if not v:
        return None
    if typ == "string":
        return v
    if typ == "int":
        return int(v)
    if typ == "long":
        return int(v)
    if typ == "double":
        return float(v)
    if typ.startswith("decimal"):
        return decimal.Decimal(v)
    if typ == "date":
        return dt.date.fromisoformat(v)
    raise ValueError(f"unsupported type {typ!r}")


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FixedWidthReader(DataSourceReader):
    def __init__(self, options: dict):
        self._paths = sorted(_glob.glob(options["path"]))
        if not self._paths and os.path.exists(options["path"]):
            self._paths = [options["path"]]
        self._fields = parse_layout(options["layout"])

    def partitions(self):
        # one task per file -- the text-scan parallelism unit; a missing
        # glob yields zero partitions (empty frame), matching file sources
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as f:
            for line in f:
                rec = line.rstrip("\n")
                yield tuple(
                    _convert(rec[start : start + width], typ)
                    if start < len(rec)
                    else None
                    for (_n, start, width, typ) in self._fields
                )


class FixedWidthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fixedwidth"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(n, _spark_type(t))
                for (n, _s, _w, t) in parse_layout(self.options["layout"])
            ]
        )

    def reader(self, schema: T.StructType) -> "FixedWidthReader":
        return FixedWidthReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> "FixedWidthWriter":
        return FixedWidthWriter(self.options, schema)

    def simpleStreamReader(self, schema: T.StructType) -> "FixedWidthStreamReader":
        return FixedWidthStreamReader(self.options)


def _render(v, typ: str, width: int) -> str:
    """One field -> exactly ``width`` chars: strings left-justified,
    numerics right-justified (copybook convention), NULL -> blanks.
    Overflow raises -- silently truncating an amount is data loss."""
    if v is None:
        return " " * width
    if typ == "string":
        s = str(v)
        just = s.ljust(width)
    else:
        s = str(v)
        just = s.rjust(width)
    if len(just) > width:
        raise ValueError(f"value {s!r} wider than field width {width}")
    return just


class _Committed(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class FixedWidthWriter(DataSourceWriter):
    """Partition-parallel fixed-width export (the OUTBOUND interface
    file: settlement submissions, vendor EDI): each task writes a
    ``part-<uuid>.dat`` into a staging dir; ``commit`` moves the parts
    into place and ``abort`` removes the staging dir -- the standard
    task-commit protocol, expressed through the Python DataSource
    writer hooks, so a failed job leaves no partial interface file."""

    def __init__(self, options: dict, schema):
        self._dir = options["path"]
        self._fields = parse_layout(options["layout"])
        self._names = [f.name for f in schema.fields]

    def write(self, iterator):
        import uuid

        staging = os.path.join(self._dir, "_staging")
        os.makedirs(staging, exist_ok=True)
        out = os.path.join(staging, f"part-{uuid.uuid4().hex}.dat")
        n = 0
        with open(out, "w", encoding="utf-8") as f:
            for row in iterator:
                rec = [" "] * max(s + w for (_n2, s, w, _t) in self._fields)
                for name, start, width, typ in self._fields:
                    cell = _render(row[self._names.index(name)], typ, width)
                    rec[start : start + width] = cell
                f.write("".join(rec) + "\n")
                n += 1
        return _Committed(out, n)

    def commit(self, messages):
        for m in messages:
            final = os.path.join(self._dir, os.path.basename(m.path))
            os.replace(m.path, final)
        staging = os.path.join(self._dir, "_staging")
        if os.path.isdir(staging) and not os.listdir(staging):
            os.rmdir(staging)

    def abort(self, messages):
        import shutil

        staging = os.path.join(self._dir, "_staging")
        shutil.rmtree(staging, ignore_errors=True)


class FixedWidthStreamReader(SimpleDataSourceStreamReader):
    """Streaming tail of a growing fixed-width interface file drop
    (settlement files appended through the day): offsets are the sorted
    file list + per-file byte position, so each micro-batch reads only
    NEW complete lines, and ``readBetweenOffsets`` replays any
    committed range deterministically -- the exactly-once replay
    contract, from file positions alone (no state beyond the offset
    JSON the engine checkpoints)."""

    def __init__(self, options: dict):
        self._glob = options["path"]
        self._fields = parse_layout(options["layout"])

    def initialOffset(self) -> dict:
        return {"pos": {}}

    def _read_range(self, start: dict, end: dict):
        for path, upto in sorted(end["pos"].items()):
            begin = start["pos"].get(path, 0)
            if upto <= begin or not os.path.exists(path):
                continue
            with open(path, encoding="utf-8") as f:
                f.seek(begin)
                chunk = f.read(upto - begin)
            for line in chunk.splitlines():
                rec = line.rstrip("\n")
                yield tuple(
                    _convert(rec[s : s + w], t) if s < len(rec) else None
                    for (_n, s, w, t) in self._fields
                )

    def read(self, start: dict):
        # advance each file's offset to its last complete line
        pos = dict(start["pos"])
        for path in sorted(_glob.glob(self._glob)):
            size = os.path.getsize(path)
            begin = pos.get(path, 0)
            if size <= begin:
                continue
            with open(path, encoding="utf-8") as f:
                f.seek(begin)
                chunk = f.read(size - begin)
            complete = chunk.rfind("\n") + 1  # only full lines this batch
            pos[path] = begin + complete
        end = {"pos": pos}
        # a materialized list ITERATOR, not a generator: the engine
        # prefetch-caches the result, next()s it, and copy.copy()s it
        # per consumer -- generators are neither; list_iterator is
        # both. Batches are bounded by what arrived since the last
        # trigger, so materializing is the intended memory model for a
        # Simple stream reader.
        return iter(list(self._read_range(start, end))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._read_range(start, end)))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; nothing to GC
