"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource``): the
engine's template for sources Spark has no built-in reader for
(proprietary APIs, manifest-driven feeds, synthetic generators).

The example source is a deterministic sequence generator: it declares a
schema, plans N input partitions (each generates its own [start, end)
slice — reads parallelize across executors exactly like file splits),
and yields plain tuples that Spark Arrow-batches back. Values are
rational functions of the row id, so a SQL oracle over
``generate_series`` reproduces them bit-for-bit.

This is the V2-DataSource analog of the reference's programmatic source
injection (``WriteToSourceFile``, CSVProvider.cs:702-717): data that
originates outside the filesystem still enters the engine through a
declarative, partition-parallel scan — never a driver-side collect.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class SequenceDataSource(DataSource):
    """``spark.read.format("seqgen").option("n", ...).option("parts", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "id bigint, bucket bigint, x double"

    def reader(self, schema) -> "SequenceReader":
        return SequenceReader(self.options)


class SequenceReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        step = -(-self.n // self.parts)  # ceil
        return [
            _Slice(i * step, min(self.n, (i + 1) * step))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            # rational in i → bit-identical in any engine
            yield i, i % 7, ((i * 31) % 997) / 997.0


def register(spark) -> None:
    """Idempotent format registration."""
    spark.dataSource.register(SequenceDataSource)


from pyspark.sql.datasource import SimpleDataSourceStreamReader  # noqa: E402


class SequenceStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming read over the same synthetic sequence:
    each micro-batch advances ``pos`` by ``batch`` rows; the engine's
    checkpoint persists the committed offset, so restarts resume at the
    exact row where the previous run stopped — the custom-source half
    of the exactly-once contract (q_stream_exactly_once proves the
    file-source half)."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100))
        self.batch = int(options.get("batch", 40))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        s = start["pos"]
        e = min(self.n, s + self.batch)
        return iter(
            [(i, i % 7, ((i * 31) % 997) / 997.0) for i in range(s, e)]
        ), {"pos": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                (i, i % 7, ((i * 31) % 997) / 997.0)
                for i in range(start["pos"], end["pos"])
            ]
        )


class SequenceStreamDataSource(DataSource):
    """``spark.readStream.format("seqstream")`` — batch twin above."""

    @classmethod
    def name(cls) -> str:
        return "seqstream"

    def schema(self) -> str:
        return "id bigint, bucket bigint, x double"

    def simpleStreamReader(self, schema) -> SequenceStreamReader:
        return SequenceStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SequenceStreamDataSource)


from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _PartFile(WriterCommitMessage):
    path: str
    count: int


class ManifestCsvWriter(DataSourceWriter):
    """Distributed write with a driver-side atomic commit: each task
    serializes its partition to ``part-<uuid>.csv`` (reference CSV
    dialect: ; delimiter, quoted values, NULL sentinel) and returns a
    commit message; only ``commit`` — which runs once, after every task
    succeeded — publishes the manifest listing the part files and their
    row counts. Readers that resolve files through the manifest never
    see a partial write: the task files are invisible until the single
    manifest rename. ``abort`` leaves no manifest, so a failed job is
    indistinguishable from no job — the same two-phase contract as
    Spark's file commit protocol, expressed in the Python writer API."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("seqsink requires option('path', ...)")

    def write(self, iterator) -> _PartFile:
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.csv")

        def cell(v) -> str:
            if v is None:
                return "NULL"  # unquoted sentinel (CSVDestinationWriter.cs:129-131)
            s = str(v).replace('"', '""')
            return f'"{s}"'

        n = 0
        with open(part, "w", newline="\n", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(";".join(cell(v) for v in row) + "\n")
                n += 1
        return _PartFile(path=part, count=n)

    def commit(self, messages) -> None:
        import json
        import os

        manifest = {
            "parts": [
                {"path": os.path.basename(m.path), "count": m.count}
                for m in messages
            ],
            "total": sum(m.count for m in messages),
        }
        tmp = os.path.join(self.path, "_manifest.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh, sort_keys=True)
        os.replace(tmp, os.path.join(self.path, "_manifest.json"))

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class ManifestCsvDataSource(DataSource):
    """``df.write.format("seqsink").option("path", ...)``"""

    @classmethod
    def name(cls) -> str:
        return "seqsink"

    def writer(self, schema, overwrite: bool) -> ManifestCsvWriter:
        return ManifestCsvWriter(self.options)


def register_sink(spark) -> None:
    spark.dataSource.register(ManifestCsvDataSource)
