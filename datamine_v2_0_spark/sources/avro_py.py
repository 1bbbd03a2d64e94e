"""Pure-Python Avro Object Container File (OCF) fallback IO.

The native ``spark-avro`` datasource is a separate artifact and is the
scale path (predicate-free row format, but JVM-decoded and splittable by
block). When the jar is absent — as in this container — this module
provides a self-contained encoder/decoder for the OCF format per the
public Avro 1.11 specification (https://avro.apache.org/docs/): magic
``Obj\\x01``, metadata map (``avro.schema`` JSON + ``avro.codec``),
16-byte sync marker, then blocks of ``(count, byte-size, data, sync)``
with zigzag-varint longs; ``null`` and ``deflate`` (raw zlib) codecs.

Supported logical surface: flat records of Avro primitives
(boolean/int/long/float/double/string/bytes) with nullable fields as
``["null", T]`` unions — the interchange shape telemetry/labeling
exports actually use. Nested records/arrays/maps raise with a clear
message (use the native datasource for those).

Scale shape: the WRITER emits one OCF file per input partition from the
executors (mapInPandas — no driver collect); the READER lists files,
reads the schema from one header driver-side, then decodes whole files
in parallel via mapInPandas over the file list. Whole-file decode is the
right granularity for interchange files (they are written per-partition
and bounded); the native datasource remains the choice for monolithic
multi-GB Avro. Local/shared filesystem only (executors open paths
directly), which matches local[*] and any cluster with a shared mount.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}
_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


# ---------------------------------------------------------------- varints
def _write_long(out: bytearray, n: int) -> None:
    u = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        c = buf.read(1)
        if not c:
            raise EOFError("truncated varint")
        b = c[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


# ---------------------------------------------------------------- schema
def spark_schema_to_avro(schema: T.StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        base = _SPARK_TO_AVRO.get(type(f.dataType))
        if base is None:
            raise ValueError(
                f"field '{f.name}': {f.dataType.simpleString()} is outside "
                "the flat-primitive surface of the pure-Python Avro "
                "fallback; use the native spark-avro datasource"
            )
        fields.append(
            {"name": f.name, "type": ["null", base] if f.nullable else base}
        )
    return {"type": "record", "name": name, "fields": fields}


def avro_schema_to_spark(avsc: dict) -> T.StructType:
    if avsc.get("type") != "record":
        raise ValueError("top-level Avro schema must be a record")
    out = []
    for f in avsc["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        if nullable:
            nn = [x for x in t if x != "null"]
            if len(nn) != 1:
                raise ValueError(f"field '{f['name']}': only [null, T] unions")
            t = nn[0]
        if t not in _AVRO_TO_SPARK:
            raise ValueError(f"field '{f['name']}': unsupported type {t!r}")
        out.append(f"{f['name']}: {_AVRO_TO_SPARK[t]}")
    return T.StructType.fromDDL(", ".join(out))


# ---------------------------------------------------------------- datums
def _encode_datum(out: bytearray, v, typ, nullable: bool) -> None:
    if nullable:
        if v is None or (isinstance(v, float) and v != v and typ in ("int", "long")):
            _write_long(out, 0)
            return
        _write_long(out, 1)
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out += struct.pack("<f", float(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        b = str(v).encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif typ == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    else:  # pragma: no cover - schema gate upstream
        raise ValueError(f"unsupported type {typ!r}")


def _decode_datum(buf: io.BytesIO, typ, nullable: bool):
    if nullable:
        if _read_long(buf) == 0:
            return None
    if typ == "boolean":
        return buf.read(1)[0] == 1
    if typ in ("int", "long"):
        return _read_long(buf)
    if typ == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if typ == "bytes":
        return buf.read(_read_long(buf))
    raise ValueError(f"unsupported type {typ!r}")  # pragma: no cover


def _field_plan(avsc: dict) -> list[tuple[str, str, bool]]:
    plan = []
    for f in avsc["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        if nullable:
            t = [x for x in t if x != "null"][0]
        plan.append((f["name"], t, nullable))
    return plan


# ---------------------------------------------------------------- writer
def _write_header(fh, avsc: dict, codec: str, sync: bytes) -> None:
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(avsc).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    fh.write(out)


def _write_block(fh, records: bytearray, count: int, codec: str, sync: bytes) -> None:
    data = bytes(records)
    if codec == "deflate":
        co = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = co.compress(data) + co.flush()
    head = bytearray()
    _write_long(head, count)
    _write_long(head, len(data))
    fh.write(head)
    fh.write(data)
    fh.write(sync)


def write_avro_py(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    records_per_block: int = 4096,
) -> list[tuple[str, int]]:
    """Write ``df`` as a directory of Avro OCF files, one per input
    partition, encoded on the EXECUTORS (no driver collect). Returns
    [(file, n_records), ...]. ``codec``: 'null' or 'deflate'."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    avsc = spark_schema_to_avro(df.schema)
    plan = _field_plan(avsc)
    os.makedirs(path, exist_ok=True)

    # Arrow->pandas converts a nullable int/long column WITH a null in
    # the batch to float64, silently rounding ids above 2^53 before the
    # encoder ever sees them (the same hazard heavy_hitters guards) —
    # transport those columns as strings and re-parse in the kernel,
    # which is lossless at any magnitude. NOTE: a NULL in a nullable
    # double column still arrives as NaN (indistinguishable in float64)
    # and is encoded as NaN — document-level Arrow limitation.
    from pyspark.sql import functions as F

    transport = df
    str_carried = set()
    for name, typ, nullable in plan:
        if nullable and typ in ("int", "long"):
            transport = transport.withColumn(name, F.col(name).cast("string"))
            str_carried.add(name)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        tmp = os.path.join(path, f".{os.path.basename(fname)}.tmp")
        fh = None
        sync = uuid.uuid4().bytes
        buf, in_buf, total = bytearray(), 0, 0
        for pdf in it:
            if not len(pdf):
                continue
            if fh is None:
                fh = open(tmp, "wb")
                _write_header(fh, avsc, codec, sync)
            cols = [pdf[name].tolist() for name, _, _ in plan]
            for row in zip(*cols):
                for (name, typ, nullable), v in zip(plan, row):
                    if v is not None and isinstance(v, float) and v != v and (
                        typ in ("int", "long") or name in str_carried
                    ):
                        v = None  # pandas NaN standing in for NULL
                    _encode_datum(buf, v, typ, nullable)
                in_buf += 1
                total += 1
                if in_buf >= records_per_block:
                    _write_block(fh, buf, in_buf, codec, sync)
                    buf, in_buf = bytearray(), 0
        if fh is not None:
            if in_buf:
                _write_block(fh, buf, in_buf, codec, sync)
            fh.close()
            # publish atomically so a half-written attempt is never
            # visible to the reader (which lists only *.avro). A task
            # attempt that dies BEFORE this rename leaves only a .tmp;
            # one that dies after is the normal task-retry residual risk
            # — use the native datasource's commit protocol on clusters
            # with speculative execution.
            os.rename(tmp, fname)
            yield pd.DataFrame({"file": [fname], "n_records": [total]})

    out = transport.mapInPandas(gen, "file string, n_records long").collect()
    files = [(r["file"], r["n_records"]) for r in out]
    if not files:
        # an empty DataFrame must still produce a READABLE dataset
        # (schema-bearing header, zero blocks) — the native writer does
        empty_name = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
        with open(empty_name, "wb") as fh:
            _write_header(fh, avsc, codec, uuid.uuid4().bytes)
        files = [(empty_name, 0)]
    return files


# ---------------------------------------------------------------- reader
def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """Strict read: a short read means the caller's buffer is a
    truncated prefix (e.g. the header probe in read_avro_py) — raise
    EOFError so the probe loop can extend the buffer, instead of
    surfacing as an opaque UnicodeDecodeError/JSONDecodeError on a
    half-read metadata value."""
    b = buf.read(n)
    if len(b) != n:
        raise EOFError(f"truncated read: wanted {n} bytes, got {len(b)}")
    return b


def _read_header(buf: io.BytesIO) -> tuple[dict, str, bytes]:
    if _read_exact(buf, 4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            # spec: a negative block count is followed by the block's
            # byte size (for skipping); consume it before the items
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_exact(buf, _read_long(buf)).decode()
            v = _read_exact(buf, _read_long(buf))
            meta[k] = v
    sync = _read_exact(buf, 16)
    avsc = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return avsc, codec, sync


def _decode_file(content: bytes) -> tuple[dict, list[tuple]]:
    buf = io.BytesIO(content)
    avsc, codec, sync = _read_header(buf)
    plan = _field_plan(avsc)
    rows: list[tuple] = []
    while True:
        probe = buf.read(1)
        if not probe:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        data = buf.read(size)
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        dbuf = io.BytesIO(data)
        for _ in range(count):
            rows.append(
                tuple(
                    _decode_datum(dbuf, typ, nullable)
                    for _, typ, nullable in plan
                )
            )
    return avsc, rows


def read_avro_py(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or single file) of Avro OCF files written by
    ``write_avro_py`` or any spec-compliant writer within the flat-
    primitive surface. Schema comes from one header driver-side; files
    decode in parallel (one mapInPandas task batch per file split)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        # a header whose schema JSON exceeds the initial probe would
        # truncate mid-varint — extend the buffer until the header parses
        # (EOFError) instead of failing on an arbitrary 64 KiB cap
        head = fh.read(1 << 16)
        while True:
            try:
                avsc, _, _ = _read_header(io.BytesIO(head))
                break
            except EOFError:
                more = fh.read(1 << 20)
                if not more:
                    raise
                head += more
    schema = avro_schema_to_spark(avsc)
    plan = _field_plan(avsc)
    names = [n for n, _, _ in plan]

    flist = spark.createDataFrame([(f,) for f in files], "path string")

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    _, rows = _decode_file(fh.read())
                if not rows:
                    continue
                # typed nullable columns, NOT an object frame: pandas
                # object ints with a None go through float64 on the
                # Arrow boundary and round ids above 2^53
                cols = list(zip(*rows))
                data = {}
                for (name, typ, _n), vals in zip(plan, cols):
                    if typ in ("int", "long"):
                        data[name] = pd.array(vals, dtype="Int64")
                    elif typ == "boolean":
                        data[name] = pd.array(vals, dtype="boolean")
                    else:
                        data[name] = pd.Series(vals, dtype="object")
                yield pd.DataFrame(data)

    return flist.repartition(min(len(files), 32)).mapInPandas(
        decode, schema=schema
    )
