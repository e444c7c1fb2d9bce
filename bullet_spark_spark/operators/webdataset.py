"""WebDataset-style tar shards — the multimodal training-data layout.

Large multimodal training sets ship as TAR SHARDS of grouped members
(`{key}.txt`, `{key}.json`, `{key}.jpg`, …) read sequentially — the
WebDataset convention (Breuel et al., public; the layout behind LAION
and most open image-text corpora). A Spark-native pipeline needs both
directions: compose shards for export to trainers, and parse shards
back into (key, modality columns) rows for curation. The reference has
no ingest-format surface at all (records reach it pre-deserialized,
MockDeserializer.scala); this module extends the engine's format stage
the same way operators/warc.py does for Common Crawl.

- ``tar_member_col``: one POSIX ustar member (512-byte header +
  NUL-padded payload blocks) as a BINARY column — pure codegen:
  octal fields via ``conv``/``lpad``, and the header CHECKSUM as an
  ``aggregate(split(header), ascii)`` fold, so composition never
  leaves the JVM. Member names must be ASCII (keys are ids here;
  non-ASCII names would need the pax extension this stage doesn't
  claim).
- ``pack_tar``: per-group member concatenation + the two zero blocks
  of end-of-archive — one shard blob per group (the pack_warc shape).
- ``parse_tar``: a REAL streaming ustar parser over binary blobs
  (``mapInPandas``, Arrow-batched): walks 512-byte blocks, reads octal
  sizes, VERIFIES the header checksum, skips non-regular members,
  stops at the zero block, and dead-letters malformed tails as rows
  with ``tar_error`` set instead of poisoning the task.
- ``wds_samples``: member rows → one row per sample key with one
  binary column per requested extension (the WebDataset grouping
  ``{key}.{ext}``).

Scale shape: composition is whole-stage codegen; packing is one
group-sized aggregate (shard sizing = group keying, the caller bounds
it like real shards at ~1 GB); parsing is embarrassingly parallel per
blob; sample grouping is one combinable max-per-ext aggregate on the
key. Round-trip parity with Python's stdlib ``tarfile`` is pinned in
tests (both directions), so the bytes interoperate with every tar
consumer, not just this parser.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUL = "\x00"
_BLOCK = 512


def _octal(n: Column, width: int) -> Column:
    """``width`` octal digits + NUL — the ustar numeric field form."""
    return F.concat(
        F.lpad(F.conv(n.cast("string"), 10, 8), width, "0"), F.lit(_NUL)
    )


def tar_member_col(name: Column, payload: Column) -> Column:
    """POSIX ustar member bytes from (ASCII name, payload-string)
    columns: 512-byte header (magic ``ustar\\0``, mode 0644, checksum
    over the header with the checksum field as spaces — the spec rule)
    + payload NUL-padded to whole 512-byte blocks. Pure codegen; the
    checksum is an ``aggregate``/``ascii`` fold over the header chars
    (all ASCII/NUL by construction, so char sum == byte sum)."""
    size = F.length(F.encode(payload, "UTF-8"))
    # rpad would TRUNCATE a >100-char name to a plausible-looking member
    # with a valid checksum — fail loudly instead (ustar long names need
    # the pax extension this stage doesn't claim)
    name = F.when(
        F.length(name) <= 100, name
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("tar member name exceeds ustar 100 bytes: "), name)
        )
    )
    pre = F.concat(
        F.rpad(name, 100, _NUL),                       # name
        F.lit("0000644" + _NUL),                       # mode
        F.lit("0000000" + _NUL),                       # uid
        F.lit("0000000" + _NUL),                       # gid
        _octal(size, 11),                              # size
        F.lit("00000000000" + _NUL),                   # mtime
    )
    post = F.concat(
        F.lit("0"),                                    # typeflag: regular
        F.lit(_NUL * 100),                             # linkname
        F.lit("ustar" + _NUL + "00"),                  # magic + version
        F.lit(_NUL * 32),                              # uname
        F.lit(_NUL * 32),                              # gname
        F.lit(_NUL * 8),                               # devmajor
        F.lit(_NUL * 8),                               # devminor
        F.lit(_NUL * 155),                             # prefix
        F.lit(_NUL * 12),                              # block pad
    )
    with_spaces = F.concat(pre, F.lit(" " * 8), post)
    chksum = F.aggregate(
        F.split(with_spaces, ""),
        F.lit(0),
        lambda acc, ch: acc + F.ascii(ch),
    )
    header = F.concat(
        pre,
        F.concat(
            F.lpad(F.conv(chksum.cast("string"), 10, 8), 6, "0"),
            F.lit(_NUL + " "),
        ),
        post,
    )
    pad_len = (F.lit(_BLOCK) - size % _BLOCK) % _BLOCK
    return F.concat(
        F.encode(header, "UTF-8"),
        F.encode(payload, "UTF-8"),
        F.encode(F.substring(F.lit(_NUL * _BLOCK), F.lit(1), pad_len), "UTF-8"),
    )


def pack_tar(
    df: DataFrame,
    group_col: str,
    member_col: str = "member",
    out_col: str = "tar_file",
) -> DataFrame:
    """Concatenate per-group member blobs into one TAR SHARD blob per
    group + the end-of-archive zero blocks. Shard sizing = group keying
    (the caller bounds groups like real shards, ~1 GB); member order
    inside a shard is byte-sorted for determinism — tar semantics don't
    order members, and the sample GROUPING after parse re-keys by name
    anyway.

    LINEAR concatenation via one Arrow-batched ``applyInPandas`` join
    per group — NOT an ``aggregate(collect_list, concat)`` fold, which
    re-copies the accumulated prefix per element (quadratic bytes: a
    1250-member shard of 1 KB members would copy ~0.8 GB)."""
    import pandas as pd

    gtype = df.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {gtype}, {out_col} binary"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        members = sorted(bytes(m) for m in pdf[member_col])
        blob = b"".join(members) + b"\x00" * (2 * _BLOCK)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], out_col: [blob]}
        )

    return df.groupBy(group_col).applyInPandas(fn, schema)


def _parse_tar_blob(blob: bytes) -> list[tuple[str | None, bytes, str | None]]:
    """One tar blob → [(member name, payload, error)]. 512-block walk,
    octal sizes, checksum verification, zero-block termination."""
    out: list[tuple[str | None, bytes, str | None]] = []
    pos, n = 0, len(blob)
    while pos + _BLOCK <= n:
        header = blob[pos : pos + _BLOCK]
        if header == b"\x00" * _BLOCK:
            break  # end-of-archive
        name = header[0:100].rstrip(b"\x00").decode("utf-8", "replace")
        try:
            size = int(header[124:136].rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
            stored = int(header[148:156].rstrip(b"\x00 ").lstrip(b" ") or b"0", 8)
        except ValueError:
            out.append((name, b"", f"bad octal field at {pos}"))
            break
        computed = sum(header[0:148]) + 8 * 0x20 + sum(header[156:])
        if computed != stored:
            out.append(
                (name, b"", f"checksum mismatch at {pos}: "
                            f"stored {stored}, computed {computed}")
            )
            break
        body_start = pos + _BLOCK
        body_end = body_start + size
        if body_end > n:
            out.append((name, blob[body_start:n], "truncated payload"))
            break
        typeflag = header[156:157]
        if typeflag in (b"0", b"\x00"):  # regular file members only
            out.append((name, blob[body_start:body_end], None))
        pos = body_end + ((_BLOCK - size % _BLOCK) % _BLOCK)
    return out


def parse_tar(
    df: DataFrame, blob_col: str, keep_cols: list[str] | None = None
) -> DataFrame:
    """Binary tar blobs → one row per regular-file member:
    (keep_cols…, tar_name, payload: binary, tar_error). Arrow-batched
    mapInPandas; see module docstring for the parser contract."""
    import pandas as pd

    keep = keep_cols or []
    schema_keep = ", ".join(
        f"{df.schema[c].name} {df.schema[c].dataType.simpleString()}"
        for c in keep
    )
    schema = (schema_keep + ", " if schema_keep else "") + (
        "tar_name string, payload binary, tar_error string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                blob = bytes(blob) if blob is not None else b""
                for name, payload, err in _parse_tar_blob(blob):
                    rows.append([row[c] for c in keep] + [name, payload, err])
            yield pd.DataFrame(
                rows, columns=keep + ["tar_name", "payload", "tar_error"]
            )

    return df.select(*keep, blob_col).mapInPandas(run, schema)


def wds_samples(parsed: DataFrame, exts: list[str]) -> DataFrame:
    """WebDataset grouping: member rows (``tar_name = {key}.{ext}``) →
    one row per sample ``key`` with one binary column per requested
    extension (named ``{ext}_payload``). One combinable aggregate on
    the key; members with extensions outside ``exts`` are ignored."""
    key = F.substring_index(F.col("tar_name"), ".", 1).alias("key")
    ext = F.expr("substring(tar_name, length(substring_index(tar_name, '.', 1)) + 2)")
    base = parsed.filter(F.col("tar_error").isNull()).select(
        key, ext.alias("__ext"), "payload"
    )
    return base.groupBy("key").agg(
        *[
            F.max(F.when(F.col("__ext") == e, F.col("payload"))).alias(
                f"{e}_payload"
            )
            for e in exts
        ]
    )
